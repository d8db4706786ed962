"""Pipeline plans: the batch full-load path and pipeline orchestration."""
