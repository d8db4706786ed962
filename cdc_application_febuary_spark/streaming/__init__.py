"""Structured Streaming change path: changelog ingestion, dual-sink
foreachBatch (SCD2 target + event log), monitoring listener."""
