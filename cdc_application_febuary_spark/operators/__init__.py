"""Composite operators: profiling, SCD2, dedup, similarity, reconciliation,
schema drift, multimodal plumbing."""
