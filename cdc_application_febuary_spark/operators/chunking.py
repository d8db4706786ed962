"""Document chunking for context-length-bounded training/retrieval: split
each document into fixed-size overlapping word windows with stable
offsets — the segmentation step between cleaning and tokenization in an
LLM data pipeline (and the indexing unit for RAG corpora).

Pure column expressions end to end: split -> per-doc start grid
(`sequence`) -> explode -> `slice`/`array_join`. No UDFs, no shuffle —
chunking is embarrassingly row-parallel, and the explode multiplies rows
by ~len/stride, which the caller prices via chunk_size/overlap. Offsets
(`start_word`) are part of the output contract so chunks can be traced
back to their source span (dedup provenance, citation windows).

Trailing chunks may be shorter than ``chunk_size``; a final window fully
contained in the previous one is still emitted (standard sliding-window
convention — identical in the DuckDB oracle, which replays the same
grid arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_by_words(
    docs: DataFrame,
    chunk_size: int = 32,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, start_word, n_chunk_words, chunk_text): sliding word windows
    of ``chunk_size`` every ``chunk_size - overlap`` words. Empty/blank
    documents produce no chunks."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    step = chunk_size - overlap
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    # blank text splits to [""] (size 1) in Spark AND DuckDB — the trim
    # guard, not the size guard, is what drops empty documents
    base = docs.where(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    ).select(F.col(id_col).alias("id"), words.alias("__w"))
    exploded = base.select(
        "id",
        "__w",
        F.explode(
            F.sequence(F.lit(0), F.size("__w") - 1, F.lit(step))
        ).alias("start_word"),
    )
    chunk = F.slice("__w", F.col("start_word") + 1, chunk_size)
    return exploded.select(
        "id",
        "start_word",
        F.size(chunk).alias("n_chunk_words"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
