"""Streaming joins and in-stream dedup.

The reference correlates streams only after landing (key lookups against
target-DB rows — SURVEY §2.3); Spark can correlate in flight. Two shapes:

* stream x static — broadcast enrichment of the change stream with a
  dimension (topic→pipeline routing, J4). No state, no watermark needed;
  the dimension is re-resolved per micro-batch.
* stream x stream — both sides watermarked, join condition = equi-key
  plus a bounded event-time range. The time bound is what makes state
  finite: each side buffers only rows younger than watermark + bound,
  so state size tracks rate x window, not stream length.

`stream_dedup` is the watermark-bounded exact-dedup twin of the batch
`operators/dedup.py:drop_exact_dups` — `dropDuplicatesWithinWatermark`
keeps one row per key among events whose event times fall within the
watermark delay, and the state store evicts keys once the watermark
passes them (the 100 TB property: bounded state, no full-history set).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def enrich_with_dimension(
    stream: DataFrame, dim: DataFrame, on: str | Column, how: str = "left"
) -> DataFrame:
    """Stream x static broadcast join — per-batch dimension resolution."""
    return stream.join(F.broadcast(dim), on, how)


def stream_stream_range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on equi-keys where the right event lands within
    ``[left_ts, left_ts + max_delay]`` — the in-flight form of the as-of /
    attribution pattern (impression -> click within the window).

    Both sides get watermarks; the range bound lets Spark compute when a
    buffered row can never match again and evict it. ``how`` may be
    'inner', 'leftOuter' (unmatched left rows emit with nulls once the
    watermark proves no match can arrive), etc.
    """
    on = list(on)
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = None
    for k in on:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else (cond & c)
    rng = (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}")) & (
        F.col(f"r.{right_ts}")
        <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}")
    )
    cond = rng if cond is None else (cond & rng)
    return l.join(r, cond, how)


def stream_dedup(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "source_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Keep the first-arriving row per key among events within the
    watermark horizon; late duplicates beyond the horizon are the
    documented trade (state stays bounded)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
