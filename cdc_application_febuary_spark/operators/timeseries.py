"""Time-series primitives over irregular event streams: bucket rollup with
gap-filled linear interpolation (the hypertable/timescale `time_bucket` +
`interpolate` shape) and inter-arrival statistics.

Scale shape: every function pre-aggregates the raw stream to one row per
(series, bucket) FIRST — the only pass over the wide input — and the
gap-fill grid is generated per series key with `sequence()`, so grid size
is bounded by the series' own time span, never by a global calendar
cross-join. Interpolation uses IGNORE NULLS window fills (no self-join
per gap), and the arithmetic is the same expression tree the DuckDB
oracle runs, so results are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def bucket_series(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "day",
) -> DataFrame:
    """(key, bucket_ts, value): per-bucket exact-decimal sums of an event
    value — the rollup that feeds gap_fill_interpolate. One shuffle with
    map-side combine."""
    return (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
        )
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("value")
        )
    )


def gap_fill_interpolate(
    series: DataFrame,
    step_seconds: int,
    key_col: str = "key",
    ts_col: str = "bucket_ts",
    value_col: str = "value",
) -> DataFrame:
    """Dense per-key grid from each key's own min to max bucket at
    ``step_seconds``; missing buckets get linearly interpolated values.

    (key, bucket_ts, value, filled): observed rows keep their value with
    ``filled = false``; generated rows carry
    ``prev + (next - prev) * (t - t_prev) / (t_next - t_prev)``.
    Interior gaps only — by construction the first and last grid points of
    every key are observed, so no extrapolation case exists.

    The grid is the per-key ``sequence(min, max, step)`` UNIONED with the
    observed bucket timestamps themselves, so buckets that don't land on
    the ``lo + k*step`` lattice (a month-bucketed series gap-filled at a
    fixed day step, say) are never silently dropped — they appear as
    observed points and interpolation runs between true neighbors."""
    spans = series.groupBy(key_col).agg(
        F.min(ts_col).alias("__lo"), F.max(ts_col).alias("__hi")
    )
    grid = spans.select(
        key_col,
        F.explode(
            F.sequence(
                "__lo", "__hi", F.expr(f"INTERVAL {int(step_seconds)} SECONDS")
            )
        ).alias(ts_col),
    ).unionByName(series.select(key_col, ts_col)).distinct()
    joined = grid.join(series, [key_col, ts_col], "left")
    w = Window.partitionBy(key_col).orderBy(ts_col)
    before = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    after = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    t = F.unix_timestamp(ts_col).cast("double")
    filled = (
        joined.withColumn(
            "__pv", F.last(value_col, ignorenulls=True).over(before)
        )
        .withColumn(
            "__pt",
            F.last(
                F.when(F.col(value_col).isNotNull(), t), ignorenulls=True
            ).over(before),
        )
        .withColumn("__nv", F.first(value_col, ignorenulls=True).over(after))
        .withColumn(
            "__nt",
            F.first(
                F.when(F.col(value_col).isNotNull(), t), ignorenulls=True
            ).over(after),
        )
    )
    interp = F.col("__pv") + (F.col("__nv") - F.col("__pv")) * (
        (t - F.col("__pt")) / (F.col("__nt") - F.col("__pt"))
    )
    return (
        filled.select(
            key_col,
            ts_col,
            F.coalesce(F.col(value_col), interp).alias(value_col),
            F.col(value_col).isNull().alias("filled"),
        )
        .orderBy(key_col, ts_col)
    )


def interarrival_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_tiebreak: str,
) -> DataFrame:
    """Per-key inter-arrival gap statistics (seconds): n_gaps, mean, max,
    p95 (exact percentile — the gap table is one row per event, already
    key-partitioned, so the exact percentile costs one sort per key, not a
    global one). ``order_tiebreak`` makes the event order total, so lag()
    is deterministic under timestamp ties."""
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    # casting BOTH timestamps through unix_micros keeps subsecond precision
    micros = F.unix_micros(F.col(ts_col))
    gaps = (
        df.withColumn("__gap_us", micros - F.lag(micros).over(w))
        .where(F.col("__gap_us").isNotNull())
        .select(key_col, (F.col("__gap_us") / 1e6).alias("gap_s"))
    )
    return (
        gaps.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.avg("gap_s"), 4).alias("mean_gap_s"),
            F.round(F.max("gap_s"), 4).alias("max_gap_s"),
            F.round(F.expr("percentile(gap_s, 0.95)"), 4).alias("p95_gap_s"),
        )
        .orderBy(key_col)
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    order_tiebreak: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-key state sequences:
    (from_state, to_state, cnt, prob). Sequences are ordered by
    (ts, tiebreak) within each key — a lag/lead window per key, then a
    count aggregation over at most |states|^2 rows. prob is
    cnt / outgoing-total of the from_state."""
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    pairs = (
        df.withColumn("__next", F.lead(state_col).over(w))
        .where(F.col("__next").isNotNull())
        .groupBy(
            F.col(state_col).alias("from_state"),
            F.col("__next").alias("to_state"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = pairs.groupBy("from_state").agg(F.sum("cnt").alias("__out"))
    return (
        pairs.join(F.broadcast(totals), "from_state")
        .select(
            "from_state",
            "to_state",
            "cnt",
            F.round(F.col("cnt") / F.col("__out"), 6).alias("prob"),
        )
        .orderBy("from_state", "to_state")
    )


def cusum_alarms(
    hourly: DataFrame,
    key_col: str = "key",
    time_col: str = "hour",
    cnt_col: str = "cnt",
    slack_den: int = 4,
    threshold_mult: int = 8,
) -> DataFrame:
    """Exact-integer CUSUM changepoint detection over a bucketed count
    series (Page 1954): per key, the one-sided cumulative sum
    ``S_k = max(0, S_{k-1} + x_k - (mean + slack))`` with everything
    scaled by the bucket count H so no division ever happens —
    ``y_k = cnt_k * H - T - T // slack_den`` (T = total, slack = a
    mean/slack_den allowance) and alarm when ``S_k > threshold_mult*T``
    (threshold_mult mean-bucket-equivalents of accumulated excess).

    The recurrence is NOT a window primitive, but the max-plus identity
    ``S_k = P_k - min(0, min_{j<=k} P_j)`` (P = prefix sums of y) turns
    it into TWO stacked windows over the SAME (key, time) ordering — one
    shuffle, state bounded by buckets x keys, every value a BIGINT any
    SQL engine replays bit-for-bit. Buckets with no rows contribute no
    step (document the cadence upstream if gap-filling matters).

    Returns per-bucket rows: key, time, cnt, cusum, alarm, plus the
    per-key totals (t, h) the thresholds derive from."""
    from pyspark.sql import Window

    tot = hourly.groupBy(key_col).agg(
        F.sum(cnt_col).cast("long").alias("__t"),
        F.count(F.lit(1)).cast("long").alias("__h"),
    )
    y = hourly.join(F.broadcast(tot), key_col).withColumn(
        "__y",
        F.col(cnt_col).cast("long") * F.col("__h")
        - F.col("__t")
        # exact integer floor for non-negative t (a double division
        # would be inexact for non-power-of-two slack_den)
        - ((F.col("__t") - F.col("__t") % slack_den) / slack_den).cast(
            "long"
        ),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = y.withColumn("__pk", F.sum("__y").over(w))
    s = p.withColumn(
        "cusum",
        (F.col("__pk") - F.least(F.min("__pk").over(w), F.lit(0))).cast(
            "long"
        ),
    )
    return s.select(
        key_col,
        time_col,
        F.col(cnt_col).cast("long").alias(cnt_col),
        "cusum",
        (F.col("cusum") > threshold_mult * F.col("__t")).alias("alarm"),
        F.col("__t").alias("t"),
        F.col("__h").alias("h"),
    )
