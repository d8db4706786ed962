"""2-D skyline (Pareto frontier): the points not dominated on two
minimize-dimensions — classic "cheapest AND earliest" frontier queries.

The textbook formulation is an O(n^2) dominance self-join; the standard
single-machine trick is a sort + running-min sweep. A naive Spark port of
the sweep is ``Window.orderBy(x)`` with no partition key — which moves
the WHOLE table to one task (the WindowExec single-partition warning).

This module does the sweep as a distributed two-level prefix scan:

1. band each row by ``x div band_width`` (equal prices share a band, so
   a band boundary never splits a tie);
2. local pass — running min of ``y`` over x WITHIN each band (parallel
   across bands);
3. band summary — per-band min(y), a table with ~n_bands rows; the
   exclusive prefix min over band summaries runs on that TINY table
   (bounded single-partition window, rows == bands, by design);
4. broadcast the prefix back and combine: min-y-over-strictly-smaller-x
   = min(prefix from earlier bands, local running min restricted to
   strictly smaller x in-band).

Every full-data pass is partition-parallel; the only unpartitioned
window touches n_bands rows. At 100 TB with 1e6 bands the summary table
is megabytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    band_width: int = 1_000,
) -> DataFrame:
    """Rows minimizing (x, y): keep row r iff no other row has
    ``x <= r.x AND y <= r.y`` with at least one strict. Duplicate (x, y)
    points all survive (neither dominates). ``x_col`` must be integral
    (exact band arithmetic); ``y_col`` any orderable numeric.

    Returns the input columns (skyline members only)."""
    banded = df.withColumn("__band", (F.col(x_col) / band_width).cast("long"))

    # (2) local running min of y over strictly-smaller x inside the band:
    # a RANGE frame to -1 needs per-row evaluation; equivalent and
    # cheaper: running min over x-ordered rows per distinct x, via the
    # per-x min then a cumulative over distinct-x rows. Do it directly
    # with a RANGE frame on the integral x (exact):
    w_local = (
        Window.partitionBy("__band")
        .orderBy(x_col)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same_x = Window.partitionBy(x_col)
    local = banded.withColumn(
        "__local_before", F.min(y_col).over(w_local)
    ).withColumn("__min_same_x", F.min(y_col).over(w_same_x))

    # (3) per-band min(y), exclusive prefix over the band table
    bands = banded.groupBy("__band").agg(F.min(y_col).alias("__band_min"))
    w_prefix = (
        Window.orderBy("__band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # n_bands rows only — bounded by design
    prefix = bands.select(
        "__band", F.min("__band_min").over(w_prefix).alias("__prefix_min")
    )

    # (4) combine: min y among ALL strictly-cheaper x
    joined = local.join(F.broadcast(prefix), "__band")
    # null-safe min of the two partial minima (either may be NULL at the
    # frontier's leading edge):
    best_cheaper = (
        F.when(
            F.col("__prefix_min").isNull(), F.col("__local_before")
        )
        .when(F.col("__local_before").isNull(), F.col("__prefix_min"))
        .otherwise(F.least("__prefix_min", "__local_before"))
    )
    out = joined.withColumn("__best_cheaper", best_cheaper).where(
        (
            F.col("__best_cheaper").isNull()
            | (F.col(y_col) < F.col("__best_cheaper"))
        )
        & (F.col(y_col) == F.col("__min_same_x"))
    )
    return out.drop(
        "__band", "__local_before", "__min_same_x", "__prefix_min",
        "__best_cheaper",
    )
