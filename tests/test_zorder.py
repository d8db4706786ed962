"""Z-order clustering: Morton math, layout tightness on BOTH columns, and
the pruning win vs a single-column sort layout."""

import pytest
from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.zorder import (
    cluster_by_zorder,
    layout_stats,
    pruning_ratio,
    zorder_key,
)


def _grid(spark, n=64):
    # all (x, y) cells of an n x n grid, one row each, in hash-scrambled order
    return (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            F.floor(F.col("id") / n).alias("y"),
        )
        .orderBy(F.xxhash64("x", "y"))
    )


def test_morton_interleave_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)], "x long, y long"
    )
    uniform = [list(range(1, 256))] * 2
    got = {
        (r["x"], r["y"]): r["__zval"]
        for r in zorder_key(df, ["x", "y"], bits=8, boundaries=uniform).collect()
    }

    def morton(x, y):
        z = 0
        for j in range(8):
            z |= ((x >> j) & 1) << (2 * j) | ((y >> j) & 1) << (2 * j + 1)
        return z

    assert got == {(x, y): morton(x, y) for (x, y) in got}


def test_zorder_key_overflow_guard(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError):
        zorder_key(df, ["a", "b"], bits=32)


def test_quantile_cells_fill_uniformly_under_skew(spark):
    # exponential-ish skew: rank-normalization must still spread rows
    # roughly evenly over cells, not cram them into the low cells
    df = spark.range(10_000).select(
        (F.exp(F.col("id") / 1500.0)).alias("v")
    )
    keyed = zorder_key(df, ["v"], bits=4)  # 16 cells
    counts = (
        keyed.groupBy("__zval").count().orderBy("__zval").collect()
    )
    assert len(counts) == 16
    assert max(r["count"] for r in counts) < 3 * 10_000 / 16


def test_zorder_layout_tight_on_both_columns(spark):
    n, files = 64, 16
    clustered = cluster_by_zorder(_grid(spark, n), ["x", "y"], num_files=files)
    stats = layout_stats(clustered, ["x", "y"]).collect()
    assert len(stats) == files
    # slices straddling a quadrant boundary legitimately span wide (the
    # z-curve, unlike Hilbert, jumps at major-bit flips), so the guarantee
    # is on the typical slice: median span stays within half the domain on
    # BOTH columns (a 1-column sort gives median span = FULL domain on the
    # other column)
    def median_span(col):
        spans = sorted(r[f"{col}_max"] - r[f"{col}_min"] for r in stats)
        return spans[len(spans) // 2]

    assert median_span("x") <= n / 2
    assert median_span("y") <= n / 2


def test_zorder_beats_single_column_sort_for_pruning(spark):
    n, files = 64, 16
    grid = _grid(spark, n)
    z_stats = layout_stats(
        cluster_by_zorder(grid, ["x", "y"], num_files=files), ["x", "y"]
    ).collect()
    x_sorted = grid.repartitionByRange(files, "x").sortWithinPartitions("x")
    x_stats = layout_stats(x_sorted, ["x", "y"]).collect()

    band = (10.0, 20.0)  # a narrow filter on y
    z_ratio = pruning_ratio(z_stats, "y", *band)
    x_ratio = pruning_ratio(x_stats, "y", *band)
    assert x_ratio == 1.0  # x-sorted layout cannot prune on y at all
    assert z_ratio <= 0.5  # z-ordered layout skips at least half the files
    # and the x column still prunes sizably in the z layout
    assert pruning_ratio(z_stats, "x", 10.0, 20.0) <= 0.7


def test_cluster_preserves_rows(spark):
    grid = _grid(spark, 32)
    out = cluster_by_zorder(grid, ["x", "y"], num_files=8)
    assert out.count() == 32 * 32
    assert set(out.columns) == {"x", "y"}
