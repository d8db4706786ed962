"""Regression pins for the r7-ADVICE hardening (round 8): the guards must
fire loudly on the edge cases they exist for, and stay silent on the
happy path."""

import pytest

from pyspark.sql import functions as F


def test_stratified_validate_counts_missing_stratum(spark):
    from cdc_application_febuary_spark.operators.sampling import (
        stratified_sample_exact,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(20)],
        "id long, src string",
    )
    with pytest.raises(ValueError, match="missing observed strata"):
        stratified_sample_exact(
            df, "src", "id", 4, counts={"a": 10}, validate_counts=True
        )
    with pytest.raises(ValueError, match="disagrees"):
        stratified_sample_exact(
            df, "src", "id", 4, counts={"a": 10, "b": 7},
            validate_counts=True,
        )
    # accurate counts validate clean and draw exactly total_n rows
    got = stratified_sample_exact(
        df, "src", "id", 4, counts={"a": 10, "b": 10}, validate_counts=True
    )
    assert got.count() == 4


def test_kmeans_dim_bound_raises(spark):
    from cdc_application_febuary_spark.operators.kmeans import (
        kmeans_fixedpoint,
    )

    wide = spark.createDataFrame(
        [(i, [0.5] * 128) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="max exact dim is 127"):
        kmeans_fixedpoint(wide, k=2, iters=1)


def test_embedding_drift_empty_side_yields_finite_psi(spark):
    from cdc_application_febuary_spark.operators.drift import embedding_drift

    ref = spark.createDataFrame(
        [(i, [0.1 * (i % 5) - 0.2] * 4) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    cur = ref.where(F.lit(False))  # empty current population
    out = embedding_drift(ref, cur, "embedding", n_buckets=4).collect()
    assert out, "per-dim rows must still emit"
    for r in out:
        assert r["psi_e6"] is not None, "NULL psi on an empty side"
        assert r["n_cur"] == 0
