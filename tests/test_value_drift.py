"""PSI value drift: identical distributions, shifted distributions,
under/overflow buckets."""

import math

import pytest

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.drift import value_drift


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "v double")


def test_identical_distributions_near_zero_psi(spark):
    xs = list(range(100))
    out = value_drift(_vals(spark, xs), _vals(spark, xs), "v", 0, 100, 10)
    total = out.agg(F.sum("psi_term")).first()[0]
    assert abs(total) < 1e-9


def test_shifted_distribution_flags_drift(spark):
    base = [i % 50 for i in range(200)]          # mass in low buckets
    obs = [50 + (i % 50) for i in range(200)]    # mass moved up
    out = value_drift(_vals(spark, base), _vals(spark, obs), "v", 0, 100, 10)
    total = out.agg(F.sum("psi_term")).first()[0]
    assert total > 0.2  # conventional action threshold


def test_under_and_overflow_buckets(spark):
    base = [-5, 5, 50]
    obs = [150, 5, 50]
    rows = {
        r["bucket"]: (r["n_base"], r["n_obs"])
        for r in value_drift(
            _vals(spark, base), _vals(spark, obs), "v", 0, 100, 10
        ).collect()
    }
    assert rows[0] == (1, 0)   # underflow
    assert rows[11] == (0, 1)  # overflow


def test_psi_term_matches_formula(spark):
    base = [1] * 30 + [11] * 70
    obs = [1] * 70 + [11] * 30
    rows = {
        r["bucket"]: r["psi_term"]
        for r in value_drift(
            _vals(spark, base), _vals(spark, obs), "v", 0, 20, 2, eps=0.0
        ).collect()
    }
    expect = (0.3 - 0.7) * math.log(0.3 / 0.7)
    assert rows[1] == pytest.approx(round(expect, 6))
    assert rows[2] == pytest.approx(round(expect, 6))
