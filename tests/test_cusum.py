"""cusum_alarms (`operators/timeseries.py`): the prefix-min identity
equals the direct max-plus recurrence, and partitioning invariance."""

from cdc_application_febuary_spark.operators.timeseries import cusum_alarms


def _hourly(spark, counts):
    rows = [("k", i, c) for i, c in enumerate(counts)]
    return spark.createDataFrame(rows, "key string, hour long, cnt long")


def _reference(counts, slack_den=4, mult=2):
    t, h = sum(counts), len(counts)
    s, out = 0, []
    for c in counts:
        s = max(0, s + (c * h - t - t // slack_den))
        out.append((s, s > mult * t))
    return out


def test_identity_matches_direct_recurrence(spark):
    counts = [3, 2, 4, 1, 3, 30, 31, 29, 2, 3, 2, 40, 41, 2]
    got = sorted(
        (r["hour"], r["cusum"], r["alarm"])
        for r in cusum_alarms(
            _hourly(spark, counts), threshold_mult=2
        ).collect()
    )
    ref = [(i, s, a) for i, (s, a) in enumerate(_reference(counts))]
    assert got == ref
    # at least one alarm fires on this burst, and not at hour 0
    assert any(a for _, _, a in got) and not got[0][2]


def test_partitioning_invariant(spark):
    counts = [5, 1, 2, 8, 1, 9, 2, 2, 14, 3] * 4
    df = _hourly(spark, counts)
    a = sorted(map(tuple, cusum_alarms(df).collect()))
    b = sorted(map(tuple, cusum_alarms(df.repartition(7)).collect()))
    assert a == b
