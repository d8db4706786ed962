"""k-anonymity audit (`operators/profiling.py:k_anonymity_groups`):
planted small classes surface, k-sized classes do not."""

from cdc_application_febuary_spark.operators.profiling import (
    k_anonymity_groups,
)


def test_planted_violations(spark):
    rows = (
        [("a", "x")] * 5          # exactly k -> safe
        + [("a", "y")] * 2        # violator
        + [("b", "x")] * 1        # violator
        + [("b", "y")] * 9        # safe
    )
    df = spark.createDataFrame(rows, "g1 string, g2 string")
    got = {
        (r["g1"], r["g2"]): r["group_size"]
        for r in k_anonymity_groups(df, ["g1", "g2"], k=5).collect()
    }
    assert got == {("a", "y"): 2, ("b", "x"): 1}
