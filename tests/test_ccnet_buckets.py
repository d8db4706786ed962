"""CCNet perplexity tertiles (`functions/lm.py:lm_scores_exact` + the
ccnet_perplexity_buckets query): exact-sum scoring semantics, tertile
cut arithmetic, and partitioning invariance of the bucket assignment."""

from pyspark.sql import functions as F

from cdc_application_febuary_spark.functions.lm import (
    lm_scores,
    lm_scores_exact,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_exact_sum_matches_rounded_mean(spark):
    """sum_lp_e6 / 1e6 / n_trigrams must agree with lm_scores' rounded
    mean to the same 6-decimal contract on every doc."""
    texts = ["the cat sat", "the cat sat on the mat", "zzz qqq", "ab"]
    docs = _docs(spark, texts)
    exact = {
        r["doc_id"]: (r["n_trigrams"], r["sum_lp_e6"])
        for r in lm_scores_exact(docs).collect()
    }
    mean = {
        r["doc_id"]: (r["n_trigrams"], r["lm_score"])
        for r in lm_scores(docs).where(F.col("n_trigrams") > 0).collect()
    }
    assert set(exact) == set(mean)  # same docs survive (doc 3 has 2 chars)
    for did, (n, s) in exact.items():
        assert mean[did][0] == n
        assert abs(s / 1e6 / n - mean[did][1]) < 2e-6


def test_exact_scores_partitioning_invariant(spark):
    texts = [f"word{i} common text body shared tail" for i in range(40)]
    docs = _docs(spark, texts)
    a = sorted(map(tuple, lm_scores_exact(docs).collect()))
    b = sorted(map(tuple, lm_scores_exact(docs.repartition(7)).collect()))
    assert a == b


def test_tertile_cut_arithmetic():
    """The integer cut 3*rank<=n / 3*rank<=2n splits n=7 as 2/2/3 and
    n=9 as 3/3/3 — head never exceeds the other buckets."""
    for n in range(1, 30):
        head = sum(1 for r in range(1, n + 1) if 3 * r <= n)
        mid = sum(1 for r in range(1, n + 1) if n < 3 * r <= 2 * n)
        tail = n - head - mid
        assert head + mid + tail == n
        assert head <= mid + 1 and mid <= tail + 1 and head <= tail
        assert max(head, mid, tail) - min(head, mid, tail) <= 1
