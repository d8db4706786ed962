"""split_distribution_shift: the KL pairs must reconstruct to
non-negative divergences (Gibbs), OOV is bounded by val mass, and the
counters are internally consistent."""


def test_split_shift_invariants(spark):
    from cdc_application_febuary_spark.queries.corpus_ops import (
        split_distribution_shift,
    )

    r = split_distribution_shift(spark, "/root/testdata/sf0.001").first()
    assert r["train_docs"] + r["val_docs"] > 0
    assert r["union_vocab"] >= max(r["train_vocab"], r["val_vocab"])
    assert 0 <= r["oov_val_tokens"] <= r["val_tokens"]
    # KL >= 0 up to the per-term 1e-6 log rounding: bound the rounding
    # error by (sum of counts + vocab) * 1e-6 on each side
    # numerators are exact scale-6 integers since the r6-ADVICE fix
    kl_vt = r["kl_vt_num_e6"] / 1e6 / r["kl_vt_den"]
    kl_tv = r["kl_tv_num_e6"] / 1e6 / r["kl_tv_den"]
    tol = 2e-6 * r["union_vocab"]
    assert kl_vt >= -tol and kl_tv >= -tol
    assert r["kl_vt_den"] == r["val_tokens"] + r["union_vocab"]
    assert r["kl_tv_den"] == r["train_tokens"] + r["union_vocab"]
