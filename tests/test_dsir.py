"""DSIR importance weighting (`operators/dsir.py`): hand-computed weight
parity on a tiny corpus, selection semantics, and the does-it-mean-
anything check on the fixture (target-language docs dominate the head)."""

import math

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.dsir import (
    dsir_log_weights,
    dsir_select_topk,
)


def _ref_weights(docs, target_texts):
    """Pure-python reference: same smoothing, same per-term rounding."""
    tok = lambda s: s.lower().strip().split()
    raw = {}
    for _, t in docs:
        for w in tok(t):
            raw[w] = raw.get(w, 0) + 1
    tgt = {}
    for t in target_texts:
        for w in tok(t):
            tgt[w] = tgt.get(w, 0) + 1
    tr, v, tt = sum(raw.values()), len(raw), sum(tgt.values())
    lw = {
        w: round(math.log((tgt.get(w, 0) + 1.0) / (tt + v)), 6)
        - round(math.log((cr + 1.0) / (tr + v)), 6)
        for w, cr in raw.items()
    }
    out = {}
    for i, t in docs:
        ws = tok(t)
        out[i] = (len(ws), round(sum(lw[w] for w in ws), 6))
    return out


def test_hand_computed_weights(spark):
    docs = [
        (0, "the cat sat"),
        (1, "the dog ran"),
        (2, "cat cat cat"),
        (3, "stock market report"),
    ]
    target = ["the cat sat", "cat cat cat"]  # cat-heavy target
    df = spark.createDataFrame(docs, "doc_id long, text string")
    tgt = df.where(F.col("doc_id").isin([0, 2]))
    got = {
        r["doc_id"]: (r["n_tokens"], float(r["logw"]))
        for r in dsir_log_weights(df, tgt).collect()
    }
    ref = _ref_weights(docs, target)
    assert set(got) == set(ref)
    for i in ref:
        assert got[i][0] == ref[i][0]
        assert abs(got[i][1] - ref[i][1]) < 1e-9, (i, got[i], ref[i])
    # cat-heavy doc outranks the out-of-target doc
    assert got[2][1] > got[3][1]


def test_topk_selection_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "alpha beta" if i % 2 else "gamma delta") for i in range(20)],
        "doc_id long, text string",
    )
    tgt = df.where(F.col("doc_id") % 2 == 1)  # target = alpha-beta docs
    top = dsir_select_topk(df, tgt, k=10).collect()
    assert [r["doc_id"] for r in top] == list(range(1, 20, 2))


def test_fixture_head_is_target_language(spark, sf_dir):
    from cdc_application_febuary_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    top = dsir_select_topk(
        docs, docs.where(F.col("lang") == "en"), k=20
    ).join(docs.select("doc_id", "lang"), "doc_id")
    langs = [r["lang"] for r in top.collect()]
    assert sum(1 for g in langs if g == "en") >= 15, langs


def test_resample_reproducible_and_weight_biased(spark):
    from cdc_application_febuary_spark.operators.dsir import dsir_resample

    # 100 docs: odd ids match the target phrase, even ids don't
    df = spark.createDataFrame(
        [
            (i, "alpha beta" if i % 2 else "gamma delta")
            for i in range(100)
        ],
        "doc_id long, text string",
    )
    tgt = df.where(F.col("doc_id") % 2 == 1)
    a = sorted(
        r["doc_id"] for r in dsir_resample(df, tgt, k=30, seed=5).collect()
    )
    b = sorted(
        r["doc_id"] for r in dsir_resample(df, tgt, k=30, seed=5).collect()
    )
    assert a == b and len(a) == 30
    # inclusion scales with exp(logw): target-like docs dominate the draw
    n_odd = sum(1 for i in a if i % 2)
    assert n_odd >= 25, n_odd
    # a different seed draws a different sample
    c = sorted(
        r["doc_id"] for r in dsir_resample(df, tgt, k=30, seed=6).collect()
    )
    assert c != a


def test_weights_partitioning_invariant(spark):
    """logw is an exact DECIMAL sum — any partitioning yields identical
    values (the property the driver hash relies on)."""
    df = spark.createDataFrame(
        [(i, f"alpha beta w{i % 7} gamma") for i in range(60)],
        "doc_id long, text string",
    )
    tgt = df.where(F.col("doc_id") % 3 == 0)
    a = {
        r["doc_id"]: str(r["logw"])
        for r in dsir_log_weights(df, tgt).collect()
    }
    b = {
        r["doc_id"]: str(r["logw"])
        for r in dsir_log_weights(
            df.repartition(7, "text"), tgt.repartition(3)
        ).collect()
    }
    assert a == b
