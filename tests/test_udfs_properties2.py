"""Vectorized UDF surface + extra property tests (as-of join and Jaccard
pairs against Python reference implementations on random inputs)."""

import itertools

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from cdc_application_febuary_spark.functions.udfs import (
    quantization_error,
    quantize_embedding_int8,
)
from cdc_application_febuary_spark.operators.asof import asof_join
from cdc_application_febuary_spark.operators.dedup import jaccard_pairs

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


# --- pandas UDFs ------------------------------------------------------------
def test_quantize_embedding_int8(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        ["id", "emb"],
    )
    out = {r["id"]: r["q"] for r in
           df.select("id", quantize_embedding_int8("emb").alias("q")).collect()}
    assert out[1] == [127, -64, 32, 0]  # scaled by 127/max|x|
    assert out[2] == [0, 0, 0, 0]


def test_quantization_error_bounded(spark):
    from cdc_application_febuary_spark.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    errs = emb.select(quantization_error("embedding").alias("e")).agg(
        F.max("e")
    ).collect()[0][0]
    # int8 symmetric quantization error <= 0.5/scale = max|x|/254
    max_abs = emb.select(
        F.array_max(F.transform("embedding", lambda x: F.abs(x))).alias("m")
    ).agg(F.max("m")).collect()[0][0]
    assert errs <= max_abs / 254 + 1e-9


# --- as-of join property ----------------------------------------------------
asof_inputs = st.tuples(
    st.lists(  # left: (key, ts)
        st.tuples(st.integers(1, 3), st.integers(0, 30)),
        min_size=1, max_size=10,
    ),
    st.lists(  # right: (key, ts, val)
        st.tuples(st.integers(1, 3), st.integers(0, 30), st.integers(0, 99)),
        min_size=0, max_size=10, unique_by=lambda r: (r[0], r[1]),
    ),
)


@given(asof_inputs)
@SLOW
def test_asof_matches_python_reference(spark, inputs):
    left_rows, right_rows = inputs
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)], ["k", "ts", "lid"]
    )
    right = spark.createDataFrame(
        right_rows, "k long, ts long, val long"
    )
    got = {
        r["lid"]: r["val"]
        for r in asof_join(left, right, on=["k"], value_cols=["val"]).collect()
    }
    for i, (k, t) in enumerate(left_rows):
        cands = [(rt, v) for rk, rt, v in right_rows if rk == k and rt <= t]
        expected = max(cands)[1] if cands else None
        assert got[i] == expected, (i, k, t, cands)


# --- jaccard property -------------------------------------------------------
words = st.lists(st.sampled_from("abcdefgh"), min_size=5, max_size=12)
corpora = st.lists(words, min_size=2, max_size=5)


@given(corpora)
@SLOW
def test_jaccard_matches_python_reference(spark, docs):
    texts = [" ".join(w) for w in docs]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in jaccard_pairs(df, threshold=0.0, n=3).collect()
    }

    def shingles(ws):
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    for (i, wa), (j, wb) in itertools.combinations(enumerate(docs), 2):
        sa, sb = shingles(wa), shingles(wb)
        inter = len(sa & sb)
        if inter == 0:
            assert (i, j) not in got
        else:
            expected = round(inter / len(sa | sb), 6)
            assert abs(got[(i, j)] - expected) < 1e-9, (i, j)
