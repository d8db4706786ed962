"""Property tests: chunking coverage/fidelity and scalable-ranking parity
on randomized inputs (hypothesis)."""

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import Window, functions as F

from cdc_application_febuary_spark.operators import chunking, ranking

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

docs_strategy = st.lists(
    st.integers(min_value=0, max_value=200),  # word counts per doc
    min_size=1,
    max_size=6,
)


@SLOW
@given(word_counts=docs_strategy, chunk=st.integers(2, 20), ov=st.integers(0, 5))
def test_chunk_coverage_and_fidelity(spark, word_counts, chunk, ov):
    ov = min(ov, chunk - 1)
    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(n))) for i, n in enumerate(word_counts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunking.chunk_by_words(df, chunk_size=chunk, overlap=ov).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    for i, n in enumerate(word_counts):
        words = [f"w{i}_{j}" for j in range(n)]
        if n == 0:
            assert i not in by_doc
            continue
        chunks = sorted(by_doc[i], key=lambda r: r["start_word"])
        covered = set()
        for r in chunks:
            s = r["start_word"]
            expect = words[s : s + chunk]
            # fidelity: every chunk is exactly the source span
            assert r["chunk_text"].split() == expect
            assert r["n_chunk_words"] == len(expect)
            covered.update(range(s, s + len(expect)))
        # coverage: every word index appears in at least one chunk
        assert covered == set(range(n))
        # stride: starts are the arithmetic grid
        starts = [r["start_word"] for r in chunks]
        assert starts == list(range(0, n, chunk - ov))


@SLOW
@given(
    n=st.integers(1, 120),
    q=st.integers(1, 12),
    seed=st.integers(0, 10_000),
)
def test_scalable_ntile_property_parity(spark, n, q, seed):
    import random

    rng = random.Random(seed)
    rows = [(i, rng.randint(0, 8)) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, v long")
    order = [F.asc("v"), F.asc("id")]
    got = {
        r["id"]: r["t"] for r in ranking.scalable_ntile(df, q, order, "t").collect()
    }
    want = {
        r["id"]: r["t"]
        for r in df.withColumn(
            "t", F.ntile(q).over(Window.orderBy(*order)).cast("bigint")
        ).collect()
    }
    assert got == want
