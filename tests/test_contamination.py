"""Contamination detection: overlap counting, dedup of repeats, verdicts."""

import pytest

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators import contamination


def _df(spark, rows, id_name="doc_id"):
    return spark.createDataFrame(rows, f"{id_name} long, text string")


def test_exact_quote_full_overlap(spark):
    bench = _df(spark, [(100, "the quick brown fox jumps over it")], "bench_id")
    docs = _df(spark, [(1, "intro words then the quick brown fox jumps over it after")])
    out = contamination.ngram_overlap(docs, bench, n=5).collect()
    assert len(out) == 1
    r = out[0]
    # benchmark has 3 distinct 5-grams, all present in the doc
    assert r["bench_ngrams"] == 3 and r["overlap_ngrams"] == 3
    assert r["overlap_frac"] == pytest.approx(1.0)


def test_repeated_ngram_counts_once(spark):
    bench = _df(spark, [(100, "a b c d e")], "bench_id")
    docs = _df(spark, [(1, "a b c d e and a b c d e and a b c d e")])
    out = contamination.ngram_overlap(docs, bench, n=5).collect()
    assert out[0]["overlap_ngrams"] == 1  # unique n-grams, not occurrences


def test_no_overlap_no_row(spark):
    bench = _df(spark, [(100, "alpha beta gamma delta epsilon zeta")], "bench_id")
    docs = _df(spark, [(1, "one two three four five six seven")])
    assert contamination.ngram_overlap(docs, bench, n=5).count() == 0


def test_short_docs_produce_no_ngrams(spark):
    bench = _df(spark, [(100, "a b c d e")], "bench_id")
    docs = _df(spark, [(1, "a b c")])  # shorter than n
    assert contamination.ngram_overlap(docs, bench, n=5).count() == 0


def test_contaminated_docs_threshold(spark):
    bench = _df(spark, [(100, "w1 w2 w3 w4 w5 w6 w7 w8")], "bench_id")
    docs = _df(
        spark,
        [
            (1, "w1 w2 w3 w4 w5 w6 w7 w8 tail"),  # full quote
            (2, "w1 w2 w3 w4 w5 unrelated trailing words here"),  # partial
        ],
    )
    hits = contamination.contaminated_docs(
        docs, bench, n=5, min_overlap_frac=0.9
    ).collect()
    assert [r["doc_id"] for r in hits] == [1]
    assert hits[0]["max_overlap_frac"] == pytest.approx(1.0)


def test_hash_join_mode_matches_broadcast_mode(spark):
    """The beyond-broadcast path (shuffle join on xxhash64(ngram)) must
    produce exactly the broadcast path's answer on real overlapping and
    non-overlapping docs."""
    bench = _df(
        spark,
        [
            (100, "the quick brown fox jumps over the lazy dog today"),
            (101, "w1 w2 w3 w4 w5 w6 w7 w8"),
        ],
        "bench_id",
    )
    docs = _df(
        spark,
        [
            (1, "prefix the quick brown fox jumps over the lazy dog today suffix"),
            (2, "w1 w2 w3 w4 w5 unrelated tail of words here"),
            (3, "nothing in common with any benchmark item at all folks"),
        ],
    )
    key = ["doc_id", "bench_id"]
    bc = sorted(
        contamination.ngram_overlap(docs, bench, n=5).collect(),
        key=lambda r: (r["doc_id"], r["bench_id"]),
    )
    hj = sorted(
        contamination.ngram_overlap(docs, bench, n=5, join_mode="hash").collect(),
        key=lambda r: (r["doc_id"], r["bench_id"]),
    )
    assert [r.asDict() for r in bc] == [r.asDict() for r in hj]
    # the hash variant joins on the 64-bit key, not the literal string
    plan = contamination.ngram_overlap(
        docs, bench, n=5, join_mode="hash"
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "xxhash64" in plan

    with pytest.raises(ValueError):
        contamination.ngram_overlap(docs, bench, join_mode="nope")


def test_plan_broadcasts_benchmark(spark):
    bench = _df(spark, [(100, "a b c d e f")], "bench_id")
    docs = _df(spark, [(1, "a b c d e f g")])
    plan = (
        contamination.ngram_overlap(docs, bench, n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
