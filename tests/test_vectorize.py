"""Feature-hashed TF-IDF postings + sparse cosine joins."""

import math

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators import vectorize as V


def _docs(spark):
    rows = [
        (1, "spark shuffle join shuffle"),
        (2, "spark shuffle join merge"),
        (3, "completely different words entirely"),
        (4, "spark shuffle join shuffle"),  # exact dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_postings_match_numpy_reference(spark):
    docs = _docs(spark)
    post = {
        (r["doc_id"], r["bucket"]): r["w"]
        for r in V.hashed_tfidf_postings(docs, dim=64).collect()
    }
    # reference computation in plain python (md5 bucket, same formula)
    import hashlib

    texts = {1: "spark shuffle join shuffle", 2: "spark shuffle join merge",
             3: "completely different words entirely",
             4: "spark shuffle join shuffle"}
    bucket = lambda t: int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 64
    tf = {}
    for d, t in texts.items():
        for tok in t.lower().split():
            tf[(d, bucket(tok))] = tf.get((d, bucket(tok)), 0) + 1
    dfreq = {}
    for (d, b2) in tf:
        dfreq[b2] = dfreq.get(b2, 0) + 1
    want = {}
    for (d, b2), c in tf.items():
        w = round(c * math.log(5.0 / (dfreq[b2] + 1.0)) * 1_000_000)
        if w != 0:
            want[(d, b2)] = w
    assert post == want


def test_exact_duplicates_have_cosine_one(spark):
    post = V.hashed_tfidf_postings(_docs(spark), dim=64)
    pairs = {
        (r["a"], r["b"]): r["cosine"]
        for r in V.sparse_cosine_pairs(post, threshold=0.0).collect()
    }
    assert pairs[(1, 4)] == 1.0
    assert pairs[(1, 2)] > pairs.get((1, 3), -1.0)


def test_hot_bucket_pruning_drops_pairs_not_correctness(spark):
    docs = _docs(spark)
    post = V.hashed_tfidf_postings(docs, dim=64)
    unpruned = V.sparse_cosine_pairs(post, threshold=0.0).count()
    pruned = V.sparse_cosine_pairs(post, threshold=0.0, max_bucket_df=2).count()
    assert pruned <= unpruned


def test_postings_partition_invariant(spark):
    docs = _docs(spark)
    one = sorted(
        map(tuple, V.hashed_tfidf_postings(docs.coalesce(1), dim=32).collect())
    )
    many = sorted(
        map(tuple, V.hashed_tfidf_postings(docs.repartition(5), dim=32).collect())
    )
    assert one == many


def test_bm25_matches_python_reference(spark):
    import math

    corpus = {
        1: "spark table merge fast merge",
        2: "vector scan spark",
        3: "slow table row group",
        4: "merge merge merge spark vector data",
    }
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    terms, k1, b = ["spark", "merge", "vector"], 1.2, 0.75
    got = {
        r["doc_id"]: r["bm25"]
        for r in V.bm25_scores(docs, terms).collect()
    }

    toks = {d: t.split() for d, t in corpus.items()}
    N = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / N
    want = {}
    for d, t in toks.items():
        s = 0.0
        for q in terms:
            tf = t.count(q)
            if tf == 0:
                continue
            df = sum(1 for tt in toks.values() if q in tt)
            idf = math.log((N - df + 0.5) / (df + 0.5) + 1.0)
            c = idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(t) / avgdl)
            )
            s += round(c, 6)
        if s:
            want[d] = s
    assert set(got) == set(want)  # doc 3 has no query term
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9, d


def test_bm25_rarer_term_outranks_common_at_equal_tf(spark):
    # 'vector' appears in 1 doc, 'spark' in 3: doc matching only the rare
    # term must beat an equal-length doc matching only the common one
    docs = spark.createDataFrame(
        [
            (1, "vector aaa bbb"),
            (2, "spark aaa bbb"),
            (3, "spark ccc ddd"),
            (4, "spark eee fff"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["bm25"]
        for r in V.bm25_scores(docs, ["spark", "vector"]).collect()
    }
    assert got[1] > got[2]
