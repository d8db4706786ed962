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
