"""Feature-hashed TF-IDF vectors and sparse cosine similarity joins.

Text -> vector without any external model: the hashing trick (Weinberger
et al. 2009, sklearn's HashingVectorizer) maps each token to one of
``dim`` buckets by hash, so the vocabulary never materializes, the
"vector" is the (doc, bucket, weight) posting table, and similarity is
an inverted-index equi-join on bucket — the sparse shape that scales:
the corpus shuffles once by bucket, pair work is bounded by per-bucket
document frequency (prune hot buckets with ``max_bucket_df`` exactly
like hot-shingle pruning in `dedup.prune_hot_shingles`).

Two deliberate determinism choices make the whole pipeline oracle-able:

* the bucket hash is md5-based (``conv(substr(md5(token),1,8),16,10) %
  dim``) — engine-portable, unlike xxhash64;
* weights are INTEGER-scaled (``round(tf * idf * 1e6)``): every dot
  product and squared norm is then an exact int64 sum (order-independent
  — magnitudes bounded by dim x (tf_max x idf_max x 1e6)^2 << 2^63), so
  Spark and DuckDB agree bit-for-bit all the way to the final cosine,
  which is one double expression rounded to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WEIGHT_SCALE = 1_000_000


def hash_bucket(col, dim: int):
    """Engine-portable token -> bucket hash (md5 head as int, mod dim)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")
        % F.lit(dim)
    )


def hashed_tfidf_postings(
    docs: DataFrame,
    dim: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bucket, w) integer-weighted posting table.

    tf = token occurrences in the doc's bucket; idf = ln((N+1)/(df+1))
    with df = docs containing the bucket; w = round(tf * idf * 1e6) as
    BIGINT. One shuffle to count (doc, bucket), one tiny (≤ dim rows)
    df aggregate broadcast back."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("token"),
    ).where(F.col("token") != "")
    bucketed = tok.select("doc_id", hash_bucket(F.col("token"), dim).alias("bucket"))
    tf = bucketed.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_tbl = tf.groupBy("bucket").agg(F.count(F.lit(1)).alias("dfreq"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    return (
        tf.join(F.broadcast(df_tbl), "bucket")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "bucket",
            F.round(
                F.col("tf")
                * F.log(
                    (F.col("n") + F.lit(1.0)) / (F.col("dfreq") + F.lit(1.0))
                )
                * F.lit(WEIGHT_SCALE)
            )
            .cast("bigint")
            .alias("w"),
        )
        .where(F.col("w") != 0)
    )


def sparse_cosine_pairs(
    postings: DataFrame,
    threshold: float = 0.3,
    max_bucket_df: int | None = None,
) -> DataFrame:
    """(a, b, cosine) for document pairs with cosine >= threshold, from
    the integer posting table. Inverted-index join: pairs meet only on
    shared buckets, dot products and norms are exact int64 sums, the
    single double expression at the end is rounded to 6 decimals."""
    if max_bucket_df is not None:
        hot = (
            postings.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("bdf"))
            .where(F.col("bdf") > max_bucket_df)
            .select("bucket")
        )
        postings = postings.join(F.broadcast(hot), "bucket", "left_anti")
    norms = postings.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).alias("n2")
    )
    a = postings.select(
        F.col("doc_id").alias("a"), "bucket", F.col("w").alias("wa")
    )
    b = postings.select(
        F.col("doc_id").alias("b"), "bucket", F.col("w").alias("wb")
    )
    dots = (
        a.join(b, "bucket")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("doc_id").alias("b"), F.col("n2").alias("nb2"))
    return (
        dots.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("dot")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 relevance of every document against a bag-of-words
    query — the standard lexical retrieval scorer (Robertson et al.,
    TREC-3; the Lucene `+1` idf variant so scores stay positive):

        idf(t)  = ln((N - df + 0.5)/(df + 0.5) + 1)
        s(d)    = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Shape: one token explode scanned TWICE at worst (doc lengths need all
    tokens; tf/df only the query's terms, filtered BEFORE the count so
    the heavy aggregation is bounded by |terms| x docs-containing-them).
    N and avgdl are two driver scalars. Per-term contributions round to
    DECIMAL(18,6) before the per-doc sum, so the total is an exact
    decimal sum — order-independent and engine-portable (the same trick
    as the LM scorer's per-doc log-prob sums).

    Returns (doc_id, bm25) — all docs containing >= 1 query term.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("token"),
    ).where(F.col("token") != "")
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("tot")
    ).first()
    n_docs, avgdl = int(stats["n"]), float(stats["tot"]) / float(stats["n"])

    qt = tok.where(F.col("token").isin(list(query_terms)))
    tf = qt.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("token").agg(F.count(F.lit(1)).alias("dfreq"))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("dfreq") + F.lit(0.5))
        / (F.col("dfreq") + F.lit(0.5))
        + F.lit(1.0)
    )
    contrib = (
        tf.join(F.broadcast(df_tbl), "token")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            F.round(
                idf
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * (F.col("dl") / F.lit(avgdl))
                    )
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("c"),
        )
    )
    return contrib.groupBy("doc_id").agg(
        F.sum("c").cast("double").alias("bm25")
    )
