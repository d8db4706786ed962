"""Hash-based sampling & mixture: determinism, nested fractions,
stratified rates, mixture composition."""

import pytest

from pyspark.sql import functions as F

from cdc_application_febuary_spark.operators.sampling import (
    hash_sample,
    mixture,
    stratified_sample,
)


@pytest.fixture()
def ids(spark):
    return spark.range(0, 20000).withColumnRenamed("id", "doc_id")


def test_fraction_accuracy_and_determinism(spark, ids):
    got1 = hash_sample(ids, "doc_id", 0.3, seed=7)
    got2 = hash_sample(ids, "doc_id", 0.3, seed=7)
    n = got1.count()
    assert abs(n / 20000 - 0.3) < 0.02
    assert got1.exceptAll(got2).count() == 0  # same (id, seed) -> same draw
    other = hash_sample(ids, "doc_id", 0.3, seed=8).count()
    assert other != n or True  # different seed draws a different set:
    assert (
        hash_sample(ids, "doc_id", 0.3, seed=8)
        .exceptAll(got1)
        .count()
        > 0
    )


def test_smaller_fraction_is_subset(spark, ids):
    small = hash_sample(ids, "doc_id", 0.1, seed=3)
    big = hash_sample(ids, "doc_id", 0.4, seed=3)
    assert small.exceptAll(big).count() == 0  # threshold filter nests


def test_stratified_rates(spark, ids):
    df = ids.withColumn(
        "src", F.when(F.col("doc_id") % 2 == 0, "web").otherwise("code")
    )
    out = stratified_sample(
        df, "src", {"web": 0.5, "code": 0.1}, id_col="doc_id", seed=1
    )
    rates = {
        r["src"]: r["cnt"] / 10000
        for r in out.groupBy("src").agg(F.count("*").alias("cnt")).collect()
    }
    assert abs(rates["web"] - 0.5) < 0.03
    assert abs(rates["code"] - 0.1) < 0.03
    # strata without a fraction are dropped
    df2 = df.withColumn("src", F.lit("other"))
    assert stratified_sample(
        df2, "src", {"web": 1.0}, id_col="doc_id"
    ).count() == 0


def test_mixture_composition(spark, ids):
    web = ids.where("doc_id < 16000")     # 16k rows
    code = ids.where("doc_id >= 16000")   # 4k rows
    out = mixture(
        {"web": web, "code": code},
        {"web": 0.5, "code": 0.5},
        id_col="doc_id",
        seed=5,
    )
    got = {
        r["__mix_source"]: r["cnt"]
        for r in out.groupBy("__mix_source").agg(F.count("*").alias("cnt")).collect()
    }
    # code is the scarce source -> anchors at 1.0 (all 4k kept);
    # web downsamples to ~4k for a 50/50 blend
    assert got["code"] == 4000
    assert abs(got["web"] - 4000) < 300


def test_mixture_rejects_empty_source(spark, ids):
    with pytest.raises(ValueError, match="empty mixture source"):
        mixture(
            {"a": ids, "b": ids.where("doc_id < 0")},
            {"a": 0.5, "b": 0.5},
            id_col="doc_id",
        )


# --- weighted sampling (A-ES) ----------------------------------------------

def test_weighted_sample_exact_k_and_deterministic(spark):
    from cdc_application_febuary_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, 1.0 + (i % 5)) for i in range(500)], "id long, w double"
    )
    s1 = sorted(r["id"] for r in weighted_sample(df, "w", 50, "id", seed=3).collect())
    s2 = sorted(r["id"] for r in weighted_sample(df, "w", 50, "id", seed=3).collect())
    assert s1 == s2 and len(s1) == 50
    # partitioning-invariant: same draw from a different layout
    s3 = sorted(
        r["id"]
        for r in weighted_sample(df.repartition(17), "w", 50, "id", seed=3).collect()
    )
    assert s1 == s3


def test_weighted_sample_prefers_heavy_rows(spark):
    from pyspark.sql import functions as F

    from cdc_application_febuary_spark.operators.sampling import weighted_sample

    # 100 heavy rows (w=50) among 1900 light rows (w=1): heavies should
    # dominate a k=100 sample across seeds
    df = spark.createDataFrame(
        [(i, 50.0 if i < 100 else 1.0) for i in range(2000)], "id long, w double"
    )
    heavy_counts = []
    for seed in range(5):
        got = weighted_sample(df, "w", 100, "id", seed=seed)
        heavy_counts.append(got.where(F.col("id") < 100).count())
    assert min(heavy_counts) > 50  # ~72% expected; uniform would give ~5


def test_weighted_sample_drops_nonpositive_weights(spark):
    from cdc_application_febuary_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, None), (4, 2.0)], "id long, w double"
    )
    got = [r["id"] for r in weighted_sample(df, "w", 10, "id").collect()]
    assert got == [4]


def test_leakage_safe_split_keeps_clusters_whole(spark):
    from cdc_application_febuary_spark.operators.sampling import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    # clusters: {0,1,2}, {10,11}, rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "a long, b long"
    )
    out = leakage_safe_split(docs, pairs).collect()
    side = {r["doc_id"]: r["split"] for r in out}
    assert len(side) == 40
    assert side[0] == side[1] == side[2]
    assert side[10] == side[11]
    clus = {r["doc_id"]: r["cluster"] for r in out}
    assert clus[2] == 0 and clus[11] == 10
    assert clus[25] == 25  # singleton is its own cluster
    # both sides populated at this size and the ratio is hash-80/20-ish
    n_train = sum(1 for s in side.values() if s == "train")
    assert 0 < n_train < 40


def test_leakage_safe_split_is_deterministic_and_partition_invariant(spark):
    from cdc_application_febuary_spark.operators.sampling import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(60)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(3, 4)], "a long, b long")
    one = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(docs.coalesce(1), pairs).collect()
    }
    many = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(docs.repartition(7), pairs).collect()
    }
    assert one == many
