"""VERDICT r8 item 4: the embeddings content fingerprint must (a) agree
bit-for-bit between Spark and DuckDB and (b) FLIP when any single vector
coordinate changes, so a driver-regenerated fixture hash-fails the three
recall-floor queries (ann_topk_lsh / dedup_embedding_srp /
semantic_dedup_report) and forces a floor re-measure."""

import duckdb
import pytest

from cdc_application_febuary_spark.operators.sampling import (
    embedding_fingerprint,
    embedding_fingerprint_sql,
)


def _vecs(perturb: bool):
    rows = []
    for i in range(8):
        v = [((i * 31 + j * 7) % 13 - 6) / 7.0 for j in range(6)]
        if perturb and i == 3:
            v[2] += 0.001
        rows.append((i, v))
    return rows


@pytest.fixture(scope="module")
def fp_pair(spark):
    out = {}
    for name, perturb in (("base", False), ("pert", True)):
        df = spark.createDataFrame(
            _vecs(perturb), "vec_id long, embedding array<float>"
        )
        out[name] = int(
            df.transform(embedding_fingerprint).first()["fixture_fp"]
        )
    return out


def test_perturbation_flips_fingerprint(fp_pair):
    assert fp_pair["base"] != fp_pair["pert"]


def test_cross_engine_parity(spark, fp_pair):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[])"
    )
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?)", _vecs(False)
    )
    duck_fp = con.execute(embedding_fingerprint_sql()).fetchone()[0]
    assert int(duck_fp) == fp_pair["base"]


def test_fixture_queries_carry_fingerprint():
    # the three calibrated queries must hash-compare fixture_fp
    from cdc_application_febuary_spark.queries import all_oracles

    oracles = all_oracles()
    for name in (
        "ann_topk_lsh",
        "dedup_embedding_srp",
        "semantic_dedup_report",
    ):
        assert "fixture_fp" in oracles[name], name


def test_bounded_pairs_cap_fails_loudly(spark, monkeypatch):
    """The sample-bounded exact-reference collect must REFUSE a
    pathological duplicate density instead of silently truncating or
    OOMing the driver."""
    import pytest as _pytest

    from cdc_application_febuary_spark.operators.dedup import (
        embedding_near_dup_pairs_between,
    )
    from cdc_application_febuary_spark.queries import pipeline_ops as P

    # 40 identical vectors -> 40*39/2 = 780 pairs > the patched cap
    df = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    pairs = embedding_near_dup_pairs_between(df, df, threshold=0.9)
    monkeypatch.setattr(P, "_PAIR_COLLECT_CAP", 100)
    with _pytest.raises(RuntimeError, match="exceeds"):
        P._bounded_pairs(pairs, "cap test")
    # and under the cap it returns the full exact set
    monkeypatch.setattr(P, "_PAIR_COLLECT_CAP", 10_000)
    got = P._bounded_pairs(pairs, "cap test")
    assert len(got) == 40 * 39 // 2
