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
