"""entity_resolution_golden composition: planted variants resolve to
their sources on a controlled vocabulary, and the golden record keeps
the earliest-id values."""

from cdc_application_febuary_spark.queries.pipeline_ops import QUERIES

SF = "/root/testdata/sf0.001"


def test_golden_records_smallest_fixture(spark):
    rows = QUERIES["entity_resolution_golden"](spark, SF).collect()
    assert rows, "expected at least one multi-member cluster"
    for r in rows:
        # canonical id is a real source id (variants live at >= 10M and
        # can never be a cluster's min when their source is present) or
        # a variant-only cluster (blocked-off typo pair)
        assert r["n_records"] >= 2
        assert r["n_planted"] <= r["n_records"]
    linked = [r for r in rows if r["n_planted"] > 0 and r["src_linked"]]
    assert linked, "at least some planted variants must resolve"
    # golden survivorship: where a source is present (canonical < 10M),
    # the golden price is the SOURCE price, not the +50 drifted one
    import duckdb

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW part AS SELECT * FROM '{SF}/part.parquet'"
    )
    prices = dict(
        con.sql("SELECT p_partkey, p_retailprice FROM part").fetchall()
    )
    for r in rows:
        if r["canonical_id"] < 10_000_000:
            assert r["golden_price"] == prices[r["canonical_id"]]
