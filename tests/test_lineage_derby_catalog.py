"""J3 against a live database: FK edges read from embedded Derby's system
catalog (SYS.SYSFOREIGNKEYS), then BFS + dependency validation over them —
the live twin of the fixture-driven fk_lineage_report driver query."""

from cdc_application_febuary_spark.operators.lineage import (
    fk_edges_from_live_catalog,
    missing_dependencies,
    reachable_tables,
)
from cdc_application_febuary_spark.sources.evolution import execute_ddl
from cdc_application_febuary_spark.sources.jdbc import JdbcWriteSpec


def test_live_derby_fk_catalog_to_lineage(spark, tmp_path):
    db = str(tmp_path / "db")
    w = JdbcWriteSpec(
        engine="derby", host="", port=0, database=db, user="app",
        password="app", table="IGNORED",
    )
    execute_ddl(
        spark,
        w.url,
        [
            "CREATE TABLE T_REGION (RK INT PRIMARY KEY, NAME VARCHAR(20))",
            "CREATE TABLE T_NATION (NK INT PRIMARY KEY, RK INT, "
            "CONSTRAINT FK_N_R FOREIGN KEY (RK) REFERENCES T_REGION (RK))",
            "CREATE TABLE T_CUST (CK INT PRIMARY KEY, NK INT, "
            "CONSTRAINT FK_C_N FOREIGN KEY (NK) REFERENCES T_NATION (NK))",
            "CREATE TABLE T_ORDERS (OK INT PRIMARY KEY, CK INT, "
            "CONSTRAINT FK_O_C FOREIGN KEY (CK) REFERENCES T_CUST (CK))",
        ],
    )
    edges = fk_edges_from_live_catalog(spark, w.url, engine="derby")
    got = {
        (r["from_table"], r["to_table"], r["constraint_name"])
        for r in edges.collect()
    }
    assert got == {
        ("t_nation", "t_region", "FK_N_R"),
        ("t_cust", "t_nation", "FK_C_N"),
        ("t_orders", "t_cust", "FK_O_C"),
    }
    assert edges.schema["type"].dataType.simpleString() == "string"

    reach = {
        r["table"]: r["hops"]
        for r in reachable_tables(edges, ["t_orders"]).collect()
    }
    assert reach == {
        "t_orders": 0, "t_cust": 1, "t_nation": 2, "t_region": 3
    }

    missing = {
        r["table"]
        for r in missing_dependencies(edges, ["t_orders", "t_cust"]).collect()
    }
    assert missing == {"t_nation"}
