"""Schema drift -> auto-DDL, end-to-end against embedded Derby (VERDICT r3
item 3): a source table evolves mid-pipeline (add column; widen int ->
bigint) while incremental polling runs, and the target evolves in place —
old rows NULL-backfill the added column, the widened column survives the
Derby rebuild path byte-for-byte, and a non-widening change parks the
pipeline with SchemaConflictError instead of corrupting the target.

Reference behavior: drift classification `data_quality.py:117-211`
(added/removed/modified), per-engine DDL transfer `transfer.py:378-429`.
"""

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cdc_application_febuary_spark.operators.drift import ColumnChange
from cdc_application_febuary_spark.sources import evolution as ev
from cdc_application_febuary_spark.sources.incremental import (
    load_state,
    poll_changes,
    save_state,
)
from cdc_application_febuary_spark.sources.jdbc import (
    JdbcReadSpec,
    JdbcWriteSpec,
)


def _specs(db: str, table: str):
    common = dict(
        engine="derby", host="", port=0, database=db, user="app",
        password="app", table=table,
    )
    return JdbcWriteSpec(**common), JdbcReadSpec(**common)


def _poll_into_target(spark, src_r, tgt_w, tgt_r, ckpt):
    """One pipeline tick: poll new source rows, evolve the target if the
    observed schema drifted, conform, append."""
    batch = src_r.read(spark)
    state = load_state(ckpt, offset_column="k")
    changes, state = poll_changes(batch, state)
    plan = ev.evolve_jdbc_target(spark, tgt_w, tgt_r, changes.schema)
    target_schema = tgt_r.read(spark).schema
    tgt_w.write(ev.conform_for_append(changes, target_schema))
    save_state(state, ckpt)
    return plan, target_schema


def test_add_column_evolves_target_with_null_backfill(spark, tmp_path):
    db, ckpt = str(tmp_path / "db"), str(tmp_path / "ckpt")
    src_w, src_r = _specs(db, "S_EVO")
    tgt_w, tgt_r = _specs(db, "T_EVO")

    src_w.write(
        spark.range(0, 5).select(
            F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
        )
    )
    # bootstrap target with the initial shape
    tgt_w.write(src_r.read(spark).limit(0))
    plan, _ = _poll_into_target(spark, src_r, tgt_w, tgt_r, ckpt)
    assert plan.noop
    assert tgt_r.read(spark).count() == 5

    # upstream gains a column; new rows carry it
    ev.execute_ddl(
        spark, src_w.url,
        ['ALTER TABLE S_EVO ADD COLUMN "email" varchar(100)'],
    )
    spark.range(5, 9).select(
        F.col("id").alias("k"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
        F.concat(F.col("id"), F.lit("@x.com")).alias("email"),
    ).write.format("jdbc").mode("append").options(
        url=src_w.url, dbtable="S_EVO"
    ).save()

    plan, target_schema = _poll_into_target(spark, src_r, tgt_w, tgt_r, ckpt)
    assert [f.name for f in plan.add] == ["email"]
    assert "email" in [f.name for f in target_schema.fields]
    out = tgt_r.read(spark)
    assert out.count() == 9
    # rows loaded before the evolution read back NULL; new rows carry data
    assert out.where(F.col("k") < 5).where(F.col("email").isNull()).count() == 5
    got = {r["k"]: r["email"] for r in out.where(F.col("k") >= 5).collect()}
    assert got == {k: f"{k}@x.com" for k in range(5, 9)}


def test_widen_int_to_bigint_via_derby_rebuild(spark, tmp_path):
    db, ckpt = str(tmp_path / "db"), str(tmp_path / "ckpt")
    src_w, src_r = _specs(db, "S_WIDE")
    tgt_w, tgt_r = _specs(db, "T_WIDE")

    first = spark.createDataFrame(
        [(0, 10), (1, 20)],
        StructType([
            StructField("k", LongType()),
            StructField("v", IntegerType()),
        ]),
    )
    src_w.write(first)
    tgt_w.write(src_r.read(spark).limit(0))
    _poll_into_target(spark, src_r, tgt_w, tgt_r, ckpt)
    assert dict(tgt_r.read(spark).dtypes)["v"] == "int"

    # upstream re-created with v BIGINT (Derby itself cannot re-type in
    # place — the recreate is exactly the upstream event that forces a
    # target widen): rows overflow int32 now
    ev.execute_ddl(spark, src_w.url, ["DROP TABLE S_WIDE"])
    big = 3_000_000_000  # > 2^31
    wide = spark.createDataFrame(
        [(0, 10), (1, 20), (2, big)],
        StructType([
            StructField("k", LongType()),
            StructField("v", LongType()),
        ]),
    )
    src_w.write(wide)

    plan, target_schema = _poll_into_target(spark, src_r, tgt_w, tgt_r, ckpt)
    assert [(c.column, c.before, c.after) for c in plan.widen] == [
        ("v", "int", "bigint")
    ]
    out = tgt_r.read(spark)
    assert dict(out.dtypes)["v"] == "bigint"
    # pre-evolution rows survived the rebuild; the overflowing row landed
    assert {(r["k"], r["v"]) for r in out.collect()} == {
        (0, 10), (1, 20), (2, big)
    }


def test_non_widening_change_parks_the_pipeline(spark, tmp_path):
    db = str(tmp_path / "db")
    tgt_w, tgt_r = _specs(db, "T_CONFLICT")
    tgt_w.write(
        spark.createDataFrame(
            [(0, 1)],
            StructType([
                StructField("k", LongType()),
                StructField("v", LongType()),
            ]),
        )
    )
    observed = StructType([
        StructField("k", LongType()),
        StructField("v", StringType()),  # bigint -> string: lossy
    ])
    with pytest.raises(ev.SchemaConflictError, match="not a lossless"):
        ev.evolve_jdbc_target(spark, tgt_w, tgt_r, observed)
    # target untouched
    assert dict(tgt_r.read(spark).dtypes)["v"] == "bigint"


def test_removed_source_column_is_kept_and_null_filled(spark, tmp_path):
    db = str(tmp_path / "db")
    tgt_w, tgt_r = _specs(db, "T_KEEP")
    tgt_w.write(
        spark.createDataFrame(
            [(0, "a", "x@x.com")], "k long, name string, email string"
        )
    )
    observed = StructType([
        StructField("k", LongType()),
        StructField("name", StringType()),
    ])
    plan = ev.evolve_jdbc_target(spark, tgt_w, tgt_r, observed)
    assert plan.target_only == ["email"] and plan.noop
    batch = spark.createDataFrame([(1, "b")], "k long, name string")
    tgt_w.write(ev.conform_for_append(batch, tgt_r.read(spark).schema))
    out = tgt_r.read(spark)
    assert out.count() == 2
    assert out.where("k = 1").first()["email"] is None


def test_widen_ddl_strings_per_engine():
    """PG/SQLServer/Oracle widen with a single in-place ALTER (the
    engines the reference's transfer_schema targets)."""
    plan = ev.EvolutionPlan(
        widen=[ColumnChange("v", "type_changed", "int", "bigint")]
    )
    evolved = StructType([StructField("v", LongType())])
    assert ev.alter_statements("postgresql", "t", plan, evolved) == [
        'ALTER TABLE t ALTER COLUMN "v" TYPE bigint'
    ]
    assert ev.alter_statements("sqlserver", "t", plan, evolved) == [
        'ALTER TABLE t ALTER COLUMN "v" bigint'
    ]
    assert ev.alter_statements("oracle", "t", plan, evolved) == [
        'ALTER TABLE t MODIFY ("v" NUMBER(19))'
    ]


def test_widening_lattice():
    w = ev._is_widening
    assert w("int", "bigint") and w("tinyint", "int") and w("float", "double")
    assert w("decimal(10,2)", "decimal(18,2)")
    assert not w("bigint", "int")
    assert not w("double", "float")
    assert not w("decimal(18,2)", "decimal(18,4)")  # integer digits shrink
    assert w("decimal(18,2)", "decimal(20,4)")  # both grow: safe
    assert not w("int", "string") and not w("int", "double")


def test_evolved_schema_composition_and_null_fill():
    """Pure-function coverage: evolved_schema applies widen+add in table
    order; conform_for_append(null_fill=True) materializes typed NULLs
    for full-physical-schema sinks."""
    from pyspark.sql.types import StructType

    target = StructType([
        StructField("k", LongType()),
        StructField("v", IntegerType()),
    ])
    source = StructType([
        StructField("k", LongType()),
        StructField("v", LongType()),
        StructField("tag", StringType()),
    ])
    plan = ev.plan_evolution(target, source)
    evolved = ev.evolved_schema(target, plan)
    assert [(f.name, f.dataType.simpleString()) for f in evolved.fields] == [
        ("k", "bigint"), ("v", "bigint"), ("tag", "string"),
    ]


def test_conform_null_fill_materializes_target_only_columns(spark):
    from pyspark.sql.types import StructType

    target = StructType([
        StructField("k", LongType()),
        StructField("name", StringType()),
        StructField("email", StringType()),
    ])
    batch = spark.createDataFrame([(1, "b")], "k long, name string")
    full = ev.conform_for_append(batch, target, null_fill=True)
    assert full.columns == ["k", "name", "email"]
    assert full.first()["email"] is None
    # default (omit) drops the target-only column for JDBC appends
    slim = ev.conform_for_append(batch, target)
    assert slim.columns == ["k", "name"]
