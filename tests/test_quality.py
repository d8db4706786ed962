"""Combined data-quality report (data_quality.py parity)."""

from pyspark.sql import functions as F

from cdc_application_febuary_spark.functions.changelog import stamp_full_load
from cdc_application_febuary_spark.operators.quality import data_quality_report


def test_healthy_pipeline(spark):
    src = spark.createDataFrame([(1, "a"), (2, None)], ["id", "name"])
    tgt = stamp_full_load(src)
    rep = data_quality_report(src, tgt)
    assert rep.healthy
    assert rep.row_count_match and rep.schema_match
    assert rep.null_deltas == {"id": 0, "name": 0}


def test_detects_row_loss_and_null_increase(spark):
    src = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["id", "name"])
    tgt = stamp_full_load(
        src.where("id < 3").withColumn(
            "name", F.when(F.col("id") == 2, None).otherwise(F.col("name"))
        )
    )
    rep = data_quality_report(src, tgt)
    assert not rep.healthy
    assert not rep.row_count_match
    assert rep.source_rows == 3 and rep.target_rows == 2
    assert rep.null_deltas["name"] == 1  # the transfer dropped a value


def test_detects_drift(spark):
    src = spark.createDataFrame([(1, "a")], ["id", "name"])
    tgt = stamp_full_load(src.withColumn("id", F.col("id").cast("string")))
    rep = data_quality_report(src, tgt)
    assert not rep.schema_match
    kinds = {(c.column, c.kind) for c in rep.drift}
    assert ("id", "type_changed") in kinds
