"""Beyond-reference pipeline queries vs the DuckDB oracle at sf0.01
(rows-only queries just execute and must return a stable non-degenerate
shape)."""

import pytest

from cdc_application_febuary_spark.queries import all_queries, pipeline_ops

from .oracle_utils import compare_to_oracle

# driver-facing registry: includes the _hash_stable decimal->double wrapper
_REGISTRY = all_queries()

ORACLE_PAIRED = sorted(n for n in pipeline_ops.QUERIES if n in pipeline_ops.ORACLES)
ROWS_ONLY = sorted(n for n in pipeline_ops.QUERIES if n not in pipeline_ops.ORACLES)


@pytest.mark.parametrize("name", ORACLE_PAIRED)
def test_pipeline_query_vs_oracle(spark, sf_dir, name):
    df = _REGISTRY[name](spark, sf_dir)
    compare_to_oracle(df, pipeline_ops.ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = _REGISTRY[name](spark, sf_dir)
    rows = df.collect()
    assert df.columns  # stable schema
    assert len(rows) >= 0
