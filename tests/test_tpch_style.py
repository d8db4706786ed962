"""TPC-H-style analytical queries vs the DuckDB oracle."""

import pytest

from cdc_application_febuary_spark.queries import all_queries, tpch_style

from .oracle_utils import compare_to_oracle

# the driver-facing registry applies _hash_stable (decimal->double) — test
# the surface the driver actually sees, not the raw builders
_REGISTRY = all_queries()


@pytest.mark.parametrize("name", sorted(tpch_style.QUERIES))
def test_tpch_style_query(spark, sf_dir, name):
    df = _REGISTRY[name](spark, sf_dir)
    compare_to_oracle(df, tpch_style.ORACLES[name], sf_dir)
