"""TPC-H-style analytical queries vs the DuckDB oracle."""

import pytest

from cdc_application_febuary_spark.queries import tpch_style

from .oracle_utils import compare_to_oracle


@pytest.mark.parametrize("name", sorted(tpch_style.QUERIES))
def test_tpch_style_query(spark, sf_dir, name):
    df = tpch_style.QUERIES[name](spark, sf_dir)
    compare_to_oracle(df, tpch_style.ORACLES[name], sf_dir)
