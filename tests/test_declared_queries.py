"""Q1-Q20 (SURVEY.md §2.11) vs the DuckDB oracle at sf0.01 — the same gate
the driver applies."""

import pytest

from cdc_application_febuary_spark.queries import all_queries, declared

from .oracle_utils import compare_to_oracle

# driver-facing registry: includes the _hash_stable decimal->double wrapper
_REGISTRY = all_queries()


@pytest.mark.parametrize("name", sorted(declared.QUERIES, key=lambda n: int(n[1:])))
def test_declared_query(spark, sf_dir, name):
    df = _REGISTRY[name](spark, sf_dir)
    compare_to_oracle(df, declared.ORACLES[name], sf_dir)
