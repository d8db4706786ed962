"""PySpark-native CDC + analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference CDC replication platform (`saroj2026/cdc-application-febuary`),
re-expressed idiomatically on Spark: DataFrame/SQL for batch analytics,
Structured Streaming for the change path, and plain declarative plans so
Catalyst/Tungsten pick the physical strategy.

Layout:
  session     - tuned SparkSession construction (AQE, UTC, shuffle sizing)
  catalog     - test-fixture table loading / temp-view registration
  functions/  - scalar expression helpers (changelog ops, LSN math, text, vectors)
  operators/  - composite operators (profiling, SCD2, dedup, similarity,
                reconciliation, schema drift, multimodal plumbing)
  queries/    - the declared correctness queries (SURVEY.md §2.11) and the
                beyond-reference data-pipeline queries, each paired with a
                DuckDB oracle SQL string
  streaming/  - Structured Streaming change path + monitoring listener
  sources/    - JDBC partitioned-read specs and cross-engine type mapping
"""

__version__ = "0.1.0"
