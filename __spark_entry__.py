"""Driver contract for the spark-graft builder (PySpark target).

Backed by the engine's query registry
(cassandra_cql_streaming_db_migrator_spark.queries): every implemented
operator family from SURVEY.md §2 is a named query paired with a DuckDB
oracle; entries without an oracle (non-SQL-expressible ops) get the driver's
rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cassandra_cql_streaming_db_migrator_spark.queries import all_queries
from cassandra_cql_streaming_db_migrator_spark.session import tune_existing

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full spec-driven migration pipeline (pushdown
    filter + MVEL filter chain + calculated column + column mapping) on
    sf0.001 lineitem."""
    tune_existing(spark)
    return all_queries()["migrate_pipeline"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, q in all_queries().items():

        def make(fn):
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                tune_existing(spark)
                return fn(spark, sf_dir)

            return run

        out[name] = make(q.fn)
    return out


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
