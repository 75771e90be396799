"""Pipeline-level tests mirroring the reference's operational semantics
(SURVEY §5.2: conservation, limits, if-not-exists)."""

from __future__ import annotations

from cassandra_cql_streaming_db_migrator_spark.pipeline import run_pipeline
from cassandra_cql_streaming_db_migrator_spark.plans.spec import load_spec
from cassandra_cql_streaming_db_migrator_spark.sources.parquet import load_tables


def test_simulate_conservation(spark, sf_dir):
    """rows_read == rows_passed + rows_filtered, zero writes (K5/A2,
    DbMigrator.java:101-106)."""
    spec = load_spec(
        {
            "tables": [
                {
                    "tableName": "lineitem",
                    "keyColumns": ["l_orderkey", "l_linenumber"],
                    "filters": [{"expression": "row.l_discount >= 0.03 && row.l_discount < 0.07"}],
                    "continueOnRowError": False,
                }
            ]
        }
    )
    tables = load_tables(spark, sf_dir)
    [res] = run_pipeline(spark, spec, tables)
    assert res.simulated is True
    assert res.rows_read == tables["lineitem"].count()
    assert res.rows_read == res.rows_passed_filter + res.rows_filtered
    assert res.rows_migrated == res.rows_passed_filter


def test_write_cap_exact(spark, sf_dir):
    """maxWriteRowCount caps exactly (no overshoot — unlike the reference's
    racy check, SURVEY §7.4)."""
    spec = load_spec(
        {
            "tables": [
                {
                    "tableName": "orders",
                    "keyColumns": ["o_orderkey"],
                    "maxWriteRowCount": 37,
                    "continueOnRowError": False,
                }
            ]
        }
    )
    tables = load_tables(spark, sf_dir)
    [res] = run_pipeline(spark, spec, tables)
    assert res.rows_migrated == 37


def test_ordered_multi_table_and_plan_all_then_run(spark, sf_dir):
    """Tables run in declared order (O3/T7); plans built before any runs."""
    spec = load_spec(
        {
            "tables": [
                {"tableName": "region", "keyColumns": ["r_regionkey"], "continueOnRowError": False},
                {"tableName": "nation", "keyColumns": ["n_nationkey"], "continueOnRowError": False},
            ]
        }
    )
    tables = load_tables(spark, sf_dir)
    results = run_pipeline(spark, spec, tables)
    assert [r.table for r in results] == ["region", "nation"]
    assert results[0].rows_migrated == 5 and results[1].rows_migrated == 25
