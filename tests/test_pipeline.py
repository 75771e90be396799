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


def test_error_policy_continue_counts_failed(spark, sf_dir):
    """T5: invalid rows (NULL PK) are quarantined and counted, not written."""
    from pyspark.sql import Row

    from cassandra_cql_streaming_db_migrator_spark.plans.spec import TableMigration, PipelineSpec

    src = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=None, v="bad"), Row(k=3, v="c")], "k long, v string"
    )
    spec = PipelineSpec(
        tables=[TableMigration(table_name="t", key_columns=["k"], continue_on_row_error=True)]
    )
    [res] = run_pipeline(spark, spec, {"t": src})
    assert res.rows_failed == 1
    assert res.rows_migrated == 2
    assert res.rows_read == 3
    assert res.rows_read == res.rows_passed_filter + res.rows_filtered + res.rows_failed


def test_error_policy_failfast_aborts(spark, sf_dir):
    """T5: continue_on_row_error=False aborts the table on any invalid row
    (MigrateTableTask.java:496-517 fail-fast parity)."""
    import pytest
    from pyspark.sql import Row

    from cassandra_cql_streaming_db_migrator_spark.plans.spec import TableMigration, PipelineSpec

    src = spark.createDataFrame([Row(k=None, v="bad")], "k long, v string")
    spec = PipelineSpec(
        tables=[TableMigration(table_name="t", key_columns=["k"], continue_on_row_error=False)]
    )
    with pytest.raises(RuntimeError, match="fail validity"):
        run_pipeline(spark, spec, {"t": src})


def test_thread_pool_scheduling(spark, sf_dir):
    """T7: thread_count > 1 runs table tasks concurrently; results keep
    declared order (DbMigrator.java:78-80)."""
    spec = load_spec(
        {
            "threadCount": 3,
            "tables": [
                {"tableName": n, "keyColumns": [k], "continueOnRowError": False}
                for n, k in [
                    ("region", "r_regionkey"),
                    ("nation", "n_nationkey"),
                    ("customer", "c_custkey"),
                ]
            ],
        }
    )
    tables = load_tables(spark, sf_dir)
    results = run_pipeline(spark, spec, tables)
    assert [r.table for r in results] == ["region", "nation", "customer"]
    assert [r.rows_migrated for r in results] == [5, 25, 150]


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
