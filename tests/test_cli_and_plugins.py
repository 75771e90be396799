"""CLI entry point (Main.java analog) + plugin registry (reflective-load
analog) end to end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_cql_streaming_db_migrator_spark.__main__ import main
from cassandra_cql_streaming_db_migrator_spark.operators.filters import apply_filter_chain
from cassandra_cql_streaming_db_migrator_spark.plans.plugins import (
    register_filter,
    resolve,
)
from cassandra_cql_streaming_db_migrator_spark.plans.spec import FilterDef
from cassandra_cql_streaming_db_migrator_spark.sources.parquet import load_table

EXAMPLE_YAML = """
threadCount: 1
tables:
  - tableName: orders
    keyColumns: [o_orderkey]
    continueOnRowError: true
    whereClause: "o_orderstatus = 'O'"
    dataFilters:
      - expression: "row.o_totalprice >= 1000"
    calculatedColumns:
      bucket: "abs(hash(o_orderpriority)) % 8"
  - tableName: region
    keyColumns: [r_regionkey]
    continueOnRowError: true
"""


def test_cli_runs_example_config_and_reports(spark, sf_dir, tmp_path, capsys):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(EXAMPLE_YAML)
    rc = main(
        ["-configYaml", str(cfg), "--tables-dir", sf_dir], spark=spark
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "table orders -> orders [SIMULATED]" in out
    assert "table region -> region [SIMULATED]" in out
    # rowsRead counts post-whereClause rows — the pushdown predicate runs
    # server-side BEFORE rows are "read", exactly the reference's counter
    # semantics (rowsRead counts fetched rows, DMP:207-210 + MTT:311-313)
    assert "rowsRead=514" in out  # sf0.001 orders with o_orderstatus='O'


def test_cli_execute_writes_upsert_target(spark, sf_dir, tmp_path, capsys):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        """
tables:
  - tableName: region
    keyColumns: [r_regionkey]
    continueOnRowError: true
    simulateOnly: false
"""
    )
    out_dir = tmp_path / "out"
    rc = main(
        ["-configYaml", str(cfg), "--tables-dir", sf_dir, "--execute",
         "--output-dir", str(out_dir)],
        spark=spark,
    )
    assert rc == 0
    written = spark.read.parquet(str(out_dir / "region.parquet"))
    assert written.count() == 5


def test_python_plugin_filter_in_chain(spark, sf_dir):
    register_filter("only_big_orders", lambda df: df.filter(F.col("o_totalprice") > 100000))
    orders = load_table(spark, sf_dir, "orders")
    out = apply_filter_chain(
        orders,
        [FilterDef(expression="only_big_orders", language="python"),
         FilterDef(expression="o_orderstatus = 'O'", language="sql")],
    )
    rows = out.select("o_totalprice", "o_orderstatus").collect()
    assert rows and all(r[0] > 100000 and r[1] == "O" for r in rows)


def test_module_path_plugin_resolution():
    fn = resolve("operator:itemgetter", kind="filter")  # stdlib module:attr
    assert callable(fn)
    with pytest.raises(ValueError, match="cannot load plugin"):
        resolve("no_such_module_xyz:fn")
    with pytest.raises(ValueError, match="unknown filter plugin"):
        resolve("never_registered")
