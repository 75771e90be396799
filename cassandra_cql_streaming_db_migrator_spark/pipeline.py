"""Pipeline executor — the engine's DbMigrator.

The reference's lifecycle (SURVEY §3): Config -> per-table init (schema
discovery, filter/plugin loading, query building, validation;
MigrateTableTask.java:160-181) -> pull-based row loop with filter chain +
parallel per-row writes (MTT:281-367).  Here the whole lifecycle collapses
into one declarative DataFrame lineage per table:

    read -> where_clause filter -> filter chain -> computed columns
         -> TTL arithmetic -> anti-join (if-not-exists) / counter merge
         -> column mapping -> read/write limit -> sink

Catalyst's analyze/optimize replaces ``initialize()``; Tungsten execution
replaces the row loop; input-split partitioning replaces paging; task
parallelism replaces the write thread pool.  Any table's plan failure aborts
the job before any table runs (plan-all-then-run, mirroring
DbMigrator.java:72-74's init-failure abort).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.anti_join import if_not_exists_filter
from .operators.compute import with_computed_columns
from .operators.counter import counter_merge
from .operators.filters import apply_filter_chain, pushdown_filter
from .operators.limits import read_limit
from .operators.ttl import ttl_preserving_columns
from .plans.spec import PipelineSpec, TableMigration
from .plans.validate import validate_migration_schema
from .sinks.sinks import noop_sink


@dataclass
class TableRunResult:
    table: str
    target: str
    simulated: bool
    rows_read: int
    rows_passed_filter: int
    rows_filtered: int
    rows_migrated: int
    warnings: list[str] = field(default_factory=list)


def build_table_plan(
    spec: TableMigration,
    source_df: DataFrame,
    target_df: DataFrame | None = None,
) -> tuple[DataFrame, list[str]]:
    """Compose the declarative plan for one table migration.  Returns the
    final DataFrame plus plan-time warnings (dropped columns etc.)."""
    warnings: list[str] = []
    df = source_df

    if spec.where_clause:
        df = pushdown_filter(df, spec.where_clause)  # S4
    df = apply_filter_chain(df, spec.filters)  # F2/F3
    df = with_computed_columns(df, spec.calculated_columns)  # P3

    if spec.respect_ttl and spec.source_default_ttl and spec.target_default_ttl:
        df = ttl_preserving_columns(df, spec.source_default_ttl, spec.target_default_ttl)  # S3/K4

    if spec.insert_only_if_not_exist:
        if target_df is None:
            raise ValueError(f"table {spec.table_name}: if-not-exists needs target data")
        df = if_not_exists_filter(df, target_df, spec.key_columns)  # J1/K2

    if spec.counter_columns:
        df = counter_merge(df, spec.key_columns, spec.counter_columns)  # K3/A1

    if target_df is not None and not spec.counter_columns:
        result = validate_migration_schema(
            df.schema if not spec.calculated_columns else df.schema,
            target_df.schema,
            spec.key_columns,
            spec.calculated_columns,
        )
        warnings.extend(result.warnings)
        cols = [c for c in result.write_columns]
        extra = [c for c in df.columns if c in ("target_ttl", "row_ttl_value") and c not in cols]
        df = df.select(*cols, *extra)  # P1/P2

    df = read_limit(df, spec.max_read_row_count)  # S5
    if spec.max_write_row_count and spec.max_write_row_count > 0:
        df = df.limit(spec.max_write_row_count)  # K6, exact (no overshoot race)
    return df, warnings


def run_pipeline(
    spark: SparkSession,
    spec: PipelineSpec,
    tables: dict[str, DataFrame],
    targets: dict[str, DataFrame] | None = None,
    sink=None,
) -> list[TableRunResult]:
    """Plan every table, then run them in declared order (O3/T7 —
    fixed-order execution, DbMigrator.java:78-80).  ``sink`` is a callable
    ``(df, table_spec) -> rows_written``; None = simulate (noop)."""
    spec.validate()
    targets = targets or {}

    planned = []
    for t in spec.tables:
        src = tables[t.table_name]
        tgt = targets.get(t.target)
        plan, warns = build_table_plan(t, src, tgt)
        planned.append((t, src, plan, warns))  # plan-all-then-run

    results = []
    for t, src, plan, warns in planned:
        rows_read = src.count() if not t.where_clause else pushdown_filter(src, t.where_clause).count()
        simulated = t.simulate_only or sink is None
        if simulated:
            migrated = noop_sink(plan)
        else:
            migrated = sink(plan, t)
        passed = migrated if t.max_write_row_count <= 0 else plan.count()
        results.append(
            TableRunResult(
                table=t.table_name,
                target=t.target,
                simulated=simulated,
                rows_read=rows_read,
                rows_passed_filter=passed,
                rows_filtered=max(rows_read - passed, 0),
                rows_migrated=migrated,
                warnings=warns,
            )
        )
    return results
