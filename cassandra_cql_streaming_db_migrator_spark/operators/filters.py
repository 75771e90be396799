"""Filter operators (SURVEY §2.4).

The reference splits filtering into a *user-chosen* pushdown WHERE
(DefaultMigratorPlugin.java:207-210, CQL restricts it to key columns) and an
in-memory MVEL row-set filter chain (FieldValueFilter.java:35-89,
MigrateTableTask.java:446-451) — precisely because CQL cannot filter on
non-key columns (migration-config.example.yaml:83-95 documents the tradeoff).

In Spark one operator covers both: ``df.filter(expr)``.  Catalyst's
PushDownPredicates decides what reaches the scan — the user no longer picks
the execution strategy, only the predicate.  At 100 TB this is the difference
between a full-table stream through Python and a parquet row-group skip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.mvel import translate_mvel


def pushdown_filter(df: DataFrame, where_clause: str) -> DataFrame:
    """S4/F1 — the reference appends the predicate text verbatim to the CQL
    read (DMP:207-210).  The example predicates (equality, IN, range —
    migration-config.example.yaml:78) are valid Spark SQL verbatim."""
    return df.filter(F.expr(where_clause))


def memory_filter(df: DataFrame, expression: str, language: str = "mvel") -> DataFrame:
    """F2 — FieldValueFilter: MVEL boolean over named columns, applied to row
    batches (FieldValueFilter.java:68-87).  Translated to a Catalyst
    predicate; 'in-memory vs pushdown' stops being the user's problem."""
    sql = translate_mvel(expression) if language == "mvel" else expression
    return df.filter(F.expr(sql))


def apply_filter_chain(df: DataFrame, filters: list) -> DataFrame:
    """F3 — ordered filter chain (TableMigrationDefinition.java:100-105,
    MigrateTableTask.java:446-451).  Catalyst folds consecutive filters into
    one predicate; declared order is preserved semantically (pure predicates
    commute, IRowSetFilter.java:33-37's ordering contract is vacuous here).

    ``language: python`` entries are plugin references (registered name or
    module:function — plans.plugins), the IRowSetFilter custom-class
    analog: the callable takes and returns a DataFrame."""
    from ..plans.plugins import resolve

    for flt in filters:
        if getattr(flt, "language", None) == "python":
            df = resolve(flt.expression, kind="filter")(df)
            continue
        sql = flt.to_sql() if hasattr(flt, "to_sql") else str(flt)
        df = df.filter(F.expr(sql))
    return df
