"""Snapshot diff: classify row-level drift between two table versions.

The verification step of a migration (the reference writes, simulates and
counts — DefaultMigratorPlugin.java's dry-run stats — but never CHECKS the
target against the source): full-outer join source and target on the
primary key and classify every key as ``insert`` (target only), ``delete``
(source only) or ``update`` (both present, some non-key column differs),
listing exactly WHICH columns differ.  Rows equal on every compared column
are dropped — the output is the drift, not the table.

Scale shape: one co-partitioned full-outer join on the PK (both sides
shuffle once — the floor for whole-table comparison); per-column
comparisons are codegen'd null-safe equality, and the changed-column list
is a compile-time array of CASE branches, no Python.

Null semantics: comparisons are null-SAFE (NULL vs NULL is equal,
NULL vs value is a difference) — drift detection must not mask NULLed-out
columns, the classic silent migration bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    src: DataFrame,
    tgt: DataFrame,
    pk_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Returns one row per drifted key: ``*pk, change_type,
    changed_cols`` (sorted array; empty for insert/delete)."""
    if compare_cols is None:
        compare_cols = [
            c for c in src.columns if c not in pk_cols and c in tgt.columns
        ]
    s = src.select(*pk_cols, *[F.col(c).alias(f"__s_{c}") for c in compare_cols])
    t = tgt.select(*pk_cols, *[F.col(c).alias(f"__t_{c}") for c in compare_cols])
    # presence flags survive the outer join even for all-NULL payload rows
    s = s.withColumn("__in_s", F.lit(True))
    t = t.withColumn("__in_t", F.lit(True))
    j = s.join(t, pk_cols, "full_outer")
    differs = [
        (c, ~F.col(f"__s_{c}").eqNullSafe(F.col(f"__t_{c}")))
        for c in compare_cols
    ]
    changed_cols = F.array_sort(
        F.filter(
            F.array(
                *[F.when(d, F.lit(c)).otherwise(F.lit(None)) for c, d in differs]
            ),
            lambda x: x.isNotNull(),
        )
    )
    any_diff = F.size(changed_cols) > 0
    change_type = (
        F.when(F.col("__in_s").isNull(), F.lit("insert"))
        .when(F.col("__in_t").isNull(), F.lit("delete"))
        .when(any_diff, F.lit("update"))
    )
    return (
        j.withColumn("change_type", change_type)
        .where(F.col("change_type").isNotNull())
        .select(
            *pk_cols,
            "change_type",
            F.when(F.col("change_type") == "update", changed_cols)
            .otherwise(F.array().cast("array<string>"))
            .alias("changed_cols"),
        )
    )
