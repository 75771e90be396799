"""TTL probe + TTL-preserving arithmetic (SURVEY §2.1 S3, §2.2 K4).

When source and target tables both have a table-level default TTL, the
reference adds ``TTL(<first non-PK data column>) AS row_ttl_value`` to the
read (DefaultMigratorPlugin.java:192-203; table TTL from
CassandraSchemaUtil.java:90-96) and writes each row with

    target_ttl = targetTableTTL - (sourceTableTTL - row_ttl_value)

(DMP:360-365) so the row's *age* is preserved across tables with different
default TTLs.  Against Cassandra our reader gets ``ttl(col)`` from the
connector; on parquet fixtures ``row_ttl_value`` is a regular column.

Edge semantics preserved deliberately: a row older than the new TTL yields a
negative target_ttl (expired-under-new-TTL) — surfaced, not clamped, so the
sink's error policy decides (SURVEY §7.4 watch list).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ttl_preserving_columns(
    df: DataFrame,
    source_default_ttl: int,
    target_default_ttl: int,
    row_ttl_column: str = "row_ttl_value",
    out_column: str = "target_ttl",
) -> DataFrame:
    """K4: per-row target TTL arithmetic (DMP:360-365)."""
    age_adjusted: Column = F.lit(target_default_ttl) - (
        F.lit(source_default_ttl) - F.col(row_ttl_column)
    )
    return df.withColumn(out_column, age_adjusted.cast("int"))
