"""Projection / column mapping (SURVEY §2.3 P1/P2).

The reference writes the intersection of source and target columns, matched
by name, PK columns first (LinkedHashSet ordering,
DefaultMigratorPlugin.java:239-274); underivable target non-PK columns are
dropped with a warning (DMP:256-269).  Column mapping is a ``select`` —
Catalyst prunes the scan down to exactly these columns (ReadSchema), which at
100 TB is the difference between reading 2 columns and reading 16.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..plans.validate import ValidationResult, validate_migration_schema


def column_mapping(
    df: DataFrame,
    target_schema: T.StructType,
    key_columns: list[str],
    calculated_columns: dict[str, str] | None = None,
) -> tuple[DataFrame, ValidationResult]:
    """Validate source->target compatibility (the three DMP:227-269 rules)
    and project to the write column set, PK first."""
    result = validate_migration_schema(df.schema, target_schema, key_columns, calculated_columns)
    return df.select(*result.write_columns), result
