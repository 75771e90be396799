"""Plan-time schema compatibility validation.

Reimplements the reference's three rules (DefaultMigratorPlugin.java:227-269,
154-161) as a pure check over two Spark ``StructType`` schemas plus the
computed-column list:

  1. every target PK column must come from source columns or calculated
     columns — hard error (DMP:249-254);
  2. target non-PK columns not derivable are dropped with a warning
     (DMP:256-269);
  3. calculated column names must exist in the target and be unique
     (DMP:154-161; uniqueness is free here since the spec holds a dict).

Runtime type checking (DMP:380-383) is delegated to the Analyzer — casting a
calculated value to the target column type either succeeds or raises at plan
time, strictly earlier than the reference's per-row check.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


class SchemaValidationError(ValueError):
    pass


@dataclass
class ValidationResult:
    # target columns, PK first (LinkedHashSet ordering parity, DMP:239-274)
    write_columns: list[str] = field(default_factory=list)
    dropped_columns: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)


def validate_migration_schema(
    source_schema: T.StructType,
    target_schema: T.StructType,
    target_key_columns: list[str],
    calculated_columns: dict[str, str] | None = None,
) -> ValidationResult:
    calc = calculated_columns or {}
    src_cols = {f.name for f in source_schema.fields}
    tgt_cols = [f.name for f in target_schema.fields]
    derivable = src_cols | set(calc)

    for name in calc:
        if name not in tgt_cols:
            # DMP:154-158 — calculated column must exist in the target table
            raise SchemaValidationError(
                f"calculated column '{name}' does not exist in the target table"
            )

    result = ValidationResult()
    for pk in target_key_columns:
        if pk not in tgt_cols:
            raise SchemaValidationError(f"key column '{pk}' not in target schema")
        if pk not in derivable:
            # DMP:249-254 — missing PK source is a hard error
            raise SchemaValidationError(
                f"target key column '{pk}' is not present in source columns "
                "or calculated columns"
            )

    # PK-first ordering, then remaining target columns in target order
    for name in list(target_key_columns) + [c for c in tgt_cols if c not in target_key_columns]:
        if name in result.write_columns:
            continue
        if name in derivable:
            result.write_columns.append(name)
        else:
            # DMP:256-269 — drop with warning
            result.dropped_columns.append(name)
            result.warnings.append(
                f"target column '{name}' is not derivable from source or "
                "calculated columns - it will not be written"
            )
    return result


# CQL types the reference's migrator supports (CassandraSchemaUtil.java:
# 165-211); everything else raises "column has not supported type by the
# migrator" (CSU:153-157).  Spark equivalents of the SUPPORTED set:
_REFERENCE_SUPPORTED_TYPES = (
    T.ByteType,      # tinyint
    T.ShortType,     # smallint
    T.IntegerType,   # int
    T.LongType,      # bigint / counter
    T.DecimalType,   # decimal
    T.DoubleType,    # double
    T.FloatType,     # float
    T.BooleanType,   # boolean
    T.StringType,    # varchar/text/ascii/uuid-as-string
)


def strict_type_check(schema: T.StructType, table_name: str = "") -> None:
    """§1.3 strict mode: reproduce the reference's unsupported-type
    rejection for parity testing.  The engine itself handles every Spark
    type (timestamps, binary, nested structs — see the typed roundtrip
    test); this check exists so a migration validated here is guaranteed
    to also run on the reference.  Container types pass when their
    element/key/value types do (list/set/map support, CSU:170-179)."""

    def ok(dt: T.DataType) -> bool:
        if isinstance(dt, T.ArrayType):
            return ok(dt.elementType)
        if isinstance(dt, T.MapType):
            return ok(dt.keyType) and ok(dt.valueType)
        return isinstance(dt, _REFERENCE_SUPPORTED_TYPES)

    bad = [f"{f.name} ({f.dataType.simpleString()})" for f in schema.fields if not ok(f.dataType)]
    if bad:
        raise SchemaValidationError(
            f"table {table_name or '<schema>'}: column(s) have types the "
            f"reference migrator does not support: {', '.join(bad)} "
            "(CassandraSchemaUtil.java:153-157); disable strict_types to "
            "migrate them with this engine"
        )
