"""Table profiling: the per-column census a migration validates against.

The reference validates schemas structurally before moving rows
(DataMigrationPlan.java's table/column checks); a data-level profile —
row count, null count, exact distinct count, min/max per column — is the
operational twin: run it on source and target and diff the two reports to
certify a migration (or drift-check a CDC mirror) without comparing rows.

Shape: ONE aggregation pass over the table produces every metric.  The
multi-column exact COUNT(DISTINCT) plans as Spark's Expand (input x
(n_cols+1) into one partial-agg shuffle whose state is per-column distinct
sets); exactness is the oracle contract here — at 100 TB swap
``F.countDistinct`` for ``F.approx_count_distinct`` (HLL, no expand) and
keep everything else.  The single result row is then unpivoted driver-free
via ``inline`` into the long-format report.

Numeric parity: min/max of numeric and timestamp columns are emitted as
DOUBLE (timestamps via epoch seconds — the session is pinned UTC, so Spark's
``cast(ts AS double)`` and DuckDB's ``epoch(ts)`` agree); string min/max as
VARCHAR.  No engine-specific number->string formatting is ever compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# kind: "num" (integer/double), "str" (varchar), "ts" (timestamp)
ColumnSpec = tuple[str, str]


def table_profile(df: DataFrame, columns: list[ColumnSpec]) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for name, kind in columns:
        aggs.append(F.count(name).alias(f"__nn_{name}"))
        aggs.append(F.countDistinct(name).alias(f"__nd_{name}"))
        if kind == "str":
            aggs.append(F.min(name).alias(f"__min_{name}"))
            aggs.append(F.max(name).alias(f"__max_{name}"))
        else:
            v = F.col(name)
            if kind == "ts":
                # parquet timestamps arrive as TIMESTAMP_NTZ, which has no
                # direct double cast; route via LTZ — the session is pinned
                # UTC, so the epoch value equals DuckDB's epoch(naive-ts)
                v = v.cast("timestamp_ltz")
            v = v.cast("double")
            aggs.append(F.min(v).alias(f"__min_{name}"))
            aggs.append(F.max(v).alias(f"__max_{name}"))
    row = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = []
    for name, kind in columns:
        is_str = kind == "str"
        structs.append(
            F.struct(
                F.lit(name).alias("col_name"),
                F.col("__n_rows").alias("n_rows"),
                (F.col("__n_rows") - F.col(f"__nn_{name}")).alias("n_nulls"),
                F.col(f"__nd_{name}").alias("n_distinct"),
                (null_d if is_str else F.col(f"__min_{name}")).alias("num_min"),
                (null_d if is_str else F.col(f"__max_{name}")).alias("num_max"),
                (F.col(f"__min_{name}") if is_str else null_s).alias("str_min"),
                (F.col(f"__max_{name}") if is_str else null_s).alias("str_max"),
            )
        )
    return row.select(F.inline(F.array(*structs)))


def table_profile_sql(table: str, columns: list[ColumnSpec]) -> str:
    parts = []
    for name, kind in columns:
        if kind == "str":
            num_min = "CAST(NULL AS DOUBLE)"
            num_max = "CAST(NULL AS DOUBLE)"
            str_min = f"min({name})"
            str_max = f"max({name})"
        else:
            expr = f"epoch({name})" if kind == "ts" else f"CAST({name} AS DOUBLE)"
            num_min = f"min({expr})"
            num_max = f"max({expr})"
            str_min = "CAST(NULL AS VARCHAR)"
            str_max = "CAST(NULL AS VARCHAR)"
        parts.append(
            f"SELECT '{name}' AS col_name, count(*) AS n_rows,\n"
            f"       count(*) - count({name}) AS n_nulls,\n"
            f"       count(DISTINCT {name}) AS n_distinct,\n"
            f"       {num_min} AS num_min, {num_max} AS num_max,\n"
            f"       {str_min} AS str_min, {str_max} AS str_max\n"
            f"FROM {table}"
        )
    return "\nUNION ALL\n".join(parts)
