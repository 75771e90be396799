"""Table profiling: the per-column census a migration validates against.

The reference validates schemas structurally before moving rows
(DataMigrationPlan.java's table/column checks); a data-level profile —
row count, null count, exact distinct count, min/max per column — is the
operational twin: run it on source and target and diff the two reports to
certify a migration (or drift-check a CDC mirror) without comparing rows.

Shape: unpivot each row into (col_name, num_val, str_val) with ``inline``
(NARROW, n_cols x rows), then TWO plain hash aggregates:

  1. groupBy(col_name, num_val, str_val) -> per-value count.  Map-side
     partials collapse each partition to its per-column distinct values
     first, so the one real shuffle moves at most sum_c(distinct_c) states;
  2. groupBy(col_name) folds value rows into the profile: n_rows =
     sum(cnt), n_nulls = cnt of the null-value row, n_distinct = count of
     non-null value rows, min/max over the value keys.

Both stages are whole-stage-codegen HashAggregates.  The alternative —
one wide agg with 6 COUNT(DISTINCT col) — plans through Expand into a
SortAggregate with per-column distinct-set buffers (measured 3.5 s vs
0.7 s at sf0.1; and the set buffers, not the data, become the memory
ceiling at scale).  Exactness is the oracle contract; at 100 TB swap in
``approx_count_distinct`` (HLL, single pass, no unpivot) when exact
distincts aren't required.

Numeric parity: numeric values group (and count distinct) through their
DOUBLE image — exact for integers up to 2^53; a 64-bit surrogate-id column
beyond that range should be profiled as kind "str" (lossless, still one
pass).  Float group keys are safe cross-engine: Spark normalizes -0.0/NaN
in grouping keys, and DuckDB's DISTINCT treats -0.0 = 0.0 and NaN = NaN
the same way.  Min/max of numeric and timestamp columns are emitted as
DOUBLE (timestamps via epoch seconds — the session is pinned UTC, so
Spark's ``cast(ts AS double)`` and DuckDB's ``epoch(ts)`` agree); string
min/max as VARCHAR.  No engine-specific number->string formatting is ever
compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# kind: "num" (integer/double), "str" (varchar), "ts" (timestamp)
ColumnSpec = tuple[str, str]


def _value_exprs(name: str, kind: str):
    """(num_val, str_val) typed pair for the unpivot — exactly one is
    populated per column kind."""
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    if kind == "str":
        return null_d, F.col(name).cast("string")
    v = F.col(name)
    if kind == "ts":
        # parquet timestamps arrive as TIMESTAMP_NTZ, which has no direct
        # double cast; route via LTZ — the session is pinned UTC, so the
        # epoch value equals DuckDB's epoch(naive-ts)
        v = v.cast("timestamp_ltz")
    return v.cast("double"), null_s


def table_profile(df: DataFrame, columns: list[ColumnSpec]) -> DataFrame:
    structs = []
    for name, kind in columns:
        num_v, str_v = _value_exprs(name, kind)
        structs.append(
            F.struct(
                F.lit(name).alias("col_name"),
                num_v.alias("num_val"),
                str_v.alias("str_val"),
            )
        )
    long = df.select(F.inline(F.array(*structs)))
    per_value = long.groupBy("col_name", "num_val", "str_val").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    is_null = F.col("num_val").isNull() & F.col("str_val").isNull()
    profiled = per_value.groupBy("col_name").agg(
        F.sum("cnt").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(is_null, F.col("cnt"))), F.lit(0).cast("long")
        ).alias("n_nulls"),
        F.count(F.when(~is_null, F.lit(1))).alias("n_distinct"),
        F.min("num_val").alias("num_min"),
        F.max("num_val").alias("num_max"),
        F.min("str_val").alias("str_min"),
        F.max("str_val").alias("str_max"),
    )
    # Empty-table contract: the oracle's GROUP-BY-less per-column aggregates
    # emit one zero-count row per column even on zero input rows, and a
    # migration-certification diff must read an empty target as n_rows=0,
    # not as missing columns.  Seed every column name and left-join the
    # aggregate onto it (n_cols rows, broadcast — metadata-scale).
    seed = df.sparkSession.createDataFrame(
        [(name,) for name, _ in columns], "col_name string"
    )
    zero = F.lit(0).cast("long")
    return seed.join(F.broadcast(profiled), "col_name", "left").select(
        "col_name",
        F.coalesce("n_rows", zero).alias("n_rows"),
        F.coalesce("n_nulls", zero).alias("n_nulls"),
        F.coalesce("n_distinct", zero).alias("n_distinct"),
        "num_min",
        "num_max",
        "str_min",
        "str_max",
    )


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
            # "+ 0.0" normalizes -0.0 to +0.0 (IEEE: x + 0.0 == x except
            # for -0.0; NaN unchanged), matching Spark's group-key float
            # normalization — min/max otherwise return different zero
            # signs across engines
            num_min = f"min({expr} + 0.0)"
            num_max = f"max({expr} + 0.0)"
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


# ---------------------------------------------------------------------------
# Portable table checksum: order-independent row-content fingerprint.

# Additive checksums fold row digests with +, so the fingerprint is
# partition- and order-independent and MERGEABLE (per-partition / per-day
# checksums sum into the table checksum).  The row digest is md5 over the
# CONCATENATION OF PER-COLUMN md5 DIGESTS (fixed 32-hex fragments; NULL ->
# an out-of-alphabet 32-char tag): no separator exists to inject and a
# value shifting across a NULL column changes its position's fragment, so
# distinct rows cannot collide structurally (plain concat_ws would hash
# ('a|b', 'c') and ('a', 'b|c') — and NULL-shifted rows — identically).
# The first 15 hex chars (60 bits, BIGINT-safe everywhere) fold in
# DECIMAL(38,0)/HUGEINT, reported mod 2^61-1.
CHECKSUM_MOD = (1 << 61) - 1


def _canon_cols_spark(spec: list[tuple[str, str]]) -> list[str]:
    """Canonical string fragments for Spark SQL.  kind: 'int' (exact
    integer cast), 'cents' (double -> exact cents), 'us' (timestamp ->
    epoch micros), 'str' (as-is)."""
    frags = []
    for kind, col in spec:
        if kind == "int":
            frags.append(f"CAST(CAST({col} AS BIGINT) AS STRING)")
        elif kind == "cents":
            frags.append(
                f"CAST(CAST(floor({col} * 100 + 0.5) AS BIGINT) AS STRING)"
            )
        elif kind == "us":
            frags.append(
                f"CAST(unix_micros(CAST({col} AS TIMESTAMP)) AS STRING)"
            )
        else:
            frags.append(col)
    return frags


# A NULL column digests to a fixed 32-char tag that no md5 hex string can
# equal (md5 hex is [0-9a-f]; 'n' is outside the alphabet) — so NULLs are
# position-preserving and unambiguous.
_NULL_DIGEST = "n" * 32


def _digest_row_spark(spec: list[tuple[str, str]]) -> str:
    """Row digest with NO separator ambiguity: each column's canonical
    string is md5-digested individually (fixed 32-hex fragments, NULL ->
    the out-of-alphabet tag), the fragments concatenate positionally, and
    the row digest is md5 of that.  Immune to both concat_ws NULL-skipping
    (a value shifting across a NULL column changes its position's
    fragment) and separator injection ('|' inside a string column) —
    distinct rows cannot collide structurally."""
    frags = ", ".join(
        f"coalesce(md5({c}), '{_NULL_DIGEST}')"
        for c in _canon_cols_spark(spec)
    )
    return f"md5(concat({frags}))"


def _canon_cols_sql(spec: list[tuple[str, str]]) -> list[str]:
    frags = []
    for kind, col in spec:
        if kind == "int":
            frags.append(f"CAST(CAST({col} AS BIGINT) AS VARCHAR)")
        elif kind == "cents":
            frags.append(
                f"CAST(CAST(floor({col} * 100 + 0.5) AS BIGINT) AS VARCHAR)"
            )
        elif kind == "us":
            frags.append(f"CAST(epoch_us({col}) AS VARCHAR)")
        else:
            frags.append(col)
    return frags


def _digest_row_sql(spec: list[tuple[str, str]]) -> str:
    frags = ", ".join(
        f"coalesce(md5({c}), '{_NULL_DIGEST}')"
        for c in _canon_cols_sql(spec)
    )
    return f"md5(concat({frags}))"


def _hex15_to_int_sql(hex_expr: str) -> str:
    """First 15 hex chars -> BIGINT, as a 15-term positional sum (DuckDB
    has no conv(); 16^k literals up to 16^14 and every partial product
    stay under 2^63)."""
    terms = [
        f"CAST(strpos('0123456789abcdef', substr({hex_expr}, {i + 1}, 1))"
        f" - 1 AS BIGINT) * {16 ** (14 - i)}"
        for i in range(15)
    ]
    return "(" + " + ".join(terms) + ")"


def table_checksum(
    df: "DataFrame", table_name: str, spec: list[tuple[str, str]]
) -> "DataFrame":
    """(table_name, n_rows, checksum) — run on source and target, diff the
    two 1-row reports to certify a migration without comparing rows.  The
    reference's certification story stops at schema validation
    (DataMigrationPlan.java:227-269) and row counts; this is the
    content-level analog, embarrassingly parallel (no shuffle: a global
    1-row aggregate with map-side partials)."""
    row_val = (
        f"CAST(conv(substr({_digest_row_spark(spec)}, 1, 15), 16, 10)"
        " AS BIGINT)"
    )
    return (
        df.selectExpr(f"{row_val} AS __v")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(
                f"CAST(CAST(sum(CAST(__v AS DECIMAL(38,0))) % {CHECKSUM_MOD}"
                " AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("checksum"),
        )
        .select(
            F.lit(table_name).alias("table_name"), "n_rows", "checksum"
        )
    )


def table_checksum_sql(
    table: str, spec: list[tuple[str, str]], include_name: bool = True
) -> str:
    """Oracle twin.  ``include_name=False`` drops the table_name column —
    for streaming twins whose aggregate carries no literal column."""
    row_val = _hex15_to_int_sql(_digest_row_sql(spec))
    name_col = f"'{table}' AS table_name,\n       " if include_name else ""
    return f"""
SELECT {name_col}count(*) AS n_rows,
       CAST(sum(CAST({row_val} AS HUGEINT)) % {CHECKSUM_MOD} AS BIGINT)
         AS checksum
FROM {table}
"""
