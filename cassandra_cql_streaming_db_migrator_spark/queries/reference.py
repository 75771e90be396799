"""Reference-parity queries (SURVEY §2.1-2.4, §2.10).

One named query per operator family the reference actually executes, each
mapped onto the fixture tables per FIXTURES.md §2 and paired with a DuckDB
oracle.  Citations are to /root/reference source (file:line).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..metrics import conservation_stats
from ..operators.anti_join import if_not_exists_filter
from ..operators.compute import hash_bucket_column
from ..operators.filters import apply_filter_chain, memory_filter, pushdown_filter
from ..operators.limits import top_k
from ..operators.project import column_mapping
from ..operators.counter import counter_merge
from ..operators.ttl import ttl_preserving_columns
from ..pipeline import build_table_plan
from ..plans.spec import FilterDef, TableMigration
from ..sources.parquet import load_table
from . import QueryDef

# ---------------------------------------------------------------------------
# S1/S2 — paged scan with explicit projection (DefaultMigratorPlugin.java:
# 180-220; CassandraSchemaUtil.java:101-107).  Paging == input splits;
# the projection reaches the parquet scan as ReadSchema (column pruning).


def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus"
    )


_SCAN_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
FROM lineitem
"""

# ---------------------------------------------------------------------------
# S4/F1 — pushdown WHERE, passed through verbatim (DMP:207-210).  The
# reference's example predicate shape (key equality + IN + range,
# migration-config.example.yaml:78) is valid Spark SQL as-is.

_PUSHDOWN_WHERE = (
    "o_custkey IN (1, 2, 3, 5, 8, 13, 21, 34, 55, 89) AND o_totalprice >= 1000.0"
)


def filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pushdown_filter(load_table(spark, sf_dir, "orders"), _PUSHDOWN_WHERE)


_FILTER_PUSHDOWN_SQL = f"SELECT * FROM orders WHERE {_PUSHDOWN_WHERE}"

# ---------------------------------------------------------------------------
# F2/F3 — in-memory MVEL filter chain (FieldValueFilter.java:35-89; chain
# loop MigrateTableTask.java:446-451).  MVEL text straight from the example
# config's style (migration-config.example.yaml:95), translated by plans.mvel.


def filter_memory(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "lineitem")
    df = apply_filter_chain(
        df,
        [
            FilterDef("row.l_discount >= 0.03 && row.l_discount < 0.07"),
            FilterDef("row.l_quantity < 30"),
        ],
    )
    return df.select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


_FILTER_MEMORY_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem
WHERE l_discount >= 0.03 AND l_discount < 0.07 AND l_quantity < 30
"""

# ---------------------------------------------------------------------------
# S5/O1/O5 — read limit (DMP:211-214) made deterministic with a total order
# (the reference inherits CQL clustering order; parquet has none, so an
# unordered LIMIT is not a well-defined query).


def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "orders")
    return top_k(df, [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], 100)


_LIMIT_TOPK_SQL = """
SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
"""

# ---------------------------------------------------------------------------
# P3 — calculated column: the shipped hash-bucket example
# (migration-config.example.yaml:105-120): Java String.hashCode -> abs -> %32
# as a small int.  JVM-exact, computed in Catalyst higher-order functions.


def computed_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "customer")
    return df.select(
        "c_custkey", "c_name", hash_bucket_column("c_name", 32).alias("c_name_bucket")
    )


_COMPUTED_COLUMN_SQL = """
WITH h AS (
  SELECT c_custkey, c_name,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(c_name, ''),
                                       c -> CAST(ascii(c) AS BIGINT))),
           (a, b) -> (a * 31 + b) % 4294967296
         ) AS hraw
  FROM customer
)
SELECT c_custkey, c_name,
       CAST(abs(CASE WHEN hraw >= 2147483648 THEN hraw - 4294967296 ELSE hraw END) % 32
            AS INTEGER) AS c_name_bucket
FROM h
"""

# ---------------------------------------------------------------------------
# P1/P2 — column mapping by name, PK first, with drop-and-warn for
# underivable target columns (DMP:239-274).  Target here lacks c_acctbal
# (per FIXTURES.md §2 'schema validation' role) -> it is simply not written.

_CUSTOMER_TARGET = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_mktsegment", T.StringType()),
        T.StructField("c_loyalty_tier", T.StringType()),  # underivable -> dropped+warned
    ]
)


def column_mapping_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "customer")
    mapped, result = column_mapping(df, _CUSTOMER_TARGET, ["c_custkey"])
    assert result.dropped_columns == ["c_loyalty_tier"], result
    return mapped


_COLUMN_MAPPING_SQL = "SELECT c_custkey, c_name, c_nationkey, c_mktsegment FROM customer"

# ---------------------------------------------------------------------------
# J1/K2/F4 — insert-if-not-exists as a left-anti join on the full PK
# (the completed form of IfNotExistFilter.java:49-96; LWT semantics
# DMP:276-292).  Target pre-seeded with the even half of the keys
# (FIXTURES.md §2).  rowsMigrated parity: survivors == applied writes.


def anti_join_if_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    seeded_target = orders.filter(F.expr("o_orderkey % 2 = 0"))
    return if_not_exists_filter(orders, seeded_target, ["o_orderkey"])


_ANTI_JOIN_SQL = """
SELECT o.* FROM orders o
ANTI JOIN (SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0) t
USING (o_orderkey)
"""

# ---------------------------------------------------------------------------
# K3/A1 — counter-table additive merge: keyed SUM with NULL-skip
# (DMP:309-311,426-432).  DECIMAL sum => associative, partitioning-proof.


def counter_merge_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    merged = counter_merge(events, ["user_id", "event_type"], ["value"])
    # The sink consumes the exact DECIMAL delta; the hashed query boundary
    # emits the canonical DOUBLE form (see operators.aggregates docstring).
    return merged.withColumn("value", F.round(F.col("value"), 6).cast("double"))


_COUNTER_MERGE_SQL = """
SELECT user_id, event_type,
       CAST(round(sum(CAST(value AS DECIMAL(28,10))), 6) AS DOUBLE) AS value,
       count(*) AS merged_row_count
FROM events GROUP BY user_id, event_type
"""

# ---------------------------------------------------------------------------
# S3/K4 — TTL probe + TTL-preserving arithmetic (DMP:192-203,360-365).
# Parquet has no TTL, so the probe column is synthesized deterministically
# (row_ttl_value = event_id % source_ttl), exactly the role the connector's
# ttl(col) plays in production.  src TTL 86400, tgt TTL 172800 per
# FIXTURES.md §2.


def ttl_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    probed = events.withColumn("row_ttl_value", (F.col("event_id") % 86400).cast("int"))
    out = ttl_preserving_columns(probed, 86400, 172800)
    return out.select("event_id", "row_ttl_value", "target_ttl")


_TTL_SQL = """
SELECT event_id,
       CAST(event_id % 86400 AS INTEGER) AS row_ttl_value,
       CAST(172800 - (86400 - CAST(event_id % 86400 AS INTEGER)) AS INTEGER) AS target_ttl
FROM events
"""

# ---------------------------------------------------------------------------
# K5/A2 — dry-run conservation stats: rows_read = rows_passed + rows_filtered
# (simulation default TableMigrationDefinition.java:40-48; counters
# MigrateTableTask.java:89-92, report DbMigrator.java:101-106).


def dry_run_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "lineitem")
    passed = memory_filter(df, "row.l_discount >= 0.03 && row.l_discount < 0.07")
    return conservation_stats(df, passed)


_DRY_RUN_SQL = """
SELECT (SELECT count(*) FROM lineitem) AS rows_read,
       (SELECT count(*) FROM lineitem WHERE l_discount >= 0.03 AND l_discount < 0.07) AS rows_passed,
       (SELECT count(*) FROM lineitem)
         - (SELECT count(*) FROM lineitem WHERE l_discount >= 0.03 AND l_discount < 0.07)
         AS rows_filtered
"""

# ---------------------------------------------------------------------------
# Flagship: a whole table-migration pipeline through the spec layer —
# pushdown WHERE + MVEL filter chain + calculated column + column mapping,
# composed exactly as MigrateTableTask.run does (SURVEY §3.2), as ONE
# declarative lineage.

_LINEITEM_TARGET = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("part_bucket", T.LongType()),
    ]
)


def migrate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = TableMigration(
        table_name="lineitem",
        target_table_name="lineitem_v2",
        key_columns=["l_orderkey", "l_linenumber"],
        where_clause="l_quantity >= 5",
        filters=[FilterDef("row.l_discount >= 0.02 && row.l_discount <= 0.08")],
        calculated_columns={"part_bucket": "abs(row.l_partkey * 2654435761) % 64"},
        continue_on_row_error=False,
        simulate_only=True,
    )
    source = load_table(spark, sf_dir, "lineitem")
    target = spark.createDataFrame([], _LINEITEM_TARGET)
    plan, warnings = build_table_plan(spec, source, target)
    assert not warnings, warnings
    return plan


_MIGRATE_PIPELINE_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
       abs(l_partkey * 2654435761) % 64 AS part_bucket
FROM lineitem
WHERE l_quantity >= 5 AND l_discount >= 0.02 AND l_discount <= 0.08
"""


# ---------------------------------------------------------------------------
# Keyset (seek-method) pagination: the reference pages its scans with the
# driver's CQL paging state (MTT:304-345, setPageSize DMP:215-218); the
# analytics-engine twin is the SEEK predicate — resume strictly after the
# last (order key, tiebreak) seen, never OFFSET (which re-reads and
# re-sorts everything before the page).  The composite-key comparison is
# expressed as a row-value predicate Catalyst pushes to the scan, and the
# page is a TakeOrdered — per-page cost is O(page), independent of how
# deep into the table the cursor is.

_PAGE_AFTER = ("1996-06-01 00:00:00", 4000)
_PAGE_SIZE = 100


def keyset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    after_ts, after_key = _PAGE_AFTER
    seek = (F.col("o_orderdate") > F.lit(after_ts).cast("timestamp")) | (
        (F.col("o_orderdate") == F.lit(after_ts).cast("timestamp"))
        & (F.col("o_orderkey") > after_key)
    )
    return (
        orders.where(seek)
        .select("o_orderkey", "o_orderdate", "o_custkey", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(_PAGE_SIZE)
    )


_KEYSET_PAGE_SQL = f"""
SELECT o_orderkey, o_orderdate, o_custkey, o_totalprice
FROM orders
WHERE o_orderdate > TIMESTAMP '{_PAGE_AFTER[0]}'
   OR (o_orderdate = TIMESTAMP '{_PAGE_AFTER[0]}'
       AND o_orderkey > {_PAGE_AFTER[1]})
ORDER BY o_orderdate, o_orderkey
LIMIT {_PAGE_SIZE}
"""


# ---------------------------------------------------------------------------
# Data-contract expectations (plans/expectations.py): the DATA-level
# extension of the reference's plan-time schema validation (DMP:227-269).
# Rules are tuned so clean fixtures yield a MIX of zero and non-zero
# violation counts — an all-zero report would witness nothing.


def data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.expectations import Rule, check_expectations

    tables = {
        "orders": load_table(spark, sf_dir, "orders"),
        "lineitem": load_table(spark, sf_dir, "lineitem"),
        "customer": load_table(spark, sf_dir, "customer"),
    }
    rules = [
        Rule("orders_pk_unique", "orders", "unique",
             {"cols": ["o_orderkey"]}),
        Rule("orders_custkey_not_null", "orders", "not_null",
             {"col": "o_custkey"}),
        Rule("orders_fk_customer", "orders", "foreign_key",
             {"col": "o_custkey", "ref_table": "customer",
              "ref_col": "c_custkey"}),
        Rule("orders_priority_in_3", "orders", "accepted_values",
             {"col": "o_orderpriority",
              "values": ["1-URGENT", "2-HIGH", "3-MEDIUM"]}),
        Rule("orders_at_least_1e9_rows", "orders", "min_rows",
             {"n": 1_000_000_000}),
        Rule("li_discount_in_contract", "lineitem", "in_range",
             {"col": "l_discount", "lo": 0.0, "hi": 0.1}),
        Rule("li_qty_tight_range", "lineitem", "in_range",
             {"col": "l_quantity", "lo": 1.0, "hi": 45.0}),
        Rule("li_orderkey_unique", "lineitem", "unique",
             {"cols": ["l_orderkey"]}),
    ]
    return check_expectations(tables, rules)


_DATA_EXPECTATIONS_SQL = """
SELECT 'orders_fk_customer' AS rule,
       CAST(count(*) AS BIGINT) AS n_violations
FROM orders o
WHERE o.o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'orders_pk_unique',
       CAST(count(*) - count(DISTINCT concat_ws(' ', CAST(o_orderkey AS VARCHAR))) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders_custkey_not_null',
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders_priority_in_3',
       CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
                      AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders_at_least_1e9_rows',
       greatest(CAST(0 AS BIGINT), CAST(1000000000 AS BIGINT) - count(*))
FROM orders
UNION ALL
SELECT 'li_discount_in_contract',
       CAST(sum(CASE WHEN l_discount IS NOT NULL
                      AND (l_discount < 0.0 OR l_discount > 0.1)
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'li_qty_tight_range',
       CAST(sum(CASE WHEN l_quantity IS NOT NULL
                      AND (l_quantity < 1.0 OR l_quantity > 45.0)
                     THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'li_orderkey_unique',
       CAST(count(*) - count(DISTINCT concat_ws(' ', CAST(l_orderkey AS VARCHAR))) AS BIGINT)
FROM lineitem
"""


QUERIES = [
    QueryDef("keyset_page", keyset_page, _KEYSET_PAGE_SQL,
             "S1/S5: keyset (seek-method) pagination — the paged-scan "
             "resume cursor as a pushed row-value predicate + TakeOrdered "
             "(MTT:304-345's paging state, engine-side)"),
    QueryDef("data_expectations", data_expectations, _DATA_EXPECTATIONS_SQL,
             "data-contract validation: declarative rules folded into one "
             "aggregate pass per table + FK anti-joins (DMP:227-269's "
             "data-level extension)"),
    QueryDef("scan_project", scan_project, _SCAN_PROJECT_SQL,
             "S1/S2 paged scan + explicit projection (DMP:180-220)"),
    QueryDef("filter_pushdown", filter_pushdown, _FILTER_PUSHDOWN_SQL,
             "S4/F1 pushdown whereClause passthrough (DMP:207-210)"),
    QueryDef("filter_memory", filter_memory, _FILTER_MEMORY_SQL,
             "F2/F3 MVEL row-set filter chain (FVF:35-89, MTT:446-451)"),
    QueryDef("limit_topk", limit_topk, _LIMIT_TOPK_SQL,
             "S5/O1/O5 deterministic read limit (DMP:211-214)"),
    QueryDef("computed_column", computed_column, _COMPUTED_COLUMN_SQL,
             "P3 calculated column, JVM hashCode bucket (YAML:105-120)"),
    QueryDef("column_mapping", column_mapping_q, _COLUMN_MAPPING_SQL,
             "P1/P2 name-matched mapping, PK-first, drop+warn (DMP:239-274)"),
    QueryDef("anti_join_if_not_exists", anti_join_if_not_exists, _ANTI_JOIN_SQL,
             "J1/K2/F4 left-anti PK existence filter (INEF:49-96, DMP:276-292)"),
    QueryDef("counter_merge", counter_merge_q, _COUNTER_MERGE_SQL,
             "K3/A1 counter additive merge w/ NULL-skip (DMP:309-311,426-432)"),
    QueryDef("ttl_arithmetic", ttl_arithmetic, _TTL_SQL,
             "S3/K4 TTL probe + age-preserving arithmetic (DMP:192-203,360-365)"),
    QueryDef("dry_run_stats", dry_run_stats, _DRY_RUN_SQL,
             "K5/A2 simulation-mode conservation counters (TMD:40-48)"),
    QueryDef("migrate_pipeline", migrate_pipeline, _MIGRATE_PIPELINE_SQL,
             "flagship: full spec-driven migration lineage (SURVEY §3.2)"),
]
