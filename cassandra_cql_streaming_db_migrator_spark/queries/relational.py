"""Spark-native relational extensions (SURVEY §2.5 J2, §2.6 A4, §2.7 O5-O7).

The reference implements none of these (single-table pipelines only); they
are the capability superset the engine exposes because migration +
enrichment generalizes to full relational analytics.  Numeric discipline per
queries/__init__ (decimal sums, stable averages, total orders on limits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.aggregates import cube_agg, decimal_sum, grouped, rollup_agg, stable_avg
from ..operators.joins import (
    asof_join,
    broadcast_dim_join,
    interval_join_broadcast,
    salted_join,
    semi_join,
)
from ..operators.setops import (
    except_all,
    except_distinct,
    intersect,
    intersect_all,
    union_distinct,
)
from ..operators.windows import lag_lead, running_agg, top_k_per_group
from ..sources.parquet import load_table
from . import QueryDef

# ---------------------------------------------------------------------------
# TPC-H Q1-style pricing summary: the canonical wide-agg benchmark shape
# (groupBy 2 cols, many aggs) — map-side partial agg, one shuffle of states.


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return grouped(
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02")),
        ["l_returnflag", "l_linestatus"],
        [
            decimal_sum("l_quantity", "sum_qty"),
            decimal_sum("l_extendedprice", "sum_base_price"),
            decimal_sum(disc_price, "sum_disc_price"),
            decimal_sum(charge, "sum_charge"),
            stable_avg("l_quantity", "avg_qty"),
            stable_avg("l_extendedprice", "avg_price"),
            stable_avg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        ],
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) / count(*), 6) AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) / count(*), 6) AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(28,10))) AS DOUBLE) / count(*), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

# ---------------------------------------------------------------------------
# Broadcast dimension join chain: customer -> nation -> region.  The fact
# side never shuffles; both dims ride to every task.


def join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    enriched = broadcast_dim_join(
        customer, nation, on=customer.c_nationkey == nation.n_nationkey
    )
    enriched = broadcast_dim_join(enriched, region, on=enriched.n_regionkey == region.r_regionkey)
    return grouped(
        enriched,
        ["r_name"],
        [F.count(F.lit(1)).alias("n_custs"), decimal_sum("c_acctbal", "sum_acctbal")],
    )


_JOIN_ENRICH_SQL = """
SELECT r_name, count(*) AS n_custs,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

# ---------------------------------------------------------------------------
# Fact-fact join: orders x lineitem revenue per priority.  AQE decides the
# physical join and splits skew; revenue in exact decimal.


def join_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = orders.join(li, orders.o_orderkey == li.l_orderkey)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return grouped(
        joined,
        ["o_orderpriority"],
        [
            decimal_sum(revenue, "revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_items"),
        ],
    )


_JOIN_LARGE_SQL = """
SELECT o_orderpriority,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue,
       count(DISTINCT o_orderkey) AS n_orders,
       count(*) AS n_items
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""

# ---------------------------------------------------------------------------
# Semi join (EXISTS): customers having at least one open order.


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    open_orders = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    with_open = semi_join(customer, open_orders, on=customer.c_custkey == open_orders.o_custkey)
    return grouped(with_open, ["c_mktsegment"], [F.count(F.lit(1)).alias("n_custs")])


_JOIN_SEMI_SQL = """
SELECT c_mktsegment, count(*) AS n_custs
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
GROUP BY c_mktsegment
"""

# ---------------------------------------------------------------------------
# Window: top-3 orders per customer (WindowGroupLimit keeps the shuffle to
# k rows per group), and a running sum within each order.


def window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    top = top_k_per_group(
        orders,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        3,
    )
    return top.select("o_custkey", "o_orderkey", "o_totalprice", "rn")


_WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders) WHERE rn <= 3
"""


def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    # (l_orderkey, l_linenumber) is NOT unique in the fixtures, so the sort
    # must be total for the running frame to be well-defined: extra keys
    # break ties, and the summed column is among them so fully-tied rows
    # contribute identical running values under any permutation.
    li = load_table(spark, sf_dir, "lineitem")
    order = [
        F.col("l_linenumber").asc(),
        F.col("l_quantity").asc(),
        F.col("l_extendedprice").asc(),
        F.col("l_partkey").asc(),
        F.col("l_suppkey").asc(),
    ]
    out = running_agg(
        li,
        ["l_orderkey"],
        order,
        F.sum(F.col("l_quantity").cast("decimal(28,10)")),
        "running_qty",
    )
    # Canonical DOUBLE at the output boundary (exact decimal inside the frame).
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("running_qty"), 6).cast("double").alias("running_qty"),
    )


_WINDOW_RUNNING_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(28,10)))
         OVER (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_quantity, l_extendedprice, l_partkey, l_suppkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS DOUBLE) AS running_qty
FROM lineitem
"""

# ---------------------------------------------------------------------------
# ROLLUP with grouping indicators.


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return rollup_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        [decimal_sum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n_rows")],
    )


_AGG_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_qty,
       count(*) AS n_rows,
       CAST(grouping(l_returnflag) AS INTEGER) AS grouping_l_returnflag,
       CAST(grouping(l_linestatus) AS INTEGER) AS grouping_l_linestatus
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""

# ---------------------------------------------------------------------------
# Exact distinct aggregation (Catalyst expands to a two-phase plan).


def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return grouped(
        orders,
        ["o_orderstatus"],
        [
            F.countDistinct("o_custkey").alias("n_custs"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.count(F.lit(1)).alias("n_orders"),
        ],
    )


_DISTINCT_AGG_SQL = """
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_custs,
       count(DISTINCT o_orderpriority) AS n_priorities,
       count(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""

# ---------------------------------------------------------------------------
# Set ops in SQL (distinct) semantics.


def _custkeys(spark, sf_dir, status):
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == status)
        .select("o_custkey")
    )


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return except_distinct(_custkeys(spark, sf_dir, "O"), _custkeys(spark, sf_dir, "F"))


_SET_EXCEPT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    return union_distinct(_custkeys(spark, sf_dir, "O"), _custkeys(spark, sf_dir, "P"))


_SET_UNION_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
UNION
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
"""


def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return except_all(_custkeys(spark, sf_dir, "O"), _custkeys(spark, sf_dir, "F"))


_SET_EXCEPT_ALL_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return intersect_all(_custkeys(spark, sf_dir, "O"), _custkeys(spark, sf_dir, "F"))


_SET_INTERSECT_ALL_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return intersect(_custkeys(spark, sf_dir, "O"), _custkeys(spark, sf_dir, "F"))


_SET_INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


# ---------------------------------------------------------------------------
# CUBE: every grouping-set combination in one pass (Expand + single shuffle).


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return cube_agg(
        orders,
        ["o_orderstatus", "o_orderpriority"],
        [decimal_sum("o_totalprice", "sum_price"), F.count(F.lit(1)).alias("n_orders")],
    )


_AGG_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_price,
       count(*) AS n_orders,
       CAST(grouping(o_orderstatus) AS INTEGER) AS grouping_o_orderstatus,
       CAST(grouping(o_orderpriority) AS INTEGER) AS grouping_o_orderpriority
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""

# ---------------------------------------------------------------------------
# Analytic lag/lead: previous/next event value per user, total order by
# (ts, event_id) so the offsets are well-defined.


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    out = lag_lead(
        events,
        ["user_id"],
        [F.col("ts").asc(), F.col("event_id").asc()],
        "value",
    )
    return out.select("user_id", "event_id", "value", "value_lag", "value_lead")


_WINDOW_LAG_LEAD_SQL = """
SELECT user_id, event_id, value,
       lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS value_lag,
       lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS value_lead
FROM events
"""

# ---------------------------------------------------------------------------
# Analytic window-function family: rank/distribution/frame-edge functions in
# one pass over one window definition (one shuffle on the partition key).


def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderstatus",
        "o_orderkey",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_totalprice").over(w).alias("min_price_so_far"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


_WINDOW_ANALYTICS_SQL = """
SELECT o_orderstatus, o_orderkey, o_totalprice,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       first_value(o_totalprice) OVER w AS min_price_so_far,
       CAST(rank() OVER w AS INTEGER) AS rnk,
       CAST(dense_rank() OVER w AS INTEGER) AS drnk
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC)
"""

# ---------------------------------------------------------------------------
# As-of join: for every click, the most recent error by the same user at or
# before it (union + ordered window — one shuffle, no candidate-pair
# blow-up; see operators.joins.asof_join).


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("last_err_ts")
    )
    out = asof_join(
        clicks,
        errors,
        keys=["user_id"],
        left_ts="ts",
        right_ts="last_err_ts",
        payload_cols=["last_err_ts"],
    )
    return out.select("user_id", "event_id", "ts", "last_err_ts")


_JOIN_ASOF_SQL = """
WITH u AS (
  SELECT user_id, ts, event_id, CAST(NULL AS TIMESTAMP) AS err_ts, 1 AS side
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, NULL, ts, 0 FROM events WHERE event_type = 'error'
), w AS (
  SELECT user_id, event_id, ts, side,
         max(err_ts) OVER (PARTITION BY user_id ORDER BY ts, side
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_err_ts
  FROM u)
SELECT user_id, event_id, ts, last_err_ts FROM w WHERE side = 1
"""

def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-frame window semantics pinned across engines:
    first_value / last_value / nth_value(2) over ROWS BETWEEN 2 PRECEDING
    AND 1 FOLLOWING, per user in (ts, event_id) total order — the frame-
    boundary behaviors (partial frames at partition edges, nth beyond the
    frame -> NULL) that silently differ between naive implementations.
    One shuffle on the user key; values in exact cents."""
    events = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    base = events.select(
        "user_id", "ts", "event_id", cents.alias("c")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, 1)
    )
    return base.select(
        "user_id",
        "event_id",
        F.first("c").over(w).alias("frame_first"),
        F.last("c").over(w).alias("frame_last"),
        F.nth_value("c", 2).over(w).alias("frame_second"),
    )


_WINDOW_FRAMES_SQL = """
SELECT user_id, event_id,
       first_value(c) OVER w AS frame_first,
       last_value(c) OVER w AS frame_last,
       nth_value(c, 2) OVER w AS frame_second
FROM (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
)
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING)
"""


def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS BOUND (pandas merge_asof's tolerance):
    each click gets its user's most recent prior error ONLY if it is at
    most 30 minutes old — older matches are rejected to NULL, the
    freshness contract every feature-store point-in-time lookup carries.
    Same union+window linear plan as join_asof (no candidate-pair
    blow-up); the bound is one comparison on the carried timestamp."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("last_err_ts")
    )
    out = asof_join(
        clicks,
        errors,
        keys=["user_id"],
        left_ts="ts",
        right_ts="last_err_ts",
        payload_cols=["last_err_ts"],
    )
    tol_us = 30 * 60 * 1_000_000
    fresh = F.when(
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.unix_micros(F.col("last_err_ts").cast("timestamp"))
        <= tol_us,
        F.col("last_err_ts"),
    )
    return out.select(
        "user_id", "event_id", "ts", fresh.alias("recent_err_ts")
    )


_JOIN_ASOF_TOLERANCE_SQL = """
WITH u AS (
  SELECT user_id, ts, event_id, CAST(NULL AS TIMESTAMP) AS err_ts, 1 AS side
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, NULL, ts, 0 FROM events WHERE event_type = 'error'
), w AS (
  SELECT user_id, event_id, ts, side,
         max(err_ts) OVER (PARTITION BY user_id ORDER BY ts, side
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_err_ts
  FROM u)
SELECT user_id, event_id, ts,
       CASE WHEN epoch_us(ts) - epoch_us(last_err_ts) <= 1800000000
            THEN last_err_ts END AS recent_err_ts
FROM w WHERE side = 1
"""


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS (the general form of rollup/cube): status-only,
# priority-only, and grand-total groups in one Expand + single shuffle.


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gsets")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,10))), 2) AS DOUBLE)
                 AS sum_price,
               count(*) AS n_orders,
               CAST(grouping(o_orderstatus) AS INT) AS grouping_o_orderstatus,
               CAST(grouping(o_orderpriority) AS INT) AS grouping_o_orderpriority
        FROM orders_gsets
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


_AGG_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_price,
       count(*) AS n_orders,
       CAST(grouping(o_orderstatus) AS INTEGER) AS grouping_o_orderstatus,
       CAST(grouping(o_orderpriority) AS INTEGER) AS grouping_o_orderpriority
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""

# ---------------------------------------------------------------------------
# Exact interpolated percentiles (Spark `percentile` == SQL
# percentile_cont: h = (n-1)p linear interpolation in double).


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return grouped(
        orders,
        ["o_orderstatus"],
        [
            F.expr("percentile(o_totalprice, 0.5)").alias("p50_price"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90_price"),
            F.count(F.lit(1)).alias("n_orders"),
        ],
    )


_AGG_PERCENTILES_SQL = """
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS p50_price,
       quantile_cont(o_totalprice, 0.9) AS p90_price,
       count(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""

# ---------------------------------------------------------------------------
# Hypertable-style time rollup: one pass produces hourly AND daily buckets
# via GROUPING SETS over truncated timestamps (Expand + single shuffle),
# the batch form of a continuous aggregate / materialized rollup.


# ---------------------------------------------------------------------------
# Contribution / ABC (Pareto) classification: per-nation revenue share and
# cumulative share in exact ppm fixed point, classed A (first 80% of
# revenue), B (to 95%), C (rest).  Revenue quantized to cents (exact
# decimal) so every share and the running total are pure integers — the
# window runs over the nation-level rollup (dimension-sized, metadata).


def revenue_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    per_nation = joined.groupBy("n_name").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                "decimal(38,0)"
            )
        )
        .cast("long")
        .alias("rev_cents")
    )
    wtot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wcum = Window.orderBy(F.desc("rev_cents"), "n_name").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = per_nation.select(
        "n_name",
        "rev_cents",
        F.sum("rev_cents").over(wtot).alias("__tot"),
        F.sum("rev_cents").over(wcum).alias("__cum"),
    )
    # ppm step widened to decimal(38,0): 1e6 * cum already hits 3.75e18 at
    # sf0.1 (int64 max 9.2e18) and overflows around sf~0.25.  DIV over
    # decimals still returns long, so the output schema is unchanged.
    share = "1000000 * CAST(rev_cents AS DECIMAL(38,0)) DIV __tot"
    cum = "1000000 * CAST(__cum AS DECIMAL(38,0)) DIV __tot"
    return ranked.select(
        "n_name",
        "rev_cents",
        F.expr(share).alias("share_ppm"),
        F.expr(cum).alias("cum_share_ppm"),
        F.when(F.expr(cum) <= 800000, "A")
        .when(F.expr(cum) <= 950000, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


_REVENUE_PARETO_SQL = """
WITH per_nation AS (
  SELECT n_name,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS HUGEINT)) AS BIGINT)
           AS rev_cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
),
ranked AS (
  SELECT n_name, rev_cents,
         CAST(sum(rev_cents) OVER () AS BIGINT) AS tot,
         CAST(sum(rev_cents) OVER (
           ORDER BY rev_cents DESC, n_name
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM per_nation
)
SELECT n_name, rev_cents,
       CAST(1000000 * CAST(rev_cents AS HUGEINT) // tot AS BIGINT)
         AS share_ppm,
       CAST(1000000 * CAST(cum AS HUGEINT) // tot AS BIGINT)
         AS cum_share_ppm,
       CASE WHEN 1000000 * CAST(cum AS HUGEINT) // tot <= 800000 THEN 'A'
            WHEN 1000000 * CAST(cum AS HUGEINT) // tot <= 950000 THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
"""


# ---------------------------------------------------------------------------
# Gini concentration per nation: order-value inequality from the sorted-
# rank identity G = (2*Sum(i*x_i) - (n+1)*Sum(x)) / (n*Sum(x)), all in
# cent-quantized integers summed as decimal(38,0) -> exact ppm.  Rank
# ties permute only within equal x, and the identity is invariant under
# that, so row_number's nondeterminism across engines cannot change the
# result.  One rank window + one aggregate, both on the nation key.


def gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    base = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_nationkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    w = Window.partitionBy("c_nationkey").orderBy("cents")
    ranked = base.withColumn("i", F.row_number().over(w).cast("long"))
    # The moment sums are decimal(38,0) from the start: i*cents reaches
    # ~1.2e11/row at just 6k rows/group with cent-quantized TPC-H totals,
    # and the 1e6 ppm multiply pushes the numerator past int64 (9.2e18)
    # around sf0.01 already (~4.6e18 there, ~3.5e20 at sf0.1).  decimal
    # sums are exact to ~1e10 rows/group at cent scale (numerator < 1e38);
    # DIV over decimals returns long, so the output schema is unchanged.
    g = ranked.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"),
        F.sum(
            F.col("i").cast("decimal(19,0)") * F.col("cents")
        ).alias("t"),
    )
    return g.select(
        "c_nationkey",
        "n",
        F.expr(
            "1000000 * (2 * t - (n + 1) * s) DIV (n * s)"
        ).alias("gini_ppm"),
    )


_GINI_SQL = """
WITH base AS (
  SELECT c_nationkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
),
ranked AS (
  SELECT c_nationkey, cents,
         CAST(row_number() OVER (
           PARTITION BY c_nationkey ORDER BY cents) AS BIGINT) AS i
  FROM base
),
g AS (
  SELECT c_nationkey, count(*) AS n,
         sum(CAST(cents AS HUGEINT)) AS s,
         sum(CAST(i AS HUGEINT) * cents) AS t
  FROM ranked GROUP BY c_nationkey
)
SELECT c_nationkey, n,
       CAST(1000000 * (2 * t - (n + 1) * s) // (n * s) AS BIGINT)
         AS gini_ppm
FROM g
"""


# ---------------------------------------------------------------------------
# Event-transition census: the Markov matrix of consecutive event types
# per user (lag window), with per-source-state transition probabilities
# in exact ppm.  One shuffle on the user key; the probability join runs
# on the state-vocabulary-sized census.


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.lag("event_type").over(w).alias("src"),
            F.col("event_type").alias("dst"),
        )
        .where(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wsrc = Window.partitionBy("src")
    return (
        pairs.withColumn("__srctot", F.sum("n").over(wsrc))
        .select(
            "src",
            "dst",
            "n",
            F.expr("1000000 * n DIV __srctot").alias("p_ppm"),
        )
    )


_EVENT_TRANSITIONS_SQL = """
WITH pairs AS (
  SELECT lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
census AS (
  SELECT src, dst, count(*) AS n FROM pairs WHERE src IS NOT NULL
  GROUP BY src, dst
)
SELECT src, dst, n,
       1000000 * n // CAST(sum(n) OVER (PARTITION BY src) AS BIGINT) AS p_ppm
FROM census
"""


# deterministic one-char-deletion corruption shared by fuzzy_key_match and
# entity_resolution (position keyed off the row id, inside the numeric tail)
_FUZZY_CORRUPT = (
    "concat(substring({name}, 1, 10 + CAST({key} % 8 AS INT) - 1), "
    "substring({name}, 10 + CAST({key} % 8 AS INT) + 1, length({name})))"
)


# ---------------------------------------------------------------------------
# Entity resolution: a "dirty registry" (every 4th customer re-registered
# under a corrupted name and a shifted id) resolved back into entities —
# fuzzy match edges (FastSS blocking folded with the nation attribute)
# -> connected components -> per-record entity assignment.  The full
# MDM/migration composition: fuzzy_key_join + connected_components.


def entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components
    from ..operators.joins import fuzzy_key_join

    cust = load_table(spark, sf_dir, "customer")
    clean = cust.select(
        F.col("c_custkey").alias("rid"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
    )
    dirty = cust.filter(F.col("c_custkey") % 4 == 0).select(
        (F.col("c_custkey") + 1000000).alias("rid"),
        F.expr(
            _FUZZY_CORRUPT.format(name="c_name", key="c_custkey")
        ).alias("name"),
        F.col("c_nationkey").alias("nat"),
    )
    # edges run dirty->MASTER only (the incoming-records-vs-master ER
    # semantic): master-to-master near-names are not duplicate evidence,
    # and excluding them keeps components star-shaped (diameter <= 4 via
    # ambiguous dirty records) instead of digit-neighbor chains — the
    # min-label loop converges in a handful of rounds regardless of scale
    a = clean.select(
        F.col("rid").alias("rid_a"), F.col("name").alias("name_a"), "nat"
    )
    b = dirty.select(
        F.col("rid").alias("rid_b"), F.col("name").alias("name_b"), "nat"
    )
    pairs = fuzzy_key_join(a, b, "name_a", "name_b", extra_on=["nat"])
    comps = connected_components(pairs, "rid_a", "rid_b", id_col="rid")
    return comps.select(
        "rid",
        F.col("component_id").alias("entity_id"),
        F.col("comp_size").cast("long").alias("entity_size"),
    )


_ENTITY_RESOLUTION_SQL = f"""
WITH RECURSIVE reg AS (
  SELECT c_custkey AS rid, c_name AS name, c_nationkey AS nat FROM customer
  UNION ALL
  SELECT c_custkey + 1000000,
         {_FUZZY_CORRUPT.format(name="c_name", key="c_custkey")},
         c_nationkey
  FROM customer WHERE c_custkey % 4 = 0
),
p AS (
  SELECT a.rid AS r1, b.rid AS r2 FROM reg a JOIN reg b
  ON a.rid < 1000000 AND b.rid >= 1000000 AND a.nat = b.nat
     AND levenshtein(a.name, b.name) <= 1
),
edges AS (SELECT r1 AS a, r2 AS b FROM p UNION SELECT r2, r1 FROM p),
reach AS (
  SELECT a AS node, a AS peer FROM edges
  UNION
  SELECT r.node, e.b FROM reach r JOIN edges e ON r.peer = e.a
),
comp AS (SELECT node AS rid, min(peer) AS entity_id FROM reach GROUP BY node),
sizes AS (SELECT entity_id, count(*) AS entity_size FROM comp GROUP BY entity_id)
SELECT c.rid, c.entity_id, CAST(s.entity_size AS BIGINT) AS entity_size
FROM comp c JOIN sizes s USING (entity_id)
"""


# ---------------------------------------------------------------------------
# Skyline / Pareto frontier: per-part (cheapest price, biggest quantity)
# points; the frontier is every part no other part beats on both axes.
# The ORACLE is the quadratic NOT EXISTS dominance definition, so a
# driver pass proves the level-table algorithm drops nothing.


def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import skyline_2d

    li = load_table(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("price"),
        F.sum("l_quantity").cast("long").alias("qty"),
    )
    return skyline_2d(stats, "price", "qty")


_SKYLINE_SQL = """
WITH stats AS (
  SELECT l_partkey, min(l_extendedprice) AS price,
         CAST(sum(l_quantity) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1
)
SELECT qty, price, count(*) AS n_points
FROM stats a
WHERE NOT EXISTS (
  SELECT 1 FROM stats b
  WHERE b.price <= a.price AND b.qty >= a.qty
    AND (b.price < a.price OR b.qty > a.qty)
)
GROUP BY qty, price
"""


# ---------------------------------------------------------------------------
# NULL-semantics exercise: deterministic NULL injection, then every
# NULL-sensitive aggregate shape in one pass — count(*) vs count(col),
# explicit null census, sum/min/max/bool_or skipping NULLs, and the NULL
# group key forming its own group.  Engines disagree on these silently
# (that's why the registry's oracle rules exist); this query pins them.


def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.expr("nullif(CAST(o_custkey % 7 AS INT), 0)").alias("k"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None)).otherwise(
            F.col("o_totalprice")
        ).alias("v"),
    )
    return base.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_vals"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).cast("long").alias("n_null"),
        F.round(F.sum(F.col("v").cast("decimal(28,10)")), 2)
        .cast("double")
        .alias("sum_v"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
        F.bool_or(F.col("v") > 5000.0).alias("any_over_5k"),
    )


_NULL_SEMANTICS_SQL = """
WITH base AS (
  SELECT nullif(CAST(o_custkey % 7 AS INTEGER), 0) AS k,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS v
  FROM orders
)
SELECT k,
       count(*) AS n_rows,
       count(v) AS n_vals,
       CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(round(sum(CAST(v AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_v,
       min(v) AS min_v,
       max(v) AS max_v,
       bool_or(v > 5000.0) AS any_over_5k
FROM base GROUP BY k
"""


# ---------------------------------------------------------------------------
# Batch sliding windows via F.window(slide): each event lands in the 6
# hour-aligned windows covering it (Spark explodes window copies inside the
# Expand operator, then one hash aggregate).  countDistinct inside
# overlapping windows is the exact form of the streaming sliding sketch
# (stream_kmv approximates the same shape with O(k) state).


def sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    win = F.window(F.col("ts").cast("timestamp"), "6 hours", "1 hour")
    return (
        events.groupBy(win.alias("w"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"), "n_users", "n_events"
        )
    )


_SLIDING_DISTINCT_SQL = """
WITH w AS (
  SELECT user_id,
         unnest(generate_series(date_trunc('hour', ts) - INTERVAL 5 HOUR,
                                date_trunc('hour', ts),
                                INTERVAL 1 HOUR)) AS window_start
  FROM events
)
SELECT window_start,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events
FROM w GROUP BY window_start
"""


def time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bucketed = events.select(
        F.date_trunc("hour", F.col("ts")).alias("bucket_hour"),
        F.date_trunc("day", F.col("ts")).alias("bucket_day"),
        "event_type",
        "value",
    )
    bucketed.createOrReplaceTempView("events_buckets")
    return spark.sql(
        """
        SELECT bucket_hour, bucket_day, event_type,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE)
                 AS sum_value,
               CAST(grouping(bucket_hour) AS INT) AS grouping_bucket_hour
        FROM events_buckets
        GROUP BY GROUPING SETS ((bucket_hour, event_type), (bucket_day, event_type))
        """
    )


_TIME_ROLLUP_SQL = """
SELECT bucket_hour, bucket_day, event_type,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_value,
       CAST(grouping(bucket_hour) AS INTEGER) AS grouping_bucket_hour
FROM (SELECT date_trunc('hour', ts) AS bucket_hour,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
             event_type, value
      FROM events)
GROUP BY GROUPING SETS ((bucket_hour, event_type), (bucket_day, event_type))
"""

# ---------------------------------------------------------------------------
# Interval containment join: events binned into value tiers via a broadcast
# nested-loop against the (tiny) tier table.


def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # JVM-side literal table (createDataFrame would round-trip a Python RDD)
    tiers = spark.sql(
        "SELECT tier, CAST(lo AS DOUBLE) lo, CAST(hi AS DOUBLE) hi FROM VALUES "
        "('low', 0.0, 50.0), ('mid', 50.0, 150.0), ('high', 150.0, 300.0), "
        "('extreme', 300.0, 1e12) AS t(tier, lo, hi)"
    )
    joined = interval_join_broadcast(events, tiers, "value", "lo", "hi")
    return grouped(
        joined,
        ["tier"],
        [F.count(F.lit(1)).alias("n_events"), decimal_sum("value", "sum_value")],
    )


_JOIN_RANGE_SQL = """
SELECT tier, count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_value
FROM events
JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0), ('high', 150.0, 300.0),
             ('extreme', 300.0, 1e12)) AS t(tier, lo, hi)
  ON value >= lo AND value < hi
GROUP BY tier
"""


# ---------------------------------------------------------------------------
# PIVOT: long -> wide aggregation (explicit value list so the output schema
# is static — dynamic pivots need a values scan first).


def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority",
               ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
        .agg(decimal_sum("o_totalprice", "s"))
    )
    return pivoted.select(
        "o_orderstatus",
        F.col("1-URGENT").alias("urgent"),
        F.col("2-HIGH").alias("high"),
        F.col("3-MEDIUM").alias("medium"),
        F.col("4-NOT SPECIFIED").alias("not_specified"),
        F.col("5-LOW").alias("low"),
    )


_AGG_PIVOT_SQL = """
SELECT o_orderstatus,
       CAST(round(sum(CASE WHEN o_orderpriority = '1-URGENT'
                THEN CAST(o_totalprice AS DECIMAL(28,10)) END), 2) AS DOUBLE) AS urgent,
       CAST(round(sum(CASE WHEN o_orderpriority = '2-HIGH'
                THEN CAST(o_totalprice AS DECIMAL(28,10)) END), 2) AS DOUBLE) AS high,
       CAST(round(sum(CASE WHEN o_orderpriority = '3-MEDIUM'
                THEN CAST(o_totalprice AS DECIMAL(28,10)) END), 2) AS DOUBLE) AS medium,
       CAST(round(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                THEN CAST(o_totalprice AS DECIMAL(28,10)) END), 2) AS DOUBLE) AS not_specified,
       CAST(round(sum(CASE WHEN o_orderpriority = '5-LOW'
                THEN CAST(o_totalprice AS DECIMAL(28,10)) END), 2) AS DOUBLE) AS low
FROM orders GROUP BY o_orderstatus
"""

# ---------------------------------------------------------------------------
# Correlated scalar subquery — Catalyst decorrelates into a join+agg plan;
# the user writes the intent, the optimizer picks the dataflow.


def correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # "price > 2 * customer's avg" with the avg's division multiplied
    # through (price*n > 2*sum): a float avg's low bits depend on
    # summation order, and a threshold predicate would flip boundary rows
    # between engines — decimal sum * count is exact on both.
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_corr")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_corr o
        WHERE CAST(o_totalprice AS DECIMAL(28,10))
                * (SELECT count(*) FROM orders_corr i
                   WHERE i.o_custkey = o.o_custkey)
              > 2 * (SELECT sum(CAST(o_totalprice AS DECIMAL(28,10)))
                     FROM orders_corr i WHERE i.o_custkey = o.o_custkey)
        """
    )


_CORRELATED_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE CAST(o_totalprice AS DECIMAL(28,10))
        * (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
      > 2 * (SELECT sum(CAST(o_totalprice AS DECIMAL(28,10)))
             FROM orders i WHERE i.o_custkey = o.o_custkey)
"""

# ---------------------------------------------------------------------------
# JSON extraction from the semi-structured props column.


def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return grouped(
        events.select("event_type", k.alias("k_val")),
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k_val").alias("sum_k"),
            F.max("k_val").alias("max_k"),
        ],
    )


_JSON_EXTRACT_SQL = """
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# TPC-H Q3-style shipping priority: the canonical 3-way join + aggregate +
# top-k shape.  customer (filtered on segment) broadcasts onto orders;
# orders x lineitem is the one real shuffle; the top-10 is
# TakeOrderedAndProject (never a full sort).


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-06-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-06-15").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(decimal_sum(revenue, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


_Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-15'
  AND l_shipdate > TIMESTAMP '1998-06-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# TPC-H Q5-shape: 6-table star join (two facts + four dims) with a date
# window, revenue per region x nation.  The canonical join-ordering /
# broadcast showcase: nation and region ride to every task; customer and
# supplier are key-shuffled hash joins AQE may demote to broadcast at small
# scale; the date filter pushes to the orders scan.  The c_nationkey =
# s_nationkey equi-condition ("local supplier") rides the supplier join.


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return grouped(
        joined,
        ["r_name", "n_name"],
        [decimal_sum(revenue, "revenue"), F.count(F.lit(1)).alias("n_items")],
    )


_Q5_SQL = """
SELECT r_name, n_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY r_name, n_name
"""

# ---------------------------------------------------------------------------
# TPC-H Q18-shape: aggregate-then-join ("large volume orders").  The HAVING
# on a fact aggregate becomes a derived table joined back to the facts —
# the filter side is the SMALL side after aggregation, so AQE broadcasts it
# into orders/customer; one lineitem shuffle total.


def q18_top_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(decimal_sum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.col("sum_qty").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


_Q18_SQL = """
WITH big AS (
  SELECT l_orderkey,
         CAST(round(sum(CAST(l_quantity AS DECIMAL(28,10))), 2) AS DOUBLE)
           AS sum_qty
  FROM lineitem GROUP BY l_orderkey
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE sum_qty > 250
ORDER BY sum_qty DESC, o_orderkey ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# TPC-H Q7-shape: bilateral "volume shipping" between two nations.  The
# nation dimension is broadcast TWICE under different roles (supplier
# nation / customer nation) — the classic alias-join shape; the nation-pair
# predicate prunes at the broadcast join, so only matching facts reach the
# final aggregate's shuffle.  One lineitem-orders shuffle pair; everything
# else broadcasts (supplier/customer are broadcast-eligible dims at any SF
# where they fit; at 100 TB AQE decides from runtime sizes).


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_7")
            )
            | (
                (F.col("supp_nation") == "NATION_7")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
    )
    return grouped(
        joined.withColumn("l_year", F.year("l_shipdate").cast("long")),
        ["supp_nation", "cust_nation", "l_year"],
        [decimal_sum(revenue, "revenue"), F.count(F.lit(1)).alias("n_items")],
    )


_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# TPC-H Q15-shape: "top supplier(s)" — a derived revenue view joined against
# its own maximum.  The max is a 1-row aggregate of the (already small)
# per-supplier view, so the second pass is a broadcast of one scalar, not a
# re-scan of the facts: fact shuffle happens ONCE, the view is reused for
# both the max and the final filter (Catalyst collapses the shared subplan
# under ReusedExchange when the view is materialized by the same job).


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.groupBy("l_suppkey").agg(
            decimal_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "total_revenue",
            )
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("__mx"))
    return (
        revenue.join(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("__mx"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey"), F.col("s_name"), F.col("total_revenue")
        )
    )


_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(28,10))), 2) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-07-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


# ---------------------------------------------------------------------------
# Salted join under the value gate: the skew-mitigation pattern (split a hot
# key across ``salt`` sub-partitions, replicate the other side) must be
# VALUE-NEUTRAL — the oracle is the plain join, so the driver hash-checks
# that salting never changes results.  AQE's skew-join split handles sort-
# merge skew automatically; explicit salting remains the tool for skewed
# AGGREGATES and for dims too big to broadcast but cheap to replicate.


def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    cust = load_table(spark, sf_dir, "customer")
    joined = salted_join(orders, cust, ["c_custkey"], salt=8)
    return grouped(
        joined,
        ["c_mktsegment"],
        [
            F.count(F.lit(1)).alias("n_orders"),
            decimal_sum("o_totalprice", "sum_price"),
        ],
    )


_JOIN_SALTED_SQL = """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,10))), 2) AS DOUBLE)
         AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Fuzzy key re-matching: every 5th customer's name is deterministically
# corrupted (one char deleted from the numeric suffix), then matched back
# against the clean table at edit distance <= 1.  The Spark side uses
# symmetric-deletion blocking (fuzzy_key_join — L+1 block keys per row,
# hash join, exact levenshtein verify); the ORACLE is the quadratic
# definition (levenshtein over the full cross product), so a driver pass
# also proves the blocking admits no misses.



def fuzzy_key_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import fuzzy_key_join

    cust = load_table(spark, sf_dir, "customer")
    dirty = cust.filter(F.col("c_custkey") % 5 == 0).select(
        F.col("c_custkey").alias("d_key"),
        F.expr(
            _FUZZY_CORRUPT.format(name="c_name", key="c_custkey")
        ).alias("d_name"),
    )
    clean = cust.select("c_custkey", "c_name")
    matched = fuzzy_key_join(dirty, clean, "d_name", "c_name")
    return matched.groupBy("d_key").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("c_custkey").alias("min_match"),
    )


_FUZZY_KEY_SQL = f"""
WITH dirty AS (
  SELECT c_custkey AS d_key,
         {_FUZZY_CORRUPT.format(name="c_name", key="c_custkey")} AS d_name
  FROM customer WHERE c_custkey % 5 = 0
)
SELECT d_key, count(*) AS n_matches, min(c_custkey) AS min_match
FROM dirty JOIN customer ON levenshtein(d_name, c_name) <= 1
GROUP BY d_key
"""


# ---------------------------------------------------------------------------
# TPC-H Q10-shape: returned-item customer ranking — 4-table join, decimal
# revenue, total-ordered top 20.  The canonical "who cost us money"
# report: one fact shuffle pair, dims broadcast, TakeOrdered cut.


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        orders.where(
            (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(li.where(F.col("l_returnflag") == "R"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(F.sum(rev.cast("decimal(28,10)")), 2)
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey AND l_returnflag = 'R'
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# TPC-H Q14-shape: promo revenue share — conditional aggregation ratio,
# the avg-multiplied-through discipline (two decimal sums, one division).


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    ).join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,10)"
    )
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(
            F.lit(0).cast("decimal(28,10)")
        )).alias("__promo"),
        F.sum(rev).alias("__total"),
    )
    return agg.select(
        F.round(F.col("__promo"), 2).cast("double").alias("promo_revenue"),
        F.round(F.col("__total"), 2).cast("double").alias("total_revenue"),
        F.round(
            (F.col("__promo").cast("double") / F.col("__total").cast("double"))
            * 100,
            6,
        ).alias("promo_pct"),
    )


_Q14_SQL = """
WITH agg AS (
  SELECT sum(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))
                  ELSE CAST(0 AS DECIMAL(28,10)) END) AS promo,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS total
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
)
SELECT CAST(round(promo, 2) AS DOUBLE) AS promo_revenue,
       CAST(round(total, 2) AS DOUBLE) AS total_revenue,
       round(CAST(promo AS DOUBLE) / CAST(total AS DOUBLE) * 100, 6)
         AS promo_pct
FROM agg
"""


# ---------------------------------------------------------------------------
# TPC-H Q19-shape: disjunction of conjunctive brand/size/quantity bands —
# the predicate shape that exercises Catalyst's CNF conversion and partial
# pushdown (the common join condition factors out; the OR residual
# evaluates post-join in codegen).


def q19_banded_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.where(band).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum(rev.cast("decimal(28,10)")), 2)
        .cast("double")
        .alias("revenue"),
    )


_Q19_SQL = """
SELECT count(*) AS n_lines,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11
       AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#13' AND l_quantity BETWEEN 10 AND 20
       AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 20 AND 30
       AND p_size BETWEEN 1 AND 15)
"""


# ---------------------------------------------------------------------------
# TPC-H Q4-shape: EXISTS-correlated count by priority.  Catalyst
# decorrelates the EXISTS into a left-semi join (same physical shape the
# reference's IfNotExistFilter.java:56-94 wanted, inverted); the lineitem
# side's predicate is pushed below the semi join so only matching line
# items shuffle.  At 100 TB both sides hash-partition on the order key —
# one shuffle each, no row explosion (semi join emits each order once).


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_q4")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q4")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders_q4 o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem_q4 l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_discount >= 0.05)
        GROUP BY o_orderpriority
        """
    )


_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount >= 0.05)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# TPC-H Q13-shape: customer order-count distribution through a CONDITIONAL
# left outer join (the filter lives in the join condition, not a WHERE —
# moving it to WHERE would silently turn the outer join inner and drop the
# zero-order bucket).  count(o_orderkey) counts only matched rows, so
# unmatched customers land in c_count = 0.  Two shuffles (join + first
# groupBy); the second groupBy's domain is tiny (distinct counts).


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# TPC-H Q22-shape: anti-correlated NOT EXISTS + uncorrelated scalar
# aggregate threshold.  "Wealthy but dormant" customers: account balance
# above the mean positive balance, no order since 1999.  The avg threshold
# is multiplied through (bal * n > sum, exact decimal) — a double-avg
# comparison would flip boundary rows between engines.  Catalyst turns the
# NOT EXISTS into a left-anti join and the scalar subquery into a one-row
# broadcast; at scale: one anti-join shuffle on custkey, the threshold is
# a fixed-size scalar.


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_q22")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_q22")
    return spark.sql(
        """
        SELECT c_nationkey, count(*) AS numcust,
               CAST(round(sum(CAST(c_acctbal AS DECIMAL(28,10))), 2) AS DOUBLE)
                 AS totacctbal
        FROM customer_q22 c
        WHERE CAST(c_acctbal AS DECIMAL(28,10))
                * (SELECT count(*) FROM customer_q22 i WHERE i.c_acctbal > 0.0)
              > (SELECT sum(CAST(c_acctbal AS DECIMAL(28,10)))
                 FROM customer_q22 i WHERE i.c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders_q22 o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY c_nationkey
        """
    )


_Q22_SQL = """
SELECT c_nationkey, count(*) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(28,10))), 2) AS DOUBLE)
         AS totacctbal
FROM customer c
WHERE CAST(c_acctbal AS DECIMAL(28,10))
        * (SELECT count(*) FROM customer i WHERE i.c_acctbal > 0.0)
      > (SELECT sum(CAST(c_acctbal AS DECIMAL(28,10)))
         FROM customer i WHERE i.c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------
# Round 4: the remaining TPC-H shapes (Q2/Q6/Q8/Q9/Q11/Q12/Q16/Q17/Q20/
# Q21), completing the full 22-query suite.  The fixtures carry no
# partsupp table and no commit/receipt dates, so the shapes are ADAPTED:
# partsupp-derived quantities (supply cost, stock value, availability)
# are re-derived from lineitem — the part-supplier relation the data DOES
# record — and Q12/Q21's lateness predicates use ship-vs-order date.
# Each docstring states its deviation.  Numeric discipline per
# queries/__init__: decimal sums, multiplied-through thresholds, total
# orders on every LIMIT.


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape, direct: the pure-pushdown forecast query — no
    join, three range predicates and an arithmetic aggregate.  The whole
    WHERE reaches the parquet scan as PushedFilters (min/max row-group
    pruning at 100 TB); the aggregate is one partial+final pass."""
    li = load_table(spark, sf_dir, "lineitem")
    filtered = li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return filtered.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast(
                    "decimal(28,10)"
                )
            ),
            2,
        )
        .cast("double")
        .alias("revenue"),
    )


_Q6_SQL = """
SELECT count(*) AS n_lines,
       CAST(round(sum(CAST(l_extendedprice * l_discount
                           AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier per part — the correlated
    MIN subquery.  Adaptation (no partsupp): the part-supplier catalog is
    re-derived from lineitem as min observed unit price
    (l_extendedprice / l_quantity) per (part, supplier); Q2's
    ps_supplycost correlated minimum becomes the per-part min over
    EUROPE-region suppliers, and suppliers achieving it are kept (ties
    kept, like the original).  Unit price is a per-row double division —
    deterministic on identical operands — and MIN is exact, so the
    equality join back is engine-portable.

    Scale shape: the catalog aggregate is the one fact-scale shuffle
    (part+supp key); the per-part min reuses its partitioning; region/
    nation/supplier/part are broadcast dims."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    eu_supp = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    catalog = (
        li.join(F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_cost"
            )
        )
    )
    # explicit aliases: best derives from catalog, so an unaliased
    # best.l_partkey can resolve to the SAME attribute as catalog's
    # (Spark warns "trivially true equals predicate") — rename the
    # grouped side so the equality is unambiguous by construction
    best = (
        catalog.groupBy("l_partkey")
        .agg(F.min("unit_cost").alias("__best"))
        .select(F.col("l_partkey").alias("__bpk"), "__best")
    )
    wanted = part.where(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    ).select("p_partkey", "p_name")
    return (
        catalog.join(
            best,
            (F.col("l_partkey") == F.col("__bpk"))
            & (F.col("unit_cost") == F.col("__best")),
        )
        .drop("__bpk", "__best")
        .join(F.broadcast(wanted), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost"
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


_Q2_SQL = """
WITH eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
catalog AS (
  SELECT l_partkey, s_suppkey, s_name, s_acctbal, n_name,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem JOIN eu_supp ON l_suppkey = s_suppkey
  GROUP BY 1, 2, 3, 4, 5
),
best AS (
  SELECT l_partkey, min(unit_cost) AS best_cost
  FROM catalog GROUP BY 1
)
SELECT c.s_acctbal, c.s_name, c.n_name, p.p_partkey, p.p_name, c.unit_cost
FROM catalog c
JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_cost = b.best_cost
JOIN part p ON c.l_partkey = p.p_partkey
WHERE p.p_type = 'LARGE' AND p.p_size BETWEEN 10 AND 20
ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, p.p_partkey
LIMIT 100
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — per order-year, the share
    of a region's market (customers in ASIA, STANDARD-type parts) that a
    chosen supplier nation (NATION_7) captured.  The 7-table join runs
    with every dimension broadcast; the conditional-sum share follows the
    q14 discipline (two exact decimal sums, one double division).
    Deviation: none structural — only partsupp (absent from Q8 anyway)
    and the hardcoded nation/region/type literals differ."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    cust_asia = (
        cust.join(
            F.broadcast(nation.alias("cn")),
            F.col("c_nationkey") == F.col("cn.n_nationkey"),
        )
        .join(
            F.broadcast(region),
            F.col("cn.n_regionkey") == F.col("r_regionkey"),
        )
        .where(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp_n = supp.join(
        F.broadcast(nation.alias("sn")),
        F.col("s_nationkey") == F.col("sn.n_nationkey"),
    ).select("s_suppkey", F.col("sn.n_name").alias("supp_nation"))
    joined = (
        li.join(
            F.broadcast(
                part.where(F.col("p_type") == "STANDARD").select("p_partkey")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            orders.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust_asia, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,10)"
    )
    agg = joined.groupBy(
        F.year("o_orderdate").alias("o_year")
    ).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(
                F.lit(0).cast("decimal(28,10)")
            )
        ).alias("__nat"),
        F.sum(rev).alias("__tot"),
    )
    return agg.select(
        "o_year",
        F.round(F.col("__nat"), 2).cast("double").alias("nation_revenue"),
        F.round(F.col("__tot"), 2).cast("double").alias("market_revenue"),
        F.round(
            F.col("__nat").cast("double") / F.col("__tot").cast("double") * 100,
            6,
        ).alias("mkt_share_pct"),
    ).orderBy("o_year")


_Q8_SQL = """
WITH agg AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         sum(CASE WHEN sn.n_name = 'NATION_7'
                  THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))
                  ELSE CAST(0 AS DECIMAL(28,10)) END) AS nat,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS tot
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY 1
)
SELECT o_year,
       CAST(round(nat, 2) AS DOUBLE) AS nation_revenue,
       CAST(round(tot, 2) AS DOUBLE) AS market_revenue,
       round(CAST(nat AS DOUBLE) / CAST(tot AS DOUBLE) * 100, 6)
         AS mkt_share_pct
FROM agg
ORDER BY o_year
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by (supplier nation, year)
    with a part-name LIKE filter.  Adaptation (no partsupp):
    ps_supplycost * l_quantity becomes a retail-price cost basis,
    0.1 * l_quantity * p_retailprice, computed per-row in the SAME
    expression text on both engines (identical operand order keeps the
    doubles bit-equal) and decimal-summed."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    joined = (
        li.join(
            F.broadcast(
                part.where(F.col("p_name").like("red%")).select(
                    "p_partkey", "p_retailprice"
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            F.broadcast(
                supp.join(
                    F.broadcast(nation),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                ).select("s_suppkey", "n_name")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    profit = F.expr(
        "CAST(l_extendedprice * (1 - l_discount) "
        "- 0.1 * l_quantity * p_retailprice AS DECIMAL(28,10))"
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


_Q9_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           - 0.1 * l_quantity * p_retailprice
                           AS DECIMAL(28,10))), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: important-stock identification — per-part value
    vs a fraction-of-total threshold (the uncorrelated scalar HAVING).
    Adaptation (no partsupp): stock value = sum(l_quantity *
    p_retailprice) over lines shipped by AMERICA-region suppliers.  The
    threshold is scale-free — parts worth more than 2x the average part
    value, i.e. value * n_parts > 2 * total — and multiplied through in
    exact decimal (a double-fraction compare would flip boundary parts
    between engines; a fixed fraction like TPC-H's 0.0001/SF goes empty
    as the part vocabulary grows)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    am_supp = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "AMERICA")
        .select("s_suppkey")
    )
    lines = li.join(
        F.broadcast(am_supp), F.col("l_suppkey") == F.col("s_suppkey")
    ).join(
        F.broadcast(part.select("p_partkey", "p_retailprice")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    val = (F.col("l_quantity") * F.col("p_retailprice")).cast("decimal(28,10)")
    per_part = lines.groupBy("p_partkey").agg(F.sum(val).alias("__value"))
    total = per_part.agg(
        F.sum("__value").cast("decimal(38,10)").alias("__total"),
        F.count(F.lit(1)).alias("__n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("__value").cast("decimal(38,10)") * F.col("__n_parts")
            > F.col("__total") * 2
        )
        .select(
            "p_partkey",
            F.round(F.col("__value"), 2).cast("double").alias("stock_value"),
        )
        .orderBy(F.desc("stock_value"), "p_partkey")
    )


_Q11_SQL = """
WITH am_supp AS (
  SELECT s_suppkey
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'AMERICA'
),
per_part AS (
  SELECT p_partkey,
         sum(CAST(l_quantity * p_retailprice AS DECIMAL(28,10))) AS value
  FROM lineitem
  JOIN am_supp ON l_suppkey = s_suppkey
  JOIN part ON l_partkey = p_partkey
  GROUP BY 1
)
SELECT p_partkey, CAST(round(value, 2) AS DOUBLE) AS stock_value
FROM per_part
WHERE CAST(value AS DECIMAL(38,10))
        * (SELECT count(*) FROM per_part)
      > (SELECT CAST(sum(value) AS DECIMAL(38,10)) FROM per_part) * 2
ORDER BY stock_value DESC, p_partkey
"""


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: lateness-class x order-priority census — the
    two-conditional-sum aggregate over an orders-lineitem join.
    Adaptation (no ship mode / commit / receipt dates): the grouping key
    is a ship-delay class derived from l_shipdate - o_orderdate (LATE
    >= 90 days, SLOW >= 30, else FAST), and 'high priority' is
    1-URGENT/2-HIGH exactly as in Q12."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    delay_class = (
        F.when(
            F.col("l_shipdate")
            >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
            "LATE",
        )
        .when(
            F.col("l_shipdate")
            >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
            "SLOW",
        )
        .otherwise("FAST")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        joined.groupBy(delay_class.alias("delay_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("delay_class")
    )


_Q12_SQL = """
SELECT CASE WHEN l_shipdate >= o_orderdate + INTERVAL 90 DAY THEN 'LATE'
            WHEN l_shipdate >= o_orderdate + INTERVAL 30 DAY THEN 'SLOW'
            ELSE 'FAST' END AS delay_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
ORDER BY delay_class
"""


def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: supplier count per part attribute group with a
    NOT-IN supplier exclusion.  Adaptation (no partsupp): the
    part-supplier relation comes from lineitem; the 'complaints'
    exclusion (a NOT LIKE over comments) becomes suppliers with negative
    account balance, expressed as a left-anti join exactly as Catalyst
    plans NOT IN over a non-null subquery."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    bad = supp.where(F.col("s_acctbal") < 0).select("s_suppkey")
    wanted = part.where(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"),
                "left_anti")
        .join(F.broadcast(wanted), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity-order revenue — the correlated
    per-part AVG subquery (lines below 20% of their part's average
    quantity), decorrelated into a per-part aggregate joined back, which
    is exactly Catalyst's plan for the subquery form.  avg follows the
    portability rule: exact decimal sum cast to double, divided by the
    count — bit-identical on both engines; the 0.2 multiplier then
    compares double-to-double.  Brand filter stands in for Q17's
    brand+container pair (no container column)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand_parts = part.where(F.col("p_brand") == "Brand#23").select("p_partkey")
    lines = li.join(
        F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
    )
    stats = lines.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(28,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__avg_qty")
    )
    small = lines.join(stats, F.col("l_partkey") == F.col("__pk")).where(
        F.col("l_quantity") < 0.2 * F.col("__avg_qty")
    )
    return small.agg(
        F.count(F.lit(1)).alias("n_lines"),
        (
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(28,10)")), 2
            ).cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly"),
    )


_Q17_SQL = """
WITH lines AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
),
stats AS (
  SELECT l_partkey AS pk,
         CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) / count(*)
           AS avg_qty
  FROM lines GROUP BY 1
)
SELECT count(*) AS n_lines,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,10))), 2) AS DOUBLE)
         / 7.0 AS avg_yearly
FROM lines JOIN stats ON l_partkey = pk
WHERE l_quantity < 0.2 * avg_qty
"""


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the nested-semi-join supplier shortlist —
    suppliers who moved significant volume of pattern-named parts.
    Adaptation (no partsupp availability): 'excess stock' becomes
    shipped quantity per (supplier, part) above a threshold, over
    p_name LIKE 'red%' parts shipped in 1997; qualifying suppliers
    semi-join back to the ASIA-region supplier roster.  The quantity
    threshold compares an exact decimal sum to an integer literal."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    red_parts = part.where(F.col("p_name").like("red%")).select("p_partkey")
    movers = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,10)")).alias("__qty"))
        .where(F.col("__qty") > 40)
        .select("l_suppkey")
        .distinct()
    )
    asia = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
    )
    return (
        asia.join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


_Q20_SQL = """
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'red%'
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(CAST(l_quantity AS DECIMAL(28,10))) > 40
  )
ORDER BY s_name
"""


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the EXISTS + NOT-EXISTS self-join pair —
    suppliers who were the SOLE bottleneck on multi-supplier orders.
    Adaptation (no commit/receipt dates): 'kept the order waiting' means
    this supplier's latest ship date is the order's strict maximum (an
    earlier-shipping other supplier EXISTS; a later-or-equal one does
    NOT).  Both quantifiers resolve through per-order aggregates (max
    ship date, supplier count, winner count) — the group-by
    decorrelation of the self-joins — so ties disqualify on both
    engines deterministically.  EUROPE-region suppliers only.

    Scale shape: two aggregates sharing the orderkey partitioning, a
    supplier-key rollup, broadcast roster join."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("__s_last")
    )
    per_order = per_supp.groupBy(F.col("l_orderkey").alias("__ok")).agg(
        F.max("__s_last").alias("__o_last"),
        F.count(F.lit(1)).alias("__n_supp"),
    )
    winners = (
        per_supp.join(per_order, F.col("l_orderkey") == F.col("__ok"))
        .where((F.col("__n_supp") >= 2) & (F.col("__s_last") == F.col("__o_last")))
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("__n_win"),
            F.max("l_suppkey").alias("__suppkey"),
        )
        .where(F.col("__n_win") == 1)
    )
    numwait = winners.groupBy("__suppkey").agg(
        F.count(F.lit(1)).alias("numwait")
    )
    eu = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name")
    )
    return (
        numwait.join(F.broadcast(eu), F.col("__suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


_Q21_SQL = """
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS s_last
  FROM lineitem GROUP BY 1, 2
),
per_order AS (
  SELECT l_orderkey, max(s_last) AS o_last, count(*) AS n_supp
  FROM per_supp GROUP BY 1
),
winners AS (
  SELECT s.l_orderkey, count(*) AS n_win, max(s.l_suppkey) AS suppkey
  FROM per_supp s JOIN per_order o ON s.l_orderkey = o.l_orderkey
  WHERE o.n_supp >= 2 AND s.s_last = o.o_last
  GROUP BY 1
  HAVING count(*) = 1
),
numwait AS (
  SELECT suppkey, count(*) AS numwait FROM winners GROUP BY 1
)
SELECT s_name, numwait
FROM numwait
JOIN supplier ON suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot (the melt/STACK operator, agg_pivot's
    inverse): one wide per-nation aggregate over customer — counts,
    exact-cent balance sum, positive-balance count — unpivoted to
    (n_nationkey, metric, value) rows with ``stack``.  The unpivot is a
    zero-shuffle projection (rows x metrics, narrow); the one exchange is
    the aggregate's.  All metrics share BIGINT so the long table is
    cleanly typed."""
    cust = load_table(spark, sf_dir, "customer")
    wide = cust.groupBy(F.col("c_nationkey").cast("long").alias("n_nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast(
                "decimal(38,0)"
            )
        )
        .cast("long")
        .alias("acctbal_cents"),
        F.sum(F.when(F.col("c_acctbal") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_positive_bal"),
    )
    return wide.selectExpr(
        "n_nationkey",
        "stack(3, 'n_customers', n_customers, "
        "'acctbal_cents', acctbal_cents, "
        "'n_positive_bal', n_positive_bal) AS (metric, value)",
    )


_UNPIVOT_SQL = """
WITH wide AS (
  SELECT CAST(c_nationkey AS BIGINT) AS n_nationkey,
         count(*) AS n_customers,
         CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS DECIMAL(38,0)))
              AS BIGINT) AS acctbal_cents,
         CAST(sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_positive_bal
  FROM customer GROUP BY 1
)
SELECT n_nationkey, 'n_customers' AS metric, n_customers AS value FROM wide
UNION ALL
SELECT n_nationkey, 'acctbal_cents', acctbal_cents FROM wide
UNION ALL
SELECT n_nationkey, 'n_positive_bal', n_positive_bal FROM wide
"""


def percent_rank_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist over customers WITHIN each nation, in
    exact ppm fixed point: the order (balance cents desc, custkey) is
    total, so rank is unique and the SQL-standard definitions reduce to
    pure integer divisions — pct = 1e6*(r-1) DIV (n-1), cume = 1e6*r DIV
    n — that hash-check where float percent_rank would not.  The window
    partitions by nation (a real key): one shuffle, streamed partitions,
    no global sort.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
        .cast("long")
        .alias("__cents"),
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("__cents").desc(), F.col("c_custkey").asc()
    )
    wn = Window.partitionBy("c_nationkey")
    ranked = cust.withColumn("r", F.row_number().over(w).cast("long")) \
        .withColumn("__n", F.count(F.lit(1)).over(wn))
    return ranked.select(
        "c_custkey",
        "c_nationkey",
        "r",
        F.expr(
            "CASE WHEN __n = 1 THEN CAST(0 AS BIGINT)"
            " ELSE 1000000 * (r - 1) DIV (__n - 1) END"
        ).alias("pct_rank_ppm"),
        F.expr("1000000 * r DIV __n").alias("cume_dist_ppm"),
    )


_PERCENT_RANK_SQL = """
WITH c AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer
),
r AS (
  SELECT c_custkey, c_nationkey,
         CAST(row_number() OVER (PARTITION BY c_nationkey
                                 ORDER BY cents DESC, c_custkey ASC)
              AS BIGINT) AS r,
         count(*) OVER (PARTITION BY c_nationkey) AS n
  FROM c
)
SELECT c_custkey, c_nationkey, r,
       CASE WHEN n = 1 THEN CAST(0 AS BIGINT)
            ELSE 1000000 * (r - 1) // (n - 1) END AS pct_rank_ppm,
       1000000 * r // n AS cume_dist_ppm
FROM r
"""


QUERIES = [
    QueryDef("q1_pricing_summary", q1_pricing_summary, _Q1_SQL,
             "A4: TPC-H Q1-shape wide aggregate"),
    QueryDef("percent_rank_report", percent_rank_report, _PERCENT_RANK_SQL,
             "O7: percent_rank/cume_dist in exact ppm over a total order "
             "(nation-partitioned window)"),
    QueryDef("unpivot_metrics", unpivot_metrics, _UNPIVOT_SQL,
             "A4/P: wide-to-long unpivot via stack (agg_pivot's inverse, "
             "zero-shuffle projection)"),
    QueryDef("q5_region_revenue", q5_region_revenue, _Q5_SQL,
             "J2/A4: TPC-H Q5-shape 6-table star join (broadcast dims + AQE)"),
    QueryDef("q18_top_buyers", q18_top_buyers, _Q18_SQL,
             "J2/A4: TPC-H Q18-shape aggregate-then-join HAVING filter"),
    QueryDef("q7_nation_volume", q7_nation_volume, _Q7_SQL,
             "J2/A4: TPC-H Q7-shape bilateral nation-pair volume "
             "(same dim broadcast under two roles)"),
    QueryDef("q15_top_supplier", q15_top_supplier, _Q15_SQL,
             "J2/A4: TPC-H Q15-shape view-vs-own-max join "
             "(scalar broadcast, ties kept)"),
    QueryDef("q10_returned_items", q10_returned_items, _Q10_SQL,
             "J2/A4: TPC-H Q10-shape returned-item customer ranking"),
    QueryDef("q14_promo_share", q14_promo_share, _Q14_SQL,
             "A4: TPC-H Q14-shape conditional-aggregation revenue ratio"),
    QueryDef("q19_banded_revenue", q19_banded_revenue, _Q19_SQL,
             "F1/J2: TPC-H Q19-shape disjunctive band predicate "
             "(CNF conversion / partial pushdown)"),
    QueryDef("q4_order_priority", q4_order_priority, _Q4_SQL,
             "J2/A4: TPC-H Q4-shape EXISTS decorrelation (semi join)"),
    QueryDef("q13_customer_distribution", q13_customer_distribution, _Q13_SQL,
             "J2/A4: TPC-H Q13-shape conditional outer join + "
             "count distribution"),
    QueryDef("q22_dormant_customers", q22_dormant_customers, _Q22_SQL,
             "J2/A4: TPC-H Q22-shape NOT EXISTS anti join + scalar "
             "subquery threshold"),
    QueryDef("q2_min_cost_supplier", q2_min_cost_supplier, _Q2_SQL,
             "J2/A4: TPC-H Q2-shape correlated-min supplier selection "
             "(catalog re-derived from lineitem; ties kept)"),
    QueryDef("q6_forecast_revenue", q6_forecast_revenue, _Q6_SQL,
             "F1/A4: TPC-H Q6-shape pure-pushdown forecast aggregate"),
    QueryDef("q8_market_share", q8_market_share, _Q8_SQL,
             "J2/A4: TPC-H Q8-shape national market share (7-table join, "
             "conditional-sum ratio per year)"),
    QueryDef("q9_product_profit", q9_product_profit, _Q9_SQL,
             "J2/A4: TPC-H Q9-shape product-line profit by nation x year "
             "(retail-price cost basis; LIKE filter)"),
    QueryDef("q11_important_stock", q11_important_stock, _Q11_SQL,
             "A4: TPC-H Q11-shape value-share HAVING threshold "
             "(multiplied-through exact decimal)"),
    QueryDef("q12_shipmode_priority", q12_shipmode_priority, _Q12_SQL,
             "J2/A4: TPC-H Q12-shape lateness-class x priority census"),
    QueryDef("q16_parts_supplier", q16_parts_supplier, _Q16_SQL,
             "J2/A4: TPC-H Q16-shape distinct-supplier count + NOT-IN "
             "exclusion as left-anti join"),
    QueryDef("q17_small_quantity_revenue", q17_small_quantity_revenue,
             _Q17_SQL,
             "J2/A4: TPC-H Q17-shape correlated per-part AVG subquery "
             "(decorrelated aggregate join-back)"),
    QueryDef("q20_potential_promotion", q20_potential_promotion, _Q20_SQL,
             "J2: TPC-H Q20-shape nested semi-join supplier shortlist"),
    QueryDef("q21_waiting_supplier", q21_waiting_supplier, _Q21_SQL,
             "J2/A4: TPC-H Q21-shape EXISTS/NOT-EXISTS sole-bottleneck "
             "census via per-order aggregates"),
    QueryDef("fuzzy_key_match", fuzzy_key_match, _FUZZY_KEY_SQL,
             "J2: edit-distance-1 key re-matching via symmetric-deletion "
             "blocking (quadratic-definition oracle proves no misses)"),
    QueryDef("join_salted", join_salted, _JOIN_SALTED_SQL,
             "J2: salted skew join, hash-checked value-neutral vs the "
             "plain join"),
    QueryDef("q3_shipping_priority", q3_shipping_priority, _Q3_SQL,
             "A4/J2: TPC-H Q3-shape 3-way join + aggregate + top-k"),
    QueryDef("join_enrich", join_enrich, _JOIN_ENRICH_SQL,
             "J2: broadcast dimension join chain"),
    QueryDef("join_large", join_large, _JOIN_LARGE_SQL,
             "J2: fact-fact equi-join + distinct agg"),
    QueryDef("join_semi", join_semi, _JOIN_SEMI_SQL, "J2: left-semi EXISTS"),
    QueryDef("window_topk", window_topk, _WINDOW_TOPK_SQL,
             "O7: top-k per group via row_number"),
    QueryDef("window_running", window_running, _WINDOW_RUNNING_SQL,
             "O7: running frame aggregate"),
    QueryDef("agg_rollup", agg_rollup, _AGG_ROLLUP_SQL,
             "A4: ROLLUP + grouping indicators"),
    QueryDef("distinct_agg", distinct_agg, _DISTINCT_AGG_SQL,
             "A4: exact multi-distinct aggregation"),
    QueryDef("agg_cube", agg_cube, _AGG_CUBE_SQL,
             "A4: CUBE + grouping indicators"),
    QueryDef("agg_grouping_sets", agg_grouping_sets, _AGG_GROUPING_SETS_SQL,
             "A4: explicit GROUPING SETS"),
    QueryDef("agg_percentiles", agg_percentiles, _AGG_PERCENTILES_SQL,
             "A4: exact interpolated percentiles"),
    QueryDef("window_lag_lead", window_lag_lead, _WINDOW_LAG_LEAD_SQL,
             "O7: analytic lag/lead offsets"),
    QueryDef("window_analytics", window_analytics, _WINDOW_ANALYTICS_SQL,
             "O7: ntile/percent_rank/cume_dist/rank family"),
    QueryDef("revenue_pareto", revenue_pareto, _REVENUE_PARETO_SQL,
             "A4/O7: contribution + ABC Pareto classes in exact ppm over "
             "the dimension-level rollup"),
    QueryDef("gini_by_nation", gini_by_nation, _GINI_SQL,
             "A4/O7: Gini concentration in exact ppm via the tie-"
             "invariant sorted-rank identity"),
    QueryDef("event_transitions", event_transitions, _EVENT_TRANSITIONS_SQL,
             "O7: Markov transition census of consecutive event types "
             "with exact ppm probabilities"),
    QueryDef("entity_resolution", entity_resolution, _ENTITY_RESOLUTION_SQL,
             "J2+: MDM entity resolution — FastSS fuzzy edges (attribute-"
             "folded blocking) -> connected components -> entity census"),
    QueryDef("skyline_parts", skyline_parts, _SKYLINE_SQL,
             "O5+: 2-D skyline / Pareto frontier via bounded-domain level "
             "table (quadratic-definition oracle)"),
    QueryDef("null_semantics", null_semantics, _NULL_SEMANTICS_SQL,
             "A4: three-valued-logic pinning — NULL group key, count(*) "
             "vs count(col), NULL-skipping aggregates"),
    QueryDef("sliding_distinct", sliding_distinct, _SLIDING_DISTINCT_SQL,
             "A4/T8: batch sliding windows (F.window with slide) + exact "
             "distinct per overlapping window"),
    QueryDef("time_bucket_rollup", time_bucket_rollup, _TIME_ROLLUP_SQL,
             "A4/T8: multi-granularity time-bucket rollup"),
    QueryDef("agg_pivot", agg_pivot, _AGG_PIVOT_SQL,
             "A4: long->wide PIVOT aggregation"),
    QueryDef("correlated_subquery", correlated_subquery, _CORRELATED_SQL,
             "J2/A4: correlated scalar subquery (Catalyst decorrelation)"),
    QueryDef("json_extract", json_extract_agg, _JSON_EXTRACT_SQL,
             "semi-structured JSON column extraction + agg"),
    QueryDef("window_frames", window_frames, _WINDOW_FRAMES_SQL,
             "O7: explicit-frame first/last/nth_value semantics pinned "
             "(ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING)"),
    QueryDef("join_asof_tolerance", join_asof_tolerance,
             _JOIN_ASOF_TOLERANCE_SQL,
             "J2: as-of join with a 30-min staleness bound (merge_asof "
             "tolerance — the feature-store freshness contract)"),
    QueryDef("join_asof", join_asof, _JOIN_ASOF_SQL,
             "J2: as-of join via union + ordered window"),
    QueryDef("join_range", join_range, _JOIN_RANGE_SQL,
             "J2: interval containment join (broadcast NLJ)"),
    QueryDef("set_except", set_except, _SET_EXCEPT_SQL, "O6: EXCEPT"),
    QueryDef("set_union", set_union, _SET_UNION_SQL, "O6: UNION distinct"),
    QueryDef("set_intersect", set_intersect, _SET_INTERSECT_SQL, "O6: INTERSECT"),
    QueryDef("set_except_all", set_except_all, _SET_EXCEPT_ALL_SQL,
             "O6: multiset EXCEPT ALL"),
    QueryDef("set_intersect_all", set_intersect_all, _SET_INTERSECT_ALL_SQL,
             "O6: multiset INTERSECT ALL"),
]
