"""Advanced analytics queries: sketches, temporal history, graph centrality,
deterministic sampling.

These extend the migration surface with the warehouse/pipeline analytics a
user of the reference would otherwise bolt on downstream (the reference has
no aggregate beyond the counter merge, DefaultMigratorPlugin.java:309-311).
Numeric discipline per queries/__init__: integer or fixed-point arithmetic
wherever a sum crosses partitions, total orders on every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregates import decimal_sum
from ..operators.bloom import bloom_semi_join
from ..operators.clustering import (
    kmeans_assignments,
    kmeans_lloyd,
    kmeans_lloyd_sql,
    semdedup,
    semdedup_sql,
)
from ..operators.diff import snapshot_diff
from ..operators.joins import asof_join
from ..operators.events import (
    activity_streaks,
    activity_streaks_sql,
    cohort_retention,
    cohort_retention_sql,
    cooccurrence_pairs,
    cooccurrence_pairs_sql,
    funnel,
    funnel_conversion_stats,
    funnel_conversion_stats_sql,
    funnel_sql,
    last_touch_attribution,
    last_touch_attribution_sql,
    rolling_time_window,
    rolling_time_window_sql,
    seasonal_profile,
    seasonal_profile_sql,
    sessionize,
    sessionize_sql,
)
from ..operators.graph import (
    cooccurrence_edges,
    pagerank_fixed_point,
    pagerank_sql,
    triangle_stats,
    triangle_stats_sql,
)
from ..operators.profile import (
    table_checksum,
    table_checksum_sql,
    table_profile,
    table_profile_sql,
)
from ..operators.robust import mad_outlier_stats, mad_outlier_stats_sql
from ..operators.sketches import (
    bitmap_audience_overlap,
    bitmap_audience_overlap_sql,
    hll_register_sketch,
    hll_register_sketch_grouped,
    hll_register_sketch_grouped_sql,
    hll_register_sketch_sql,
    kmv_distinct,
    kmv_distinct_sql,
    kmv_set_estimate,
    kmv_set_estimate_sql,
    sampled_quantiles,
    sampled_quantiles_sql,
    winsorized_stats,
    winsorized_stats_sql,
)
from ..operators.temporal import (
    build_scd2,
    build_scd2_sql,
    latest_by_key,
    latest_by_key_sql,
)
from ..operators.textops import (
    build_inverted_index,
    build_inverted_index_sql,
    lexical_topk,
    lexical_topk_sql,
)
from ..operators.timeseries import (
    gap_fill_locf,
    gap_fill_locf_sql,
    ohlc_downsample,
    ohlc_downsample_sql,
)
from ..sources.parquet import load_table
from . import QueryDef

# ---------------------------------------------------------------------------
# KMV distinct sketch: distinct customers per order priority, estimated from
# 64 minimum hash values next to the exact count.


def kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch algebra: |click ∪ purchase| and |click ∩ purchase| user
    estimates from mergeable KMV sketches (Theta-style), with exact
    controls; k=8 so the estimator path (not the under-k exact
    short-circuit) exercises at every fixture scale."""
    events = load_table(spark, sf_dir, "events")
    return kmv_set_estimate(
        events, "event_type", "user_id", "click", "purchase", k=8
    )


_KMV_SET_OPS_SQL = kmv_set_estimate_sql(
    "events", "event_type", "user_id", "click", "purchase", k=8
)


def kmv_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return kmv_distinct(orders, "o_orderpriority", "o_custkey", k=64)


_KMV_SQL = kmv_distinct_sql("orders", "o_orderpriority", "o_custkey", k=64)


def quantiles_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path twin of agg_percentiles: same metric/groups, but exact
    interpolation over a deterministic 20% hash sample instead of a full
    per-group sort."""
    orders = load_table(spark, sf_dir, "orders")
    return sampled_quantiles(
        orders, "o_orderstatus", "o_totalprice", "o_orderkey", rate=0.2
    )


_QUANTILES_SAMPLED_SQL = sampled_quantiles_sql(
    "orders", "o_orderstatus", "o_totalprice", "o_orderkey", rate=0.2
)

# ---------------------------------------------------------------------------
# SCD2 history: collapse the event feed into per-user validity intervals of
# the event_type attribute (run-length encoding over event time).


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return build_scd2(
        events, key_col="user_id", ts_col="ts", attr_col="event_type",
        tiebreak_col="event_id",
    )


_SCD2_SQL = build_scd2_sql("events", "user_id", "ts", "event_type", "event_id")

# ---------------------------------------------------------------------------
# PageRank over the customer<->supplier trade graph (orders x lineitem,
# symmetrized so every node has out- and in-edges).  Node encoding keeps the
# two key spaces disjoint: customer c -> 2c, supplier s -> 2s+1.


def pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    raw = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    # one pass over the joined+distinct'd pair set (a union of two selects
    # would execute the join twice — see connected_components)
    edges = raw.select(
        F.explode(
            F.array(
                F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
                F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
            )
        ).alias("__e")
    ).select("__e.src", "__e.dst")
    pr = pagerank_fixed_point(edges, iterations=3)
    return (
        pr.select(
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_kind"),
            F.expr("node DIV 2").alias("entity_key"),
            "rank_fp",
        )
        .orderBy(F.col("rank_fp").desc(), F.col("entity_key").asc(), "node_kind")
        .limit(20)
    )


_PAGERANK_EDGES_CTE = """raw AS (
  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
e AS (
  SELECT c AS src, s AS dst FROM raw
  UNION ALL
  SELECT s AS src, c AS dst FROM raw
)"""

_PAGERANK_SQL = f"""
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_kind,
       node // 2 AS entity_key, rank_fp
FROM ({pagerank_sql(_PAGERANK_EDGES_CTE, iterations=3)})
ORDER BY rank_fp DESC, entity_key ASC, node_kind
LIMIT 20
"""

# ---------------------------------------------------------------------------
# Time-series regularization: dense 6-hour grid per user, last observation
# carried forward into empty buckets.


def time_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return gap_fill_locf(
        events, key_col="user_id", ts_col="ts", value_col="value",
        tiebreak_col="event_id", step_seconds=21600,
    )


_GAP_FILL_SQL = gap_fill_locf_sql(
    "events", "user_id", "ts", "value", "event_id", step_seconds=21600
)


# ---------------------------------------------------------------------------
# Event analytics: sessionization (streaming session_window's batch twin),
# ordered funnel, weekly cohort retention, trailing 7-day RANGE window.

_FUNNEL_STEPS = ["signup", "click", "purchase"]


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return sessionize(
        events, key_col="user_id", ts_col="ts", gap_seconds=600,
        value_col="value", tiebreak_col="event_id",
    )


_SESSIONIZE_SQL = sessionize_sql(
    "events", "user_id", "ts", 600, value_col="value", tiebreak_col="event_id"
)


def user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per day the active users, the NEW users (first
    ever seen that day), and the cumulative distinct user count — the
    latter computed WITHOUT any running set: each user contributes to
    exactly one day's new-user count (their min day), so the cumulative
    distinct curve is just the running sum of new users over the
    day-level rollup (metadata-scale window).  Two data-scale hash
    aggregates, zero distinct-state growth."""
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    per_user_day = events.select(
        "user_id",
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
    ).distinct()
    active = per_user_day.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    first_seen = per_user_day.groupBy("user_id").agg(
        F.min("day").alias("day")
    )
    new_users = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return (
        active.join(new_users, "day", "left")
        .select(
            "day",
            "n_active",
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
        )
        .withColumn("cum_users", F.sum("n_new").over(w).cast("long"))
    )


_USER_GROWTH_SQL = """
WITH per_user_day AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
  FROM events
),
active AS (SELECT day, count(*) AS n_active FROM per_user_day GROUP BY day),
first_seen AS (SELECT user_id, min(day) AS day FROM per_user_day GROUP BY user_id),
new_users AS (SELECT day, count(*) AS n_new FROM first_seen GROUP BY day)
SELECT a.day, a.n_active,
       CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new,
       CAST(sum(coalesce(n.n_new, 0)) OVER (
         ORDER BY a.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_users
FROM active a LEFT JOIN new_users n ON n.day = a.day
"""


def drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift report (the MLOps PSI shape, log-free): order
    totals bucketed into fixed bands, the per-bucket share of an early
    cohort vs a late cohort in exact ppm, and the signed share delta.
    All integer arithmetic — drift monitoring that hash-checks.  One
    conditional census per bucket, map-side partials."""
    orders = load_table(spark, sf_dir, "orders")
    split = "1998-01-01 00:00:00"
    bucket = F.least(
        F.floor(F.col("o_totalprice") / 20000).cast("int"), F.lit(9)
    )
    early = F.when(
        F.col("o_orderdate") < F.lit(split).cast("timestamp"), 1
    ).otherwise(0)
    census = orders.groupBy(bucket.alias("bucket")).agg(
        F.sum(early).cast("long").alias("n_early"),
        F.sum(1 - early).cast("long").alias("n_late"),
    )
    shares = census.select(
        "bucket",
        "n_early",
        "n_late",
        F.expr(
            "1000000 * n_early DIV sum(n_early) OVER (ROWS BETWEEN "
            "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
        ).alias("early_ppm"),
        F.expr(
            "1000000 * n_late DIV sum(n_late) OVER (ROWS BETWEEN "
            "UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
        ).alias("late_ppm"),
    )
    return shares.select(
        "bucket",
        "n_early",
        "n_late",
        "early_ppm",
        "late_ppm",
        (F.col("late_ppm") - F.col("early_ppm")).alias("drift_ppm"),
    )


_DRIFT_SQL = """
WITH census AS (
  SELECT CAST(least(CAST(floor(o_totalprice / 20000) AS INTEGER), 9) AS INTEGER) AS bucket,
         CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_early,
         CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
                       THEN 0 ELSE 1 END) AS BIGINT) AS n_late
  FROM orders GROUP BY 1
),
shares AS (
  SELECT bucket, n_early, n_late,
         1000000 * n_early // CAST(sum(n_early) OVER () AS BIGINT) AS early_ppm,
         1000000 * n_late // CAST(sum(n_late) OVER () AS BIGINT) AS late_ppm
  FROM census
)
SELECT bucket, n_early, n_late, early_ppm, late_ppm,
       late_ppm - early_ppm AS drift_ppm
FROM shares
"""


def funnel_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return funnel_conversion_stats(
        events, "user_id", "ts", "event_type", _FUNNEL_STEPS
    )


_FUNNEL_TIMING_SQL = funnel_conversion_stats_sql(
    "events", "user_id", "ts", "event_type", _FUNNEL_STEPS
)


def wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period reporting: weekly event counts per type with
    the previous week's count (lag over the week series) and growth in
    exact ppm.  The lag window runs on the (type, week) rollup —
    dimension-scale."""
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    weekly = events.groupBy(
        F.date_trunc("week", F.col("ts").cast("timestamp")).alias("week"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type").orderBy("week")
    return (
        weekly.withColumn("prev_n", F.lag("n").over(w))
        .where(F.col("prev_n").isNotNull())
        .select(
            "week",
            "event_type",
            "n",
            "prev_n",
            F.expr("1000000 * (n - prev_n) DIV prev_n").alias("growth_ppm"),
        )
    )


_WOW_GROWTH_SQL = """
WITH weekly AS (
  SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week, event_type,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT week, event_type, n,
         lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
  FROM weekly
)
SELECT week, event_type, n, prev_n,
       1000000 * (n - prev_n) // prev_n AS growth_ppm
FROM lagged WHERE prev_n IS NOT NULL
"""


# Benford's-law expected first-digit frequencies in ppm (floor(log10
# ratios * 1e6) — fixed public constants, identical literals both sides).
_BENFORD_PPM = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]


def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraud/corruption screen: first significant digit census of order
    totals vs the Benford expectation, deviation in exact ppm.  The digit
    extraction is string-based (first char of the integer part — no
    float log), the census is one 9-ary hash aggregate, and expected
    frequencies enter as shared integer literals."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("int")
    census = (
        orders.where(F.col("o_totalprice") >= 1.0)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    expected = F.element_at(
        F.lit(_BENFORD_PPM).cast("array<bigint>"), F.col("digit")
    )
    return census.select(
        "digit",
        "n",
        F.expr(
            f"1000000 * n DIV sum(n) OVER (ROWS BETWEEN UNBOUNDED "
            f"PRECEDING AND UNBOUNDED FOLLOWING)"
        ).alias("observed_ppm"),
        expected.alias("benford_ppm"),
    ).select(
        "digit",
        "n",
        "observed_ppm",
        "benford_ppm",
        (F.col("observed_ppm") - F.col("benford_ppm")).alias("deviation_ppm"),
    )


_BENFORD_SQL = f"""
WITH census AS (
  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INTEGER) AS digit,
         count(*) AS n
  FROM orders WHERE o_totalprice >= 1.0
  GROUP BY 1
),
ppm AS (
  SELECT digit, n,
         1000000 * n // CAST(sum(n) OVER () AS BIGINT) AS observed_ppm,
         ([{", ".join(str(v) for v in _BENFORD_PPM)}])[digit] AS benford_ppm
  FROM census
)
SELECT digit, n, observed_ppm, CAST(benford_ppm AS BIGINT) AS benford_ppm,
       observed_ppm - benford_ppm AS deviation_ppm
FROM ppm
"""


def user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store extraction: one wide conditional aggregate turns the
    event log into a per-user ML feature vector (per-type counts, exact
    value sum, activity span, active-day count) — single pass, one
    shuffle, every feature a mergeable aggregate."""
    events = load_table(spark, sf_dir, "events")

    def n_of(t):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast(
            "long"
        )

    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        n_of("click").alias("n_click"),
        n_of("view").alias("n_view"),
        n_of("purchase").alias("n_purchase"),
        n_of("signup").alias("n_signup"),
        n_of("error").alias("n_error"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("decimal(38,0)"))
        .cast("long")
        .alias("value_cents"),
        F.countDistinct(F.date_trunc("day", F.col("ts").cast("timestamp")))
        .alias("active_days"),
        (
            F.unix_micros(F.max(F.col("ts").cast("timestamp")))
            - F.unix_micros(F.min(F.col("ts").cast("timestamp")))
        ).alias("span_us"),
    )


_USER_FEATURES_SQL = """
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS BIGINT) AS value_cents,
       count(DISTINCT date_trunc('day', ts)) AS active_days,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us
FROM events GROUP BY user_id
"""


def zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly census in PURE INTEGER arithmetic: per
    user, each value is tested against the mean/stddev of its 10
    preceding observations with every denominator multiplied through —
    ``(n-1)·(x·n − S)² > 9·n·(n·Q − S²)`` flags |z| > 3 with no sqrt, no
    division, no float: bit-identical anomaly flags on any engine or
    partitioning.  One window + one census on the user key."""
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    base = events.select(
        "user_id", "ts", "event_id", cents.alias("x")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    st = base.select(
        "user_id",
        "x",
        F.count("x").over(w).alias("n"),
        F.sum("x").over(w).alias("s"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("q"),
    ).where(F.col("n") >= 5)
    flagged = st.withColumn(
        "is_anom",
        F.when(
            (F.col("n") - 1)
            * (F.col("x") * F.col("n") - F.col("s"))
            * (F.col("x") * F.col("n") - F.col("s"))
            > 9 * F.col("n") * (F.col("n") * F.col("q") - F.col("s") * F.col("s")),
            1,
        ).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_tested"),
        F.sum("is_anom").cast("long").alias("n_anomalies"),
    )


_ZSCORE_SQL = """
WITH base AS (
  SELECT user_id, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events
),
st AS (
  SELECT user_id, x,
         CAST(count(x) OVER w AS BIGINT) AS n,
         CAST(sum(x) OVER w AS BIGINT) AS s,
         CAST(sum(x * x) OVER w AS BIGINT) AS q
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
),
flagged AS (
  SELECT user_id,
         CASE WHEN (n - 1) * (x * n - s) * (x * n - s)
                   > 9 * n * (n * q - s * s)
              THEN 1 ELSE 0 END AS is_anom
  FROM st WHERE n >= 5
)
SELECT user_id, count(*) AS n_tested,
       CAST(sum(is_anom) AS BIGINT) AS n_anomalies
FROM flagged GROUP BY user_id
"""


def twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per (user, day): each observation is
    weighted by how long it stood (until the user's next event that day;
    the day's last observation carries no weight — the standard
    rectangular TWAP over an irregular series).  All-integer numerators —
    value in cents x duration in microseconds stays under 2^53 because
    BOTH factors are day-bounded — so the sums are exact on any
    partitioning; one final exact-int division to double."""
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "user_id",
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    w = W.partitionBy("user_id", "day").orderBy("ts", "event_id")
    dt = (
        F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    ).cast("long")
    weighted = base.withColumn("dt_us", F.coalesce(dt, F.lit(0)))
    out = weighted.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("dt_us").alias("total_dt_us"),
        F.sum(F.col("cents") * F.col("dt_us")).alias("__num"),
    )
    return out.where(F.col("total_dt_us") > 0).select(
        "user_id",
        "day",
        "n_events",
        "total_dt_us",
        F.round(
            F.col("__num").cast("double") / F.col("total_dt_us") / 100.0, 6
        ).alias("twap"),
    )


_TWAP_SQL = """
WITH base AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, ts, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
weighted AS (
  SELECT user_id, day, cents,
         coalesce(epoch_us(lead(ts) OVER (
             PARTITION BY user_id, day ORDER BY ts, event_id))
           - epoch_us(ts), 0) AS dt_us
  FROM base
),
agg AS (
  SELECT user_id, day, count(*) AS n_events,
         CAST(sum(dt_us) AS BIGINT) AS total_dt_us,
         CAST(sum(cents * dt_us) AS BIGINT) AS num
  FROM weighted GROUP BY user_id, day
)
SELECT user_id, day, n_events, total_dt_us,
       round(CAST(num AS DOUBLE) / total_dt_us / 100.0, 6) AS twap
FROM agg WHERE total_dt_us > 0
"""


def debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debounce census: an event is KEPT when it is the first of
    its (user, type) burst — no same-key event in the preceding 300 s.
    One lag window per (user, type) + one census aggregate, sharing the
    key partitioning."""
    from pyspark.sql import Window as W

    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        F.lag(F.col("ts").cast("timestamp")).over(w)
    )
    flagged = events.withColumn(
        "kept",
        F.when(gap.isNull() | (gap >= 300 * 1_000_000), 1).otherwise(0),
    )
    return flagged.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("kept").cast("long").alias("n_kept"),
    )


_DEBOUNCE_SQL = """
WITH flagged AS (
  SELECT user_id, event_type,
         CASE WHEN lag(ts) OVER (
                PARTITION BY user_id, event_type ORDER BY ts, event_id)
              IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER (
                PARTITION BY user_id, event_type ORDER BY ts, event_id))
                 >= 300000000
              THEN 1 ELSE 0 END AS kept
  FROM events
)
SELECT user_id, event_type, count(*) AS n_events,
       CAST(sum(kept) AS BIGINT) AS n_kept
FROM flagged GROUP BY user_id, event_type
"""


def session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.events import peak_concurrency

    events = load_table(spark, sf_dir, "events")
    sessions = sessionize(
        events, key_col="user_id", ts_col="ts", gap_seconds=600,
        tiebreak_col="event_id",
    ).select("session_start", "session_end")
    return peak_concurrency(sessions)


def _session_concurrency_sql() -> str:
    from ..operators.events import peak_concurrency_sql

    inner = sessionize_sql(
        "events", "user_id", "ts", 600, tiebreak_col="event_id"
    ).strip()
    return peak_concurrency_sql(
        f"SELECT session_start, session_end FROM ({inner}) s"
    )


def funnel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return funnel(events, "user_id", "ts", "event_type", _FUNNEL_STEPS)


_FUNNEL_SQL = funnel_sql("events", "user_id", "ts", "event_type", _FUNNEL_STEPS)


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return cohort_retention(events, "user_id", "ts")


_RETENTION_SQL = cohort_retention_sql("events", "user_id", "ts")


def rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return rolling_time_window(events, "user_id", "ts", "value")


_ROLLING_SQL = rolling_time_window_sql("events", "user_id", "ts", "value")


# ---------------------------------------------------------------------------
# Bloom-filter semi-join: revenue from lineitems of high-value orders.  The
# bloom prunes the fact scan before the shuffle; the exact semi-join removes
# false positives, so the result is bit-identical to the plain semi-join
# the oracle runs.


def bloom_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dim = orders.where(F.col("o_totalprice") > 450_000)
    matched = bloom_semi_join(li, dim, "l_orderkey", "o_orderkey")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return matched.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        decimal_sum(revenue, "revenue"),
    )


_BLOOM_JOIN_SQL = """
SELECT l_returnflag, count(*) AS n_items,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(28,10))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000)
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Correlation / regression from exact decimal moments.  Engine-builtin
# corr()/regr_slope() accumulate floating-point state in partition order —
# never cross-engine-hashable.  Exact decimal sums of (x, y, xy, x2, y2)
# ARE associative; the closed-form combination is then a fixed sequence of
# double ops, identical on both engines.


def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.parquet import spread_input

    # the five decimal(28,10) sums are interpreted (non-codegen) per-row
    # work that otherwise runs entirely inside the single-row-group scan
    # task (profiled: one 3.4 s job; guide §2.5) — spread first, narrow
    # projection so the exchange carries 3 columns
    li = spread_input(
        load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_quantity", "l_extendedprice", "l_orderkey"
        ),
        "l_orderkey",
    )
    dec = lambda c: c.cast("decimal(28,10)")  # noqa: E731
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(x)).alias("__sx"),
        F.sum(dec(y)).alias("__sy"),
        F.sum(dec(x * x)).alias("__sxx"),
        F.sum(dec(y * y)).alias("__syy"),
        F.sum(dec(x * y)).alias("__sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("__sx").cast("double"), F.col("__sy").cast("double")
    sxx, syy, sxy = (
        F.col("__sxx").cast("double"),
        F.col("__syy").cast("double"),
        F.col("__sxy").cast("double"),
    )
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    return m.select(
        "l_returnflag",
        "n",
        F.round(cov_n / F.sqrt(var_x * var_y), 6).alias("corr_qty_price"),
        F.round(cov_n / var_x, 6).alias("slope"),
        F.round((sy - (cov_n / var_x) * sx) / n, 6).alias("intercept"),
    )


_AGG_CORR_SQL = """
WITH m AS (
  SELECT l_returnflag, count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS sx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS sy,
         CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS syy,
         CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
         AS corr_qty_price,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
         AS intercept
FROM m
"""


# ---------------------------------------------------------------------------
# Snapshot diff: migration verification.  The "target" is the orders table
# with deterministic simulated drift (1/97 keys dropped, 1/31 prices
# nudged, 1/151 keys re-inserted under a shifted key) so the diff's output
# is a pure function of the fixture.


def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    drifted = orders.where(F.col("o_orderkey") % 97 != 3).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 31 == 5, F.col("o_totalprice") + F.lit(1.0)
        ).otherwise(F.col("o_totalprice")),
    )
    inserts = orders.where(F.col("o_orderkey") % 151 == 11).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
    )
    tgt = drifted.unionByName(inserts)
    d = snapshot_diff(orders, tgt, ["o_orderkey"])
    return d.select(
        "o_orderkey",
        "change_type",
        F.array_join("changed_cols", ",").alias("changed_cols"),
    )


_SNAPSHOT_DIFF_SQL = """
WITH tgt AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 31 = 5 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 <> 3
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 151 = 11
),
j AS (
  SELECT coalesce(s.o_orderkey, t.o_orderkey) AS o_orderkey,
         s.o_orderkey IS NOT NULL AS in_s,
         t.o_orderkey IS NOT NULL AS in_t,
         list_sort(list_filter([
           CASE WHEN NOT (s.o_custkey IS NOT DISTINCT FROM t.o_custkey)
                THEN 'o_custkey' END,
           CASE WHEN NOT (s.o_orderstatus IS NOT DISTINCT FROM t.o_orderstatus)
                THEN 'o_orderstatus' END,
           CASE WHEN NOT (s.o_totalprice IS NOT DISTINCT FROM t.o_totalprice)
                THEN 'o_totalprice' END,
           CASE WHEN NOT (s.o_orderdate IS NOT DISTINCT FROM t.o_orderdate)
                THEN 'o_orderdate' END,
           CASE WHEN NOT (s.o_orderpriority IS NOT DISTINCT FROM t.o_orderpriority)
                THEN 'o_orderpriority' END
         ], x -> x IS NOT NULL)) AS cc
  FROM orders s FULL OUTER JOIN tgt t ON s.o_orderkey = t.o_orderkey
)
SELECT o_orderkey,
       CASE WHEN NOT in_s THEN 'insert'
            WHEN NOT in_t THEN 'delete'
            WHEN len(cc) > 0 THEN 'update' END AS change_type,
       CASE WHEN in_s AND in_t THEN array_to_string(cc, ',') ELSE '' END
         AS changed_cols
FROM j
WHERE (NOT in_s) OR (NOT in_t) OR len(cc) > 0
"""


# ---------------------------------------------------------------------------
# Point-in-time enrichment: the warehouse "dimension as of transaction
# time" query, composed from two engine operators.  Signup events define a
# per-user tier history (build_scd2); each purchase is enriched with the
# tier valid AT ITS TIME via the as-of join — correct because SCD2
# intervals partition time per key, so the latest valid_from <= ts IS the
# active interval.  Purchases before any signup get NULL (left-outer).


def pit_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    signups = events.where(F.col("event_type") == "signup").select(
        "user_id", "ts", "event_id",
        F.floor(F.col("value") / 25).cast("long").alias("tier"),
    )
    hist = build_scd2(
        signups, key_col="user_id", ts_col="ts", attr_col="tier",
        tiebreak_col="event_id",
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    return asof_join(
        purchases,
        hist.select("user_id", "valid_from", "tier"),
        keys=["user_id"],
        left_ts="ts",
        right_ts="valid_from",
        payload_cols=["tier"],
    ).select("event_id", "user_id", "ts", "value", F.col("tier").cast("long").alias("tier"))


_PIT_ENRICH_SQL = """
WITH sg AS (
  SELECT user_id, ts, event_id, CAST(floor(value / 25) AS BIGINT) AS tier
  FROM events WHERE event_type = 'signup'
),
runs AS (
  SELECT user_id, ts, tier, event_id,
         CASE WHEN lag(tier) OVER w IS NULL
                   OR lag(tier) OVER w <> tier THEN 1 ELSE 0 END AS st
  FROM sg
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
grp AS (
  SELECT *, sum(st) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS run
  FROM runs
),
hist AS (
  SELECT user_id, min(tier) AS tier, min(ts) AS valid_from
  FROM grp GROUP BY user_id, run
),
unioned AS (
  SELECT user_id, ts, 1 AS side, event_id, value, CAST(NULL AS BIGINT) AS tier
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, valid_from, 0, NULL, NULL, tier FROM hist
),
filled AS (
  SELECT *, last_value(CASE WHEN side = 0 THEN tier END IGNORE NULLS) OVER (
    PARTITION BY user_id ORDER BY ts, side
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cur_tier
  FROM unioned
)
SELECT event_id, user_id, ts, value, cur_tier AS tier
FROM filled WHERE side = 1
"""


# ---------------------------------------------------------------------------
# Deterministic Lloyd k-means over the embedding corpus (operator docstring
# in operators/clustering.py has the full parity story).


def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmeans_lloyd(load_table(spark, sf_dir, "embeddings"))


def semdedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return semdedup(load_table(spark, sf_dir, "embeddings"))


# Cluster-balanced (diversity-flattening) subsampling: the cluster-curation
# step between semdedup (drop near-identical vectors) and mixture planning
# (weight whole sources) — head TOPICS are capped, tail topics survive
# whole, so the kept set's topic distribution flattens without touching
# source labels.  Cap chosen so the fixture exercises both branches at
# every SF (cluster populations measured 49-71 at sf0.001/sf0.01: the
# sub-60 clusters survive whole, the rest truncate at the cap).

_CBAL_CAP = 60


def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-flattening subsample over the embedding corpus: k-means
    (the deterministic Lloyd loop kmeans_embeddings pins) assigns every
    vector a topic cluster, then up to _CBAL_CAP vectors per cluster are
    kept by salted-polynomial-hash rank (sample_per_group — reproducible
    across runs, engines, and partitionings; no RNG).  Output rows are
    the kept vectors with their cluster, rank, and the cluster's full
    population — the audit columns a curation pipeline needs to see HOW
    MUCH each topic was flattened.

    Scale shape: Lloyd is 1 shuffle per round with driver-held k x dim
    centroids; the sampler is one shuffle on cluster_id + a per-cluster
    window where rows past the cap never materialize downstream; the
    population census is k rows, broadcast back."""
    from ..operators.corpus import sample_per_group

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = kmeans_assignments(emb)
    sizes = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_in_cluster")
    )
    sampled = sample_per_group(
        assigned.select("vec_id", "cluster_id"),
        ["cluster_id"],
        _CBAL_CAP,
        id_col="vec_id",
        salt="#cbal",
    )
    return sampled.join(F.broadcast(sizes), "cluster_id").select(
        "vec_id",
        F.col("cluster_id").cast("int"),
        "sample_rank",
        "n_in_cluster",
    )


def _cluster_balanced_sample_sql() -> str:
    from ..functions.hashing import poly_hash_sql
    from ..operators.clustering import _lloyd_cte_parts

    parts = _lloyd_cte_parts("embeddings", 8, 2, "embedding", "vec_id")
    ph = poly_hash_sql("CAST(vid AS VARCHAR) || '#cbal'")
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
siz AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_in_cluster
        FROM af_ GROUP BY cid),
r AS (
  SELECT vid, cid,
         CAST(row_number() OVER (PARTITION BY cid ORDER BY {ph}, vid)
              AS INTEGER) AS sample_rank
  FROM af_
)
SELECT r.vid AS vec_id, CAST(r.cid AS INTEGER) AS cluster_id,
       r.sample_rank, s.n_in_cluster
FROM r JOIN siz s ON s.cid = r.cid
WHERE r.sample_rank <= {_CBAL_CAP}"""
    )


# ---------------------------------------------------------------------------
# Inverted index over the document corpus (search-index build).


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_inverted_index(load_table(spark, sf_dir, "documents"))


# The index's READ path: query-time lexical top-k with the log-free
# rational idf (hash-exact int64 ppm ranking — see operators.textops.
# lexical_topk).  Terms chosen corpus-frequent so every SF ranks a full
# candidate pool.

_LEXICAL_TERMS = ["spark", "window", "join"]


def lexical_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lexical_topk(
        load_table(spark, sf_dir, "documents"), _LEXICAL_TERMS, k=15
    )


# ---------------------------------------------------------------------------
# Triangle census over the part co-purchase graph: parts are adjacent when
# some order contains both; per-node triangle participation + degree is
# the local-clustering report (community density, recommendation strength).


def triangle_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic half of the orders: wedge-join work grows ~quadratically
    # in edge count, and the synthetic baskets are co-occurrence-uniform, so
    # the halved census exercises the identical plan at proportionate cost
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 2 == 0
    )
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    return triangle_stats(edges)


_TRIANGLE_SQL = triangle_stats_sql(
    "(SELECT * FROM lineitem WHERE l_orderkey % 2 = 0)",
    "l_orderkey",
    "l_partkey",
)


# Link prediction over the same co-purchase graph: top non-edges by
# common-neighbor count (also-bought candidates).  Quarter of the orders:
# wedge volume IS the answer size for this operator (C(deg,2) per middle
# — no orientation escape), so the slice keeps the census proportionate.


def link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import common_neighbor_links

    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 4 == 0
    )
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    return common_neighbor_links(edges, k=20)


_LINK_PRED_EDGES_CTE = """s AS (
  SELECT DISTINCT l_orderkey AS g, l_partkey AS u
  FROM lineitem WHERE l_orderkey % 4 = 0
),
e AS (
  SELECT a.u AS u, b.u AS v
  FROM s a JOIN s b ON a.g = b.g AND a.u < b.u
  GROUP BY 1, 2
)"""


def _link_prediction_sql() -> str:
    from ..operators.graph import common_neighbor_links_sql

    return common_neighbor_links_sql(_LINK_PRED_EDGES_CTE, k=20)


# The hub cap (48: between the fixture graph's p90 and max symmetrized
# degree, so real middles are dropped at every SF — non-vacuous) is folded
# into BOTH the Spark plan and the oracle CTE: the path actually run on
# power-law graphs at scale is value-gated, not just unit-tested
# (VERDICT r04 ask #6, the join_salted pattern).
_LINK_PRED_MAX_DEGREE = 48


def link_prediction_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import common_neighbor_links

    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 4 == 0
    )
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    return common_neighbor_links(
        edges, k=20, max_degree=_LINK_PRED_MAX_DEGREE
    )


def _link_prediction_capped_sql() -> str:
    from ..operators.graph import common_neighbor_links_sql

    return common_neighbor_links_sql(
        _LINK_PRED_EDGES_CTE, k=20, max_degree=_LINK_PRED_MAX_DEGREE
    )


# ---------------------------------------------------------------------------
# Trade-graph degree distribution: the graph-shape report that sizes any
# iterative algorithm (skew, hub nodes, expected rounds) before running it.


def trade_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    raw = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = raw.select(
        F.explode(
            F.array(
                F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
                F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
            )
        ).alias("__e")
    ).select("__e.src", "__e.dst")
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy(
        F.when(F.col("src") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_kind"),
        "degree",
    ).agg(F.count(F.lit(1)).alias("n_nodes"))


_DEGREE_STATS_SQL = f"""
WITH {_PAGERANK_EDGES_CTE},
d AS (SELECT src, count(*) AS degree FROM e GROUP BY src)
SELECT CASE WHEN src % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_kind,
       degree, count(*) AS n_nodes
FROM d
GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# OHLC downsampling of the event feed: 6-hour bars per event type.


def ohlc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return ohlc_downsample(
        events, key_col="event_type", ts_col="ts", value_col="value",
        tiebreak_col="event_id", bucket_seconds=21_600,
    )


_OHLC_SQL = ohlc_downsample_sql(
    "events", "event_type", "ts", "value", "event_id", bucket_seconds=21_600
)

# ---------------------------------------------------------------------------
# Winsorized value statistics per event type: clip at the hash-sampled
# p01/p99, count the clips, exact decimal sum of the clipped values.


def winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return winsorized_stats(
        events, group_col="event_type", value_col="value", id_col="event_id"
    )


_WINSORIZE_SQL = winsorized_stats_sql("events", "event_type", "value", "event_id")


# ---------------------------------------------------------------------------
# Migration-certification profile of the orders table: run the same report
# on source and target and diff — row-free verification.

_ORDERS_PROFILE_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table_profile(load_table(spark, sf_dir, "orders"), _ORDERS_PROFILE_COLS)


_ORDERS_PROFILE_SQL = table_profile_sql("orders", _ORDERS_PROFILE_COLS)

# ---------------------------------------------------------------------------
# Event-type co-occurrence (market-basket pairs over users).


def event_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cooccurrence_pairs(load_table(spark, sf_dir, "events"), k=20)


_COOCCURRENCE_SQL = cooccurrence_pairs_sql("events", k=20)


# ---------------------------------------------------------------------------
# CDC compaction: current row per user from the event feed (read-side twin
# of the upsert sink — last writer per key wins).


def cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return latest_by_key(
        events, key_col="user_id", ts_col="ts", tiebreak_col="event_id",
        value_cols=["event_type", "value"],
    )


_CDC_LATEST_SQL = latest_by_key_sql(
    "events", "user_id", "ts", "event_id", ["event_type", "value"]
)


# ---------------------------------------------------------------------------
# Robust outlier census: median/MAD gate per event type (the quality gate
# that survives corrupt-value batches — operator docstring has the story).


def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mad_outlier_stats(
        load_table(spark, sf_dir, "events"), group_col="event_type",
        value_col="value",
    )


_MAD_OUTLIERS_SQL = mad_outlier_stats_sql("events", "event_type", "value")


# ---------------------------------------------------------------------------
# Cohort LTV curves: customers grouped by first-order month, revenue
# accumulated per months-since-acquisition — the standard lifetime-value
# triangle.  Exact integers end to end: month index is (year*12+month)
# arithmetic, revenue is cent-quantized decimal; the cumulative window
# runs over the cohort x month rollup (metadata-scale rows).


def user_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    mnum = F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
    base = orders.select(
        "o_custkey",
        mnum.cast("long").alias("__m"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("__cents"),
    )
    first = base.groupBy("o_custkey").agg(F.min("__m").alias("__m0"))
    rolled = (
        base.join(first, "o_custkey")
        .groupBy(
            F.col("__m0").alias("cohort_month"),
            (F.col("__m") - F.col("__m0")).alias("month_idx"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("n_active"),
            F.sum(F.col("__cents").cast("decimal(38,0)"))
            .cast("long")
            .alias("revenue_cents"),
        )
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("month_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return rolled.select(
        "cohort_month",
        "month_idx",
        "n_active",
        "revenue_cents",
        F.sum("revenue_cents").over(w).alias("cum_revenue_cents"),
    )


_USER_LTV_SQL = """
WITH base AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT) AS m,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
first AS (SELECT o_custkey, min(m) AS m0 FROM base GROUP BY 1),
rolled AS (
  SELECT f.m0 AS cohort_month, b.m - f.m0 AS month_idx,
         count(DISTINCT b.o_custkey) AS n_active,
         CAST(sum(CAST(b.cents AS DECIMAL(38,0))) AS BIGINT) AS revenue_cents
  FROM base b JOIN first f USING (o_custkey)
  GROUP BY 1, 2
)
SELECT cohort_month, month_idx, n_active, revenue_cents,
       CAST(sum(revenue_cents) OVER (
         PARTITION BY cohort_month ORDER BY month_idx
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_revenue_cents
FROM rolled
"""


# ---------------------------------------------------------------------------
# Top event paths: the per-(user, day) ordered event-type sequence census
# — the data behind a product-analytics Sankey / flow diagram.  The path
# string is an ORDER-SENSITIVE aggregation: collect structs, array_sort
# by (ts, event_id) — a total order, so both engines build the identical
# string — then join with '>'.


def event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    paths = (
        events.groupBy(
            "user_id", F.date_trunc("day", F.col("ts")).alias("__day")
        )
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(15)
    )


_EVENT_PATHS_SQL = """
WITH paths AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM events GROUP BY 1, 2
)
SELECT path, count(*) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 15
"""


# ---------------------------------------------------------------------------
# RFM customer segmentation: recency / frequency / monetary quintiles.
# The quintile scores reproduce ntile(5) over a TOTAL order (metric +
# custkey tiebreak, SQL-standard remainder-to-first-buckets) but the Spark
# plan contains NO partitionless window (VERDICT r04 #2): each score comes
# from operators.windows.distributed_ntile — range-repartition on the
# metric, per-partition counts collected as metadata, broadcast offsets,
# row_number within partitions, closed-form bucket from the global rank.
# The single-partition sorts the old plan shipped were dimension-scale
# today and data-scale at 100x; this plan's widest machine state is one
# partition's slice of the customer dimension.  ntile survives only in the
# DuckDB oracle and in the fixture-scale parity test
# (tests/test_analytics.py::test_rfm_distributed_matches_ntile).


def rfm_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    maxd = orders.agg(F.max("o_orderdate").alias("__maxd"))
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("__last"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "decimal(38,0)"
                )
            )
            .cast("long")
            .alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "o_custkey",
            F.datediff("__maxd", "__last").cast("long").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from concurrent.futures import ThreadPoolExecutor

    from ..operators.caching import materialized
    from ..operators.windows import distributed_ntile

    # The three ntile scores each depend ONLY on the base per-customer
    # frame's total order (R/F/M column + custkey tiebreak), never on a
    # previously attached score — so instead of chaining the passes
    # (three sequential offsets-collect actions, each range-shuffling the
    # progressively wider frame), rank three narrow projections of the
    # materialized base CONCURRENTLY (guide §2.6) and join the scores
    # back on the key.  Bucket assignment is a closed formula over
    # (rank, n_rows), both identical either way — values unchanged
    # (ntile parity pinned by test + oracle).  Measured 6.9 -> 4.2 s in
    # the same session (OPTIMIZATION_r13.md).
    scored = materialized(rfm_per_customer(spark, sf_dir), eager=True)
    specs = (
        # score 5 = best: most recent / most frequent / highest spend
        # (long: DuckDB's 6 - ntile() is BIGINT — widths must match for
        # the driver hasher)
        ("r_score", "recency_days", False),
        ("f_score", "frequency", True),
        ("m_score", "monetary_cents", True),
    )

    def leg(spec):
        alias, col, desc = spec
        order = [
            F.col(col).desc() if desc else F.col(col).asc(),
            F.col("o_custkey").asc(),
        ]
        nt = distributed_ntile(
            scored.select("o_custkey", col), 5, order, bucket_alias="__q"
        )
        return nt.select(
            "o_custkey", (6 - F.col("__q")).cast("long").alias(alias)
        )

    with ThreadPoolExecutor(max_workers=3) as pool:
        legs = list(pool.map(leg, specs))
    out = scored.select("o_custkey", "monetary_cents")
    for l in legs:
        out = out.join(l, "o_custkey")
    return out.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("monetary_cents").cast("decimal(38,0)"))
        .cast("long")
        .alias("segment_cents"),
    )


_RFM_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(date_diff('day', max(o_orderdate),
              (SELECT max(o_orderdate) FROM orders)) AS BIGINT)
           AS recency_days,
         count(*) AS frequency,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS DECIMAL(38,0)))
              AS BIGINT) AS monetary_cents
  FROM orders GROUP BY 1
),
scored AS (
  SELECT o_custkey, recency_days, frequency, monetary_cents,
         6 - ntile(5) OVER (ORDER BY recency_days ASC, o_custkey ASC)
           AS r_score,
         6 - ntile(5) OVER (ORDER BY frequency DESC, o_custkey ASC)
           AS f_score,
         6 - ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey ASC)
           AS m_score
  FROM per_cust
)
SELECT r_score, f_score, m_score, count(*) AS n_customers,
       CAST(sum(CAST(monetary_cents AS DECIMAL(38,0))) AS BIGINT)
         AS segment_cents
FROM scored GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Round-5 additions: bitmap audience algebra, HLL registers, last-touch
# attribution, activity streaks, seasonality, migration checksums, exact
# distributed median.


def audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bitmap_audience_overlap(load_table(spark, sf_dir, "events"))


def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hll_register_sketch(
        load_table(spark, sf_dir, "events"), "user_id"
    )


def hll_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hll_register_sketch_grouped(
        load_table(spark, sf_dir, "events"), "event_type", "user_id"
    )


_ATTR_TOUCH_TYPES = ["click", "view", "signup"]


def funnel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return last_touch_attribution(
        load_table(spark, sf_dir, "events"), _ATTR_TOUCH_TYPES
    )


def activity_streaks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return activity_streaks(load_table(spark, sf_dir, "events"))


def seasonal_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seasonal_profile(load_table(spark, sf_dir, "events"))


# Canonical column specs for the migration checksums: every field rendered
# through an engine-portable integer/string image (no float or timestamp
# formatting is ever compared).
_CHECKSUM_SPECS = {
    "orders": [
        ("int", "o_orderkey"),
        ("int", "o_custkey"),
        ("str", "o_orderstatus"),
        ("cents", "o_totalprice"),
        ("us", "o_orderdate"),
        ("str", "o_orderpriority"),
    ],
    "customer": [
        ("int", "c_custkey"),
        ("str", "c_name"),
        ("int", "c_nationkey"),
        ("cents", "c_acctbal"),
        ("str", "c_mktsegment"),
    ],
}


def migration_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-certification fingerprints for the two migrated tables in
    one report — on a real migration this runs twice (source and target)
    and the diff IS the certification."""
    frames = [
        table_checksum(load_table(spark, sf_dir, t), t, spec)
        for t, spec in _CHECKSUM_SPECS.items()
    ]
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out


def _migration_checksum_sql() -> str:
    return "\nUNION ALL\n".join(
        table_checksum_sql(t, spec) for t, spec in _CHECKSUM_SPECS.items()
    )


def exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global median of lineitem extended price (cents) with no
    single-partition sort: distributed_rank (range repartition + offset
    broadcast) ranks every row, the two middle ranks are selected, and
    2x the median = their value sum — pure integers end to end.  The
    distributed-selection pattern: exact order statistics at any scale
    for one range shuffle, where a naive global sort-and-pick dies.
    Output (1 row): n_rows, median_cents_x2."""
    from ..operators.windows import distributed_rank_with_total

    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("c"),
        "l_orderkey",
        "l_linenumber",
    )
    ranked, n = distributed_rank_with_total(
        li,
        [F.col("c").asc(), F.col("l_orderkey").asc(),
         F.col("l_linenumber").asc()],
    )
    lo, hi = (n + 1) // 2, (n + 2) // 2
    mid = ranked.where(F.col("__rank").isin(lo, hi))
    return mid.agg(
        F.sum("c").alias("__s"), F.count(F.lit(1)).alias("__m")
    ).select(
        F.lit(n).cast("long").alias("n_rows"),
        F.expr("__s * 2 DIV __m").alias("median_cents_x2"),
    )


_QUANTILE_PPMS = (250_000, 500_000, 750_000, 900_000, 990_000)


def exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT p25/p50/p75/p90/p99 of lineitem extended price (cents) from
    ONE distributed_rank pass — multi-rank selection: all five order
    statistics are rows of the same ranked frame, so the whole report
    costs exactly what exact_median costs (one range exchange + one
    pid-hash exchange + a metadata collect), not 5x.  Rank r(q) =
    1 + floor(q * (n-1)) (the lower nearest-rank convention — pure
    integers, no interpolation, hash-exact).  Output: one row per
    quantile (quantile_ppm, rank, value_cents)."""
    from ..operators.windows import distributed_rank_with_total

    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("c"),
        "l_orderkey",
        "l_linenumber",
    )
    ranked, n = distributed_rank_with_total(
        li,
        [F.col("c").asc(), F.col("l_orderkey").asc(),
         F.col("l_linenumber").asc()],
    )
    want = {q: 1 + (q * (n - 1)) // 1_000_000 for q in _QUANTILE_PPMS}
    picks = ranked.where(F.col("__rank").isin(*set(want.values())))
    qmap = F.array(
        *[
            F.struct(
                F.lit(q).cast("long").alias("quantile_ppm"),
                F.lit(r).cast("long").alias("rank"),
            )
            for q, r in want.items()
        ]
    )
    return (
        picks.select(F.col("__rank").alias("rank"), F.col("c"))
        .join(
            picks.sparkSession.range(1)
            .select(F.explode(qmap).alias("__q"))
            .select("__q.quantile_ppm", "__q.rank"),
            "rank",
        )
        .select("quantile_ppm", "rank", F.col("c").alias("value_cents"))
    )


_EXACT_QUANTILES_SQL = f"""
WITH v AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
  FROM lineitem
),
o AS (
  SELECT c, row_number() OVER (ORDER BY c) AS r, count(*) OVER () AS n
  FROM v
),
q AS (
  SELECT unnest([{", ".join(str(q) for q in _QUANTILE_PPMS)}]) AS quantile_ppm
)
SELECT CAST(q.quantile_ppm AS BIGINT) AS quantile_ppm,
       CAST(o.r AS BIGINT) AS rank,
       o.c AS value_cents
FROM q JOIN o ON o.r = 1 + (q.quantile_ppm * (o.n - 1)) // 1000000
"""


def id_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Migration COMPLETENESS islands: over the id space of a migrated
    subset (orders with status 'F' — a fragmented key space), report each
    contiguous present-run of o_orderkey (start, end, n_ids) — the gaps
    between runs are the ids a lossy migration dropped.  The island key
    (id - global rank) needs a GLOBAL rank, supplied by distributed_rank
    — no partitionless window; the island rollup is one aggregate.  Run
    on source and target, diff the run tables: missing ids localize to
    the exact broken run.
    """
    from ..operators.windows import distributed_rank

    ids = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("id"))
        .distinct()
    )
    ranked = distributed_rank(ids, [F.col("id").asc()])
    return (
        ranked.withColumn("__isl", F.col("id") - F.col("__rank"))
        .groupBy("__isl")
        .agg(
            F.min("id").alias("run_start"),
            F.max("id").alias("run_end"),
            F.count(F.lit(1)).alias("n_ids"),
        )
        .drop("__isl")
    )


_ID_GAP_SQL = """
WITH ids AS (
  SELECT DISTINCT o_orderkey AS id FROM orders WHERE o_orderstatus = 'F'
),
r AS (SELECT id, id - row_number() OVER (ORDER BY id) AS isl FROM ids)
SELECT min(id) AS run_start, max(id) AS run_end, count(*) AS n_ids
FROM r GROUP BY isl
"""


_EXACT_MEDIAN_SQL = """
WITH v AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
  FROM lineitem
),
o AS (
  SELECT c, row_number() OVER (ORDER BY c) AS r, count(*) OVER () AS n
  FROM v
)
SELECT CAST(max(n) AS BIGINT) AS n_rows,
       CAST(sum(c) * 2 // count(*) AS BIGINT) AS median_cents_x2
FROM o WHERE r IN ((n + 1) // 2, (n + 2) // 2)
"""


def revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-revenue decile report over the FACT table: decile (1 = top
    spenders) -> order count + exact-cent revenue + share_ppm.  The decile
    assignment is distributed_ntile over (cents desc, orderkey) — exact
    SQL ntile semantics with the range-partition + offset-broadcast plan,
    the same no-single-partition-sort operator the rfm rewrite shipped,
    here value-gated at ORDER grain (fact-scale, not dimension-scale).
    """
    from ..operators.windows import distributed_ntile

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("__cents"),
    )
    tiled = distributed_ntile(
        orders,
        10,
        [F.col("__cents").desc(), F.col("o_orderkey").asc()],
        bucket_alias="decile",
    )
    per = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("__cents").cast("decimal(38,0)"))
        .cast("long")
        .alias("revenue_cents"),
    )
    total = per.agg(
        F.sum(F.col("revenue_cents").cast("decimal(38,0)")).alias("__t")
    )
    return per.crossJoin(F.broadcast(total)).select(
        "decile",
        "n_orders",
        "revenue_cents",
        F.expr(
            "CAST(CAST(1000000 AS DECIMAL(38,0)) * revenue_cents"
            " DIV __t AS BIGINT)"
        ).alias("share_ppm"),
    )


_REVENUE_DECILES_SQL = """
WITH tiled AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
         CAST(ntile(10) OVER (
           ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DESC,
                    o_orderkey ASC) AS BIGINT) AS decile
  FROM orders
),
per AS (
  SELECT decile, count(*) AS n_orders,
         CAST(sum(CAST(c AS DECIMAL(38,0))) AS BIGINT) AS revenue_cents
  FROM tiled GROUP BY 1
),
t AS (SELECT sum(CAST(revenue_cents AS HUGEINT)) AS tot FROM per)
SELECT decile, n_orders, revenue_cents,
       CAST(1000000 * CAST(revenue_cents AS HUGEINT) // tot AS BIGINT)
         AS share_ppm
FROM per, t
"""


def ema_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer exponential moving average of order value in EXACT
    DYADIC fixed point: the classic EMA recursion (alpha = 1/2) truncated
    to the 16 most recent orders, so every weight is a power of two and
    the weighted sum is pure integer arithmetic — smoothing that
    hash-checks across engines, where a float pow() chain never would.

      ema = sum_j cents_j * 2^(15-j) / sum_j 2^(15-j)   (j=0 most recent)

    Scale shape: ONE per-customer aggregate (collect_list of that
    customer's orders — bounded by per-customer order count, the same
    contract as sessionize), array ops are narrow HOFs, no window at all.
    Output: (o_custkey, n_used, ema_ppm) with ema_ppm = 1e6 * weighted
    cents / weight sum, truncating division on both engines.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.struct(
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("t"),
            F.col("o_orderkey").alias("k"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("c"),
        ).alias("__s"),
    )
    per = orders.groupBy("o_custkey").agg(
        F.expr(
            "slice(reverse(array_sort(collect_list(__s))), 1, 16)"
        ).alias("__recent")
    )
    return per.select(
        "o_custkey",
        F.size("__recent").cast("long").alias("n_used"),
        F.expr(
            "CAST((CAST(1000000 AS DECIMAL(38,0)) * "
            " aggregate(transform(sequence(0, size(__recent) - 1),"
            "   i -> __recent[i].c * shiftleft(CAST(1 AS BIGINT), 15 - i)),"
            "   CAST(0 AS BIGINT), (a, x) -> a + x))"
            " DIV aggregate(transform(sequence(0, size(__recent) - 1),"
            "   i -> shiftleft(CAST(1 AS BIGINT), 15 - i)),"
            "   CAST(0 AS BIGINT), (a, x) -> a + x) AS BIGINT)"
        ).alias("ema_ppm"),
    )


_EMA_PRICES_SQL = """
WITH per AS (
  SELECT o_custkey,
         (list(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
               ORDER BY o_orderdate DESC, o_orderkey DESC))[1:16] AS recent
  FROM orders GROUP BY 1
)
SELECT o_custkey,
       CAST(len(recent) AS BIGINT) AS n_used,
       CAST(CAST(1000000 AS HUGEINT)
            * list_sum(list_transform(range(len(recent)),
                i -> recent[CAST(i AS INTEGER) + 1]
                     * (CAST(1 AS BIGINT) << (15 - CAST(i AS INTEGER)))))
            // list_sum(list_transform(range(len(recent)),
                i -> CAST(1 AS BIGINT) << (15 - CAST(i AS INTEGER))))
            AS BIGINT) AS ema_ppm
FROM per
"""


def join_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join skew diagnosis — the 'should I salt?' pre-flight, the
    join twin of minhash_band_stats: per-key row counts on both sides of
    a planned join (here the lineitem-supplier fact/dim join on suppkey)
    and the implied per-key output volume, top 15 keys by that volume
    plus each key's share of the total join output in ppm.  Two key-count
    aggregates + a key join on the (far smaller) count tables + a 1-row
    total — strictly cheaper than the join it sizes.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    lc = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n_left")
    )
    rc = sup.groupBy(F.col("s_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("n_right")
    )
    # the per-key product can exceed int64 on a pathologically hot key
    # (1e10 x 1e10 rows) — widen to decimal(38,0) and clamp the REPORTED
    # value at int64 max on both engines (Spark would wrap silently,
    # DuckDB would error — the lift_ppm divergence class); share_ppm is
    # computed from the unclamped decimal product
    max_long = (1 << 63) - 1
    per_key = lc.join(rc, "key").select(
        "key", "n_left", "n_right",
        F.expr(
            "CAST(n_left AS DECIMAL(38,0)) * n_right"
        ).alias("__est_wide"),
    ).withColumn(
        "est_rows",
        F.expr(
            f"CAST(least(__est_wide, CAST({max_long} AS DECIMAL(38,0)))"
            " AS BIGINT)"
        ),
    )
    total = per_key.agg(F.sum("__est_wide").alias("__t"))
    return (
        per_key.crossJoin(F.broadcast(total))
        .select(
            "key", "n_left", "n_right", "est_rows",
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0)) * __est_wide DIV __t"
                " AS BIGINT)"
            ).alias("share_ppm"),
        )
        .orderBy(F.desc("est_rows"), "key")
        .limit(15)
    )


_JOIN_SKEW_SQL = f"""
WITH lc AS (SELECT l_suppkey AS key, count(*) AS n_left
            FROM lineitem GROUP BY 1),
rc AS (SELECT s_suppkey AS key, count(*) AS n_right
       FROM supplier GROUP BY 1),
pk AS (
  SELECT key, n_left, n_right,
         CAST(n_left AS HUGEINT) * n_right AS est_wide,
         CAST(least(CAST(n_left AS HUGEINT) * n_right,
                    CAST({(1 << 63) - 1} AS HUGEINT)) AS BIGINT) AS est_rows
  FROM lc JOIN rc USING (key)
),
t AS (SELECT sum(est_wide) AS tot FROM pk)
SELECT key, n_left, n_right, est_rows,
       CAST(1000000 * est_wide // tot AS BIGINT) AS share_ppm
FROM pk, t
ORDER BY est_rows DESC, key
LIMIT 15
"""


# per-process scratch dirs for zorder_scan, one per fixture (see query)
_ZORDER_DIRS: dict[str, str] = {}


def _zorder_scratch_dir(sf_dir: str) -> str:
    import tempfile

    key = sf_dir
    if key not in _ZORDER_DIRS:
        _ZORDER_DIRS[key] = tempfile.mkdtemp(
            prefix="cassandra_cql_streaming_db_migrator_zorder_"
        )
    return _ZORDER_DIRS[key]


def zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end value gate for the Z-order layout path: lineitem is
    rewritten clustered on Z(l_partkey, l_suppkey) (sinks.layout — the
    OPTIMIZE ZORDER analog), read back, filtered on BOTH dimensions, and
    folded to (n_rows, revenue_cents).  The oracle applies the same
    predicate to the source table directly, so a driver pass proves the
    bit-interleave + range-partition + rewrite round trip loses and
    duplicates nothing — the layout machinery, not just the scan, is
    value-gated.  (The skipping benefit itself shows in file-level
    min/max footers; tests/test_layout.py asserts tight ranges.)"""
    import os

    from ..sinks.layout import write_zordered

    li = load_table(spark, sf_dir, "lineitem")
    # ONE mkdtemp per (process, fixture), cached and overwritten on reuse:
    # bounded growth across bench iterations (the review-1 leak fix)
    # WITHOUT the fixed-path hazards a shared /tmp name has — concurrent
    # processes get distinct private dirs, nothing is squattable
    # (review-2 finding)
    out = os.path.join(_zorder_scratch_dir(sf_dir), "li")
    write_zordered(li, out, "l_partkey", "l_suppkey", bits=18, n_files=8)
    back = spark.read.parquet(out)
    sel = back.where(
        F.col("l_partkey").between(100, 400)
        & F.col("l_suppkey").between(1, 40)
    )
    return sel.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
                "decimal(38,0)"
            )
        )
        .cast("long")
        .alias("revenue_cents"),
    )


_ZORDER_SCAN_SQL = """
SELECT count(*) AS n_rows,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS DECIMAL(38,0)))
            AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_partkey BETWEEN 100 AND 400 AND l_suppkey BETWEEN 1 AND 40
"""


def _bucket_table_suffix(sf_dir: str) -> str:
    import os
    import re

    # per-(process, fixture) managed-table names: concurrent harness
    # processes share the warehouse dir, so pid-suffixed names keep their
    # overwrites private; within a process the name is stable, so bench
    # reps overwrite instead of accumulating
    return re.sub(r"[^0-9a-z]+", "_", sf_dir.lower()).strip("_") + f"_{os.getpid()}"


def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end value gate for the BUCKETED-table path (sinks.bucketing
    — the 100 TB co-location tool): orders and lineitem are written as
    managed tables bucketed (and sorted) on their order key, read back
    with bucketing metadata intact, joined WITHOUT any exchange on either
    side (the bucket join — pytest asserts the plan shape), and folded to
    a per-priority revenue census.  The oracle runs the same join+census
    on the raw parquet, so a driver pass proves the bucket-aligned
    rewrite loses and duplicates nothing.  At 100 TB this is the
    difference between shuffling the fact table once per query and
    never: bucket on the PK at ingest, and every later equi-join on that
    key is a zipped per-bucket merge."""
    from ..sinks.bucketing import (
        gc_stale_pid_tables,
        read_bucketed,
        write_bucketed,
    )

    # reap table copies left by dead harness processes (ADVICE r06) —
    # this process's own tables are overwritten in place per rep
    gc_stale_pid_tables(spark, ["b_orders_", "b_lineitem_"])
    sfx = _bucket_table_suffix(sf_dir)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    t_orders, t_li = f"b_orders_{sfx}", f"b_lineitem_{sfx}"
    write_bucketed(orders, t_orders, ["o_orderkey"], 8)
    write_bucketed(li, t_li, ["l_orderkey"], 8)
    joined = read_bucketed(spark, t_orders).join(
        read_bucketed(spark, t_li),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
                "decimal(38,0)"
            )
        )
        .cast("long")
        .alias("revenue_cents"),
    )


_BUCKETED_JOIN_SQL = """
SELECT o_orderpriority, count(*) AS n_items,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS DECIMAL(38,0)))
            AS BIGINT) AS revenue_cents
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1
"""


def hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-state quantiles (operators.sketches.histogram_quantiles):
    p50/p90/p99 of lineitem prices from a fixed-width-bin histogram —
    the quantile family's mergeable member beside exact_quantiles
    (distributed selection) and quantiles_sampled (hash sampling).  State
    is the sparse (bin, count) table: merges under count addition across
    partitions/days/sources, answer degrades to bin resolution instead
    of failing.  One hash aggregate; the cumulative window runs on
    bin-count rows (metadata-scale, the centroid/offset contract)."""
    from ..operators.sketches import histogram_quantiles

    return histogram_quantiles(
        load_table(spark, sf_dir, "lineitem"), "l_extendedprice"
    )


def _hist_quantiles_sql() -> str:
    from ..operators.sketches import histogram_quantiles_sql

    return histogram_quantiles_sql("lineitem", "l_extendedprice")


def hist_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP mergeable quantiles (operators.sketches.
    grouped_histogram_quantiles): p50/p90/p99 of event value per event
    type from per-group fixed-bin histograms — the production form of
    the sketch (per-segment latency/price percentiles); state stays the
    sparse (group, bin, count) table and the cumulative window
    partitions by group, never a single-partition sort."""
    from ..operators.sketches import grouped_histogram_quantiles

    return grouped_histogram_quantiles(
        load_table(spark, sf_dir, "events"),
        "event_type",
        "value",
        bin_cents=1000,
    )


def _hist_quantiles_by_type_sql() -> str:
    from ..operators.sketches import grouped_histogram_quantiles_sql

    return grouped_histogram_quantiles_sql(
        "events", "event_type", "value", bin_cents=1000
    )


def basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules over the event baskets
    (operators.events.association_rules): confidence + lift in exact ppm."""
    from ..operators.events import association_rules

    return association_rules(load_table(spark, sf_dir, "events"), k=20)


def _basket_rules_sql() -> str:
    from ..operators.events import association_rules_sql

    return association_rules_sql(k=20)


QUERIES = [
    QueryDef(
        "mad_outliers", mad_outliers, _MAD_OUTLIERS_SQL,
        "robust outlier census: per-group median/MAD gate "
        "(|x - med| > 3 * 1.4826 * MAD)",
    ),
    QueryDef(
        "cdc_latest", cdc_latest, _CDC_LATEST_SQL,
        "CDC read-side compaction: current row per key, one hash "
        "aggregate (upsert-view semantics)",
    ),
    QueryDef(
        "table_profile", orders_profile, _ORDERS_PROFILE_SQL,
        "per-column profile (nulls/distinct/min/max) in one pass — "
        "migration certification report",
    ),
    QueryDef(
        "cooccurrence_pairs", event_cooccurrence, _COOCCURRENCE_SQL,
        "market-basket co-occurrence pairs with reach + containment",
    ),
    QueryDef(
        "kmv_distinct", kmv_distinct_customers, _KMV_SQL,
        "KMV k-minimum-values distinct-count sketch (deterministic, mergeable)",
    ),
    QueryDef(
        "kmv_set_ops", kmv_set_ops, _KMV_SET_OPS_SQL,
        "KMV sketch algebra: union/intersection cardinality estimates "
        "(Theta-style) with exact controls",
    ),
    QueryDef(
        "triangle_census", triangle_census, _TRIANGLE_SQL,
        "per-node triangle count + degree on the part co-purchase graph "
        "(id-ordered wedge join; degree-ordering is the skew refinement)",
    ),
    QueryDef(
        "trade_degree_stats", trade_degree_stats, _DEGREE_STATS_SQL,
        "trade-graph degree distribution (graph-shape / skew report)",
    ),
    QueryDef(
        "ohlc_downsample", ohlc_events, _OHLC_SQL,
        "OHLC time-bucket bars per event type (one-shuffle downsample)",
    ),
    QueryDef(
        "winsorize_values", winsorize_values, _WINSORIZE_SQL,
        "winsorized per-group stats: clip at sampled p01/p99, decimal sum",
    ),
    QueryDef(
        "scd2_history", scd2_history, _SCD2_SQL,
        "SCD type-2 validity intervals from a change feed (one shuffle)",
    ),
    QueryDef(
        "pagerank_trade", pagerank_trade, _PAGERANK_SQL,
        "fixed-point PageRank over the trade graph (exact integer iteration)",
    ),
    QueryDef(
        "time_gap_fill", time_gap_fill, _GAP_FILL_SQL,
        "dense per-key time grid with LOCF gap filling (hypertable resample)",
    ),
    QueryDef(
        "user_growth", user_growth, _USER_GROWTH_SQL,
        "growth accounting: active/new/cumulative-distinct users with "
        "ZERO running-set state (first-seen decomposition)",
    ),
    QueryDef(
        "drift_report", drift_report, _DRIFT_SQL,
        "distribution-drift report (log-free PSI shape): cohort shares "
        "and deltas in exact ppm",
    ),
    QueryDef(
        "funnel_timing", funnel_timing, _FUNNEL_TIMING_SQL,
        "conversion-latency report: exact interpolated percentiles of "
        "funnel completion time",
    ),
    QueryDef(
        "wow_growth", wow_growth, _WOW_GROWTH_SQL,
        "week-over-week growth in exact ppm over the dimension-level "
        "weekly rollup",
    ),
    QueryDef(
        "benford_audit", benford_audit, _BENFORD_SQL,
        "Benford first-digit audit: string-based digit census vs "
        "integer-literal expectations",
    ),
    QueryDef(
        "user_features", user_features, _USER_FEATURES_SQL,
        "feature-store extraction: per-user ML feature vector in one "
        "wide mergeable aggregate",
    ),
    QueryDef(
        "zscore_anomalies", zscore_anomalies, _ZSCORE_SQL,
        "rolling z-score anomaly census in pure integer arithmetic "
        "(denominators multiplied through — no sqrt, no float)",
    ),
    QueryDef(
        "twap_daily", twap_daily, _TWAP_SQL,
        "time-weighted average over irregular series: day-bounded exact "
        "integer numerators",
    ),
    QueryDef(
        "debounce_events", debounce_events, _DEBOUNCE_SQL,
        "telemetry debounce census: burst-leader detection per (user, "
        "type) key",
    ),
    QueryDef(
        "session_concurrency", session_concurrency, _session_concurrency_sql(),
        "per-day peak simultaneous sessions: day-partitioned sweep line "
        "over clipped session intervals",
    ),
    QueryDef(
        "sessionize_events", sessionize_events, _SESSIONIZE_SQL,
        "batch sessionization with streaming session_window semantics",
    ),
    QueryDef(
        "funnel_events", funnel_events, _FUNNEL_SQL,
        "ordered multi-step funnel (chained window stages, one shuffle)",
    ),
    QueryDef(
        "retention_cohorts", retention_cohorts, _RETENTION_SQL,
        "weekly cohort x activity-period retention matrix",
    ),
    QueryDef(
        "rolling_7d", rolling_7d, _ROLLING_SQL,
        "trailing 7-day time-RANGE window (count + exact decimal sum)",
    ),
    QueryDef(
        "quantiles_sampled", quantiles_sampled, _QUANTILES_SAMPLED_SQL,
        "quantiles over a deterministic hash sample (the no-full-sort path)",
    ),
    QueryDef(
        "bloom_join", bloom_join_revenue, _BLOOM_JOIN_SQL,
        "bloom-filter semi-join (runtime-filter pattern, exact result)",
    ),
    QueryDef(
        "snapshot_diff", snapshot_diff_orders, _SNAPSHOT_DIFF_SQL,
        "migration verification: classify insert/update/delete drift per key",
    ),
    QueryDef(
        "pit_enrich", pit_enrich, _PIT_ENRICH_SQL,
        "point-in-time enrichment: SCD2 history + as-of join composition",
    ),
    QueryDef(
        "agg_corr", agg_corr, _AGG_CORR_SQL,
        "correlation/regression from exact decimal moments (one shuffle)",
    ),
    QueryDef(
        "kmeans_embeddings", kmeans_embeddings, kmeans_lloyd_sql(),
        "deterministic Lloyd k-means (bit-identical iterative ML)",
    ),
    QueryDef(
        "semdedup", semdedup_embeddings, semdedup_sql(),
        "semantic dedup: k-means blocking + within-cluster cosine "
        "pruning (SemDeDup recipe)",
    ),
    QueryDef(
        "cluster_balanced_sample", cluster_balanced_sample,
        _cluster_balanced_sample_sql(),
        "diversity-flattening subsample: cap kept vectors per k-means "
        "topic cluster by salted-hash rank — head topics truncate, tail "
        "topics survive whole",
    ),
    QueryDef(
        "inverted_index", inverted_index, build_inverted_index_sql(),
        "inverted-index build: capped posting lists, one term shuffle",
    ),
    QueryDef(
        "lexical_search", lexical_search, lexical_topk_sql(_LEXICAL_TERMS),
        "query-time lexical top-k: BM25-shaped log-free rational idf in "
        "int64 ppm — hash-exact ranking",
    ),
    QueryDef(
        "link_prediction", link_prediction, _link_prediction_sql(),
        "common-neighbor link prediction: top non-edges of the "
        "co-purchase graph (also-bought candidates)",
    ),
    QueryDef(
        "link_prediction_capped", link_prediction_capped,
        _link_prediction_capped_sql(),
        "link prediction with the max_degree hub cap folded into plan "
        "AND oracle — the power-law-scale path, value-gated",
    ),
    QueryDef(
        "user_ltv", user_ltv, _USER_LTV_SQL,
        "cohort LTV triangle: first-order-month cohorts x months-since, "
        "exact-cent cumulative revenue",
    ),
    QueryDef(
        "event_paths", event_paths, _EVENT_PATHS_SQL,
        "top per-(user, day) event-type sequences (order-sensitive "
        "aggregation via total-order array_sort)",
    ),
    QueryDef(
        "rfm_segments", rfm_segments, _RFM_SQL,
        "RFM customer segmentation: deterministic total-order quintiles, "
        "exact-cent segment rollup",
    ),
    QueryDef(
        "audience_overlap", audience_overlap,
        bitmap_audience_overlap_sql(),
        "pairwise audience intersection via 64-bit bitmap words "
        "(roaring-lite) — exact distinct overlap, no key-pair join",
    ),
    QueryDef(
        "hll_distinct", hll_distinct,
        hll_register_sketch_sql("events", "user_id"),
        "HLL-shaped 512-register sketch: mergeable max-rho state, raw "
        "estimator in pure integer ppm + exact control",
    ),
    QueryDef(
        "hll_by_type", hll_by_type,
        hll_register_sketch_grouped_sql("events", "event_type", "user_id"),
        "per-group HLL registers (distinct users per event type): at most "
        "512 rows of mergeable state per group",
    ),
    QueryDef(
        "funnel_attribution", funnel_attribution,
        last_touch_attribution_sql(_ATTR_TOUCH_TYPES),
        "last-touch marketing attribution: carry-forward window credits "
        "each purchase to the prior touch channel",
    ),
    QueryDef(
        "activity_streaks", activity_streaks_q, activity_streaks_sql(),
        "gaps-and-islands: longest consecutive-day activity streak per "
        "user, reported as a histogram",
    ),
    QueryDef(
        "seasonal_profile", seasonal_profile_q, seasonal_profile_sql(),
        "day-of-week x hour seasonality fingerprint (exact-cent sums, "
        "portable averages)",
    ),
    QueryDef(
        "migration_checksum", migration_checksum,
        _migration_checksum_sql(),
        "order-independent md5 table fingerprints (mod 2^61-1) — "
        "content-level migration certification, zero shuffle",
    ),
    QueryDef(
        "exact_median", exact_median, _EXACT_MEDIAN_SQL,
        "exact global median by distributed selection (range-partitioned "
        "rank, no single-partition sort)",
    ),
    QueryDef(
        "revenue_deciles", revenue_deciles, _REVENUE_DECILES_SQL,
        "fact-scale decile report via distributed_ntile (exact ntile "
        "semantics, no single-partition sort) + share_ppm",
    ),
    QueryDef(
        "exact_quantiles", exact_quantiles, _EXACT_QUANTILES_SQL,
        "exact p25/p50/p75/p90/p99 by multi-rank distributed selection — "
        "five order statistics for the price of one ranked pass",
    ),
    QueryDef(
        "id_gap_report", id_gap_report, _ID_GAP_SQL,
        "migration completeness islands: contiguous present-runs of the "
        "id space (gaps localize dropped rows), global rank distributed",
    ),
    QueryDef(
        "ema_prices", ema_prices, _EMA_PRICES_SQL,
        "per-customer EMA (alpha=1/2, 16-order horizon) in exact dyadic "
        "fixed point — hash-checkable smoothing, one aggregate, no window",
    ),
    QueryDef(
        "join_skew_stats", join_skew_stats, _JOIN_SKEW_SQL,
        "pre-join skew diagnosis: per-key volumes both sides + implied "
        "output share — the 'should I salt?' pre-flight",
    ),
    QueryDef(
        "hist_quantiles_by_type", hist_quantiles_by_type,
        _hist_quantiles_by_type_sql(),
        "per-group mergeable histogram quantiles (per-event-type value "
        "percentiles; group-partitioned cum window, no global sort)",
    ),
    QueryDef(
        "hist_quantiles", hist_quantiles, _hist_quantiles_sql(),
        "mergeable fixed-bin histogram quantiles (p50/p90/p99 of prices; "
        "sparse bin state, count-additive merges)",
    ),
    QueryDef(
        "bucketed_join", bucketed_join, _BUCKETED_JOIN_SQL,
        "bucketed-table co-located join value-gated end to end: "
        "bucketBy+sortBy rewrite, exchange-free bucket join, census",
    ),
    QueryDef(
        "zorder_scan", zorder_scan, _ZORDER_SCAN_SQL,
        "Z-order layout round trip value-gated: rewrite clustered on "
        "Z(part, supp), 2-D predicate scan-back equals the source filter",
    ),
    QueryDef(
        "basket_rules", basket_rules, _basket_rules_sql(),
        "directed association rules (support/confidence/lift in exact "
        "ppm) over event baskets",
    ),
]
