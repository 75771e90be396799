"""Event analytics: sessionization, funnels, cohort retention, rolling
time-range windows.

The product-analytics layer over an event feed — the batch twins of the
streaming surface (streaming/stream.py).  ``sessionize`` in particular
implements exactly the semantics of Spark's streaming ``session_window``
(each event opens a [ts, ts+gap) window; overlapping windows merge; the
session ends gap after its last event), so a pipeline can run the SAME
sessionization logic incrementally on the live stream and in batch over
the backfill — tests assert the two operators agree row-for-row.

Scale shapes:
  * sessionize / rolling window: one shuffle (hash partition by key), then
    ordered within partition — the floor for per-key sequence logic.
  * funnel: two chained window stages over the SAME per-key partitioning
    (step-2 "after step-1" needs step-1's time first) — Catalyst reuses
    the exchange, then one aggregate.
  * retention: first-seen per key (aggregate) joined back to the feed —
    the join is key-partitioned both sides; cohort matrix is
    metadata-scale output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .aggregates import decimal_sum
from .caching import materialized


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    value_col: str | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Gap-based sessions with streaming ``session_window`` semantics:
    a new session starts when an event arrives >= gap after the previous
    event's time; ``session_end`` is last event time + gap.  Returns
    ``key, session_start, session_end, n_events[, sum_value]``."""
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    gap = F.lit(gap_seconds)
    breaks = (
        df.withColumn("__prev", F.lag(ts_col).over(w))
        .withColumn(
            "__new",
            F.when(
                F.col("__prev").isNull()
                | (
                    F.unix_micros(F.col(ts_col).cast("timestamp"))
                    - F.unix_micros(F.col("__prev").cast("timestamp"))
                    >= gap * F.lit(1_000_000)
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("__sess", F.sum("__new").over(w))
    )
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.timestamp_micros(
            F.unix_micros(F.max(ts_col).cast("timestamp")) + gap * F.lit(1_000_000)
        ).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(decimal_sum(value_col, "sum_value"))
    return (
        breaks.groupBy(key_col, "__sess")
        .agg(*aggs)
        .select(key_col, "session_start", "session_end", "n_events",
                *(["sum_value"] if value_col is not None else []))
    )


def sessionize_sql(
    table: str,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    value_col: str | None = None,
    tiebreak_col: str | None = None,
) -> str:
    """The identical sessionization as DuckDB SQL (oracle twin)."""
    tie = f", {tiebreak_col}" if tiebreak_col else ""
    gap_us = gap_seconds * 1_000_000
    val = (
        f",\n       CAST(round(sum(CAST({value_col} AS DECIMAL(28,10))), 2) AS DOUBLE)"
        " AS sum_value"
        if value_col
        else ""
    )
    return f"""
WITH b AS (
  SELECT {key_col}, {ts_col}, {f'{value_col},' if value_col else ''}{f'{tiebreak_col},' if tiebreak_col else ''}
         CASE WHEN lag({ts_col}) OVER w IS NULL
                   OR epoch_us({ts_col}) - epoch_us(lag({ts_col}) OVER w)
                      >= {gap_us} THEN 1 ELSE 0 END AS st
  FROM {table}
  WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col}{tie})
),
s AS (
  SELECT *, sum(st) OVER (PARTITION BY {key_col} ORDER BY {ts_col}{tie}) AS sess
  FROM b
)
SELECT {key_col}, min({ts_col}) AS session_start,
       make_timestamp(CAST(epoch_us(max({ts_col})) AS BIGINT) + {gap_us})
         AS session_end,
       count(*) AS n_events{val}
FROM s GROUP BY {key_col}, sess
"""


def funnel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    step_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered funnel: a key reaches step i when an event of ``steps[i]``
    occurs strictly after its step-(i-1) time (first qualifying occurrence
    counts).  Returns one row per step: ``step_idx, step_name, n_keys``
    — n_keys monotonically non-increasing down the funnel."""
    w = Window.partitionBy(key_col)
    cur = df.select(key_col, ts_col, step_col)
    prev_time = None
    time_cols = []
    for i, step in enumerate(steps):
        col = f"__t{i}"
        cond = F.col(step_col) == step
        if prev_time is not None:
            cond = cond & (F.col(ts_col) > F.col(prev_time))
        cur = cur.withColumn(col, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev_time = col
        time_cols.append(col)
    per_key = cur.groupBy(key_col).agg(
        *[F.min(c).alias(c) for c in time_cols]
    )
    counts = per_key.agg(
        *[
            F.count(F.col(c)).alias(f"__n{i}")
            for i, c in enumerate(time_cols)
        ]
    )
    rows = [
        F.struct(
            F.lit(i).alias("step_idx"),
            F.lit(step).alias("step_name"),
            F.col(f"__n{i}").alias("n_keys"),
        )
        for i, step in enumerate(steps)
    ]
    return counts.select(F.explode(F.array(*rows)).alias("s")).select(
        "s.step_idx", "s.step_name", "s.n_keys"
    )


def funnel_sql(
    table: str, key_col: str, ts_col: str, step_col: str, steps: list[str]
) -> str:
    """The identical funnel as DuckDB SQL (oracle twin) — chained window
    stages, then one aggregate, then unpivot via UNION ALL."""
    stages = [f"SELECT {key_col}, {ts_col}, {step_col} FROM {table}"]
    for i, step in enumerate(steps):
        cond = f"{step_col} = '{step}'"
        if i > 0:
            cond += f" AND {ts_col} > t{i - 1}"
        stages.append(
            f"SELECT *, min(CASE WHEN {cond} THEN {ts_col} END) "
            f"OVER (PARTITION BY {key_col}) AS t{i} FROM s{i}"
        )
    ctes = ",\n".join(
        f"s{i + 1} AS ({q})" for i, q in enumerate(stages[1:])
    )
    agg_cols = ", ".join(
        f"count(DISTINCT CASE WHEN t{i} IS NOT NULL THEN {key_col} END) AS n{i}"
        for i in range(len(steps))
    )
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS step_idx, '{s}' AS step_name, n{i} AS n_keys FROM agg"
        for i, s in enumerate(steps)
    )
    return f"""
WITH s0 AS ({stages[0]}),
{ctes},
agg AS (SELECT {agg_cols} FROM s{len(steps)})
{unions}
"""


def cohort_retention(
    df: DataFrame, key_col: str, ts_col: str, period_seconds: int = 604_800
) -> DataFrame:
    """Cohort x activity-period retention counts: cohort = the period of a
    key's first event; one row per (cohort_period, period_offset) with the
    number of distinct keys from that cohort active in that period."""
    period = F.lit(period_seconds)
    # floor, not cast-truncate: truncation rounds toward zero, which
    # disagrees with the oracle's floor() for pre-1970 timestamps
    bucket = lambda c: F.floor(F.unix_timestamp(c) / period).cast("long")  # noqa: E731
    # One per-key aggregate carries BOTH the first-seen time and the set of
    # active periods (collect_set is bounded by timeline/period — e.g. 520
    # entries for a decade of weeks — not by event volume), so the whole
    # matrix costs two shuffles: the per-key aggregate and the final
    # metadata-scale (cohort, offset) aggregate.
    per_key = df.groupBy(key_col).agg(
        bucket(F.min(ts_col)).alias("__c"),
        F.collect_set(bucket(F.col(ts_col))).alias("__ps"),
    )
    return (
        per_key.select(
            F.timestamp_seconds(F.col("__c") * period).alias("cohort_period"),
            F.explode("__ps").alias("__p"),
            F.col("__c"),
        )
        .select(
            "cohort_period", (F.col("__p") - F.col("__c")).alias("period_offset")
        )
        .groupBy("cohort_period", "period_offset")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )


def cohort_retention_sql(
    table: str, key_col: str, ts_col: str, period_seconds: int = 604_800
) -> str:
    p = period_seconds
    b = lambda e: f"CAST(floor(epoch({e}) / {p}) AS BIGINT)"  # noqa: E731
    return f"""
WITH first_seen AS (
  SELECT {key_col}, min({ts_col}) AS first_ts FROM {table} GROUP BY 1
),
active AS (
  SELECT DISTINCT {key_col}, {b(ts_col)} AS p FROM {table}
)
SELECT make_timestamp(({b('f.first_ts')}) * {p} * 1000000)
         AS cohort_period,
       a.p - {b('f.first_ts')} AS period_offset,
       count(*) AS n_keys
FROM active a JOIN first_seen f USING ({key_col})
GROUP BY 1, 2
"""


def rolling_time_window(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int = 604_800,
) -> DataFrame:
    """Per-event trailing time-RANGE aggregate: for every event, the count
    and exact decimal sum of the key's events in the preceding
    ``window_seconds`` (inclusive of now).  RANGE (not ROWS): the frame is
    defined by event-time distance, so it is insensitive to how many ties
    or how dense the feed is — ordered on epoch MICROseconds on both
    engines so boundary rows agree exactly."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(key_col)
        .orderBy(us)
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    return df.select(
        key_col,
        F.col(ts_col),
        F.count(F.lit(1)).over(w).alias("rolling_n"),
        F.round(
            F.sum(F.col(value_col).cast("decimal(28,10)")).over(w), 2
        )
        .cast("double")
        .alias("rolling_sum"),
    )


def rolling_time_window_sql(
    table: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int = 604_800,
) -> str:
    us = window_seconds * 1_000_000
    return f"""
SELECT {key_col}, {ts_col},
       count(*) OVER w AS rolling_n,
       CAST(round(sum(CAST({value_col} AS DECIMAL(28,10))) OVER w, 2) AS DOUBLE)
         AS rolling_sum
FROM {table}
WINDOW w AS (PARTITION BY {key_col} ORDER BY epoch_us({ts_col})
             RANGE BETWEEN {us} PRECEDING AND CURRENT ROW)
"""


def cooccurrence_pairs(
    df: DataFrame,
    key_col: str = "user_id",
    item_col: str = "event_type",
    k: int = 20,
) -> DataFrame:
    """Market-basket co-occurrence: for every unordered pair of item values,
    how many keys exhibit both (plus each item's solo key-reach, so lift /
    Jaccard derive downstream).

    Shape — NO fact self-join (the naive pair expansion joins the distinct
    (key, item) feed with itself, re-shuffling both sides): ONE shuffle
    collects each key's distinct item set (``collect_set`` dedups inside
    the aggregate, map-side partials bounded by the item vocabulary); the
    i<j pair expansion over the sorted set is a Catalyst HOF
    (transform-of-transform + flatten) — NARROW, fan-out t*(t-1)/2 per key
    with t <= |vocab| (event-type vocabularies are enumerable — tens, not
    millions).  The pair census and the per-item reach are then map-side-
    combining count shuffles over that bounded expansion, and the reach
    table (|vocab| rows) joins back by explicit broadcast.  3 shuffles
    total, none carrying more than vocab-bounded expansion.  Top-k carries
    a total order.
    """
    # materialized: feeds the pair census AND the reach census (without
    # the barrier each branch re-runs the collect_set shuffle); per-key rows
    # are vocab-bounded arrays, so the cache is ~|keys| * |vocab| small
    # NULL keys and NULL items are excluded EXPLICITLY on both engines: a
    # NULL key is not a basket and a NULL item is not a product.  Without
    # the filter the engines disagree — Spark's groupBy keeps NULL as a
    # real group (and collect_set drops NULL items) while the oracle's
    # equi-self-join drops NULL keys but its DISTINCT keeps NULL items.
    sets = materialized(
        df.filter(F.col(key_col).isNotNull() & F.col(item_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(F.array_sort(F.collect_set(F.col(item_col))).alias("items"))
    )
    a = F.col("items")
    pair_structs = F.flatten(
        F.transform(
            a,
            lambda x, i: F.transform(
                F.slice(a, i + F.lit(2), F.size(a)),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )
    pairs = (
        sets.select(F.explode(pair_structs).alias("p"))
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    reach = materialized(  # |vocab| rows, joined back twice
        sets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )
    out = (
        pairs.join(
            F.broadcast(
                reach.select(F.col("item").alias("item_a"), F.col("n_keys").alias("n_a"))
            ),
            "item_a",
        )
        .join(
            F.broadcast(
                reach.select(F.col("item").alias("item_b"), F.col("n_keys").alias("n_b"))
            ),
            "item_b",
        )
        .select(
            "item_a", "item_b", "n_both", "n_a", "n_b",
            # containment of the rarer item in the pair, fixed-point —
            # int64-safe at any scale (n_both <= min(n_a, n_b))
            F.expr("1000000 * n_both DIV least(n_a, n_b)").alias("containment_fp"),
        )
    )
    return out.orderBy(
        F.col("n_both").desc(), F.col("item_a").asc(), F.col("item_b").asc()
    ).limit(k)


def cooccurrence_pairs_sql(
    table: str = "events",
    key_col: str = "user_id",
    item_col: str = "event_type",
    k: int = 20,
) -> str:
    return f"""
WITH ki AS (
  SELECT DISTINCT {key_col} AS key, {item_col} AS item FROM {table}
  WHERE {key_col} IS NOT NULL AND {item_col} IS NOT NULL
),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_both
  FROM ki a JOIN ki b ON a.key = b.key AND a.item < b.item
  GROUP BY 1, 2
),
reach AS (
  SELECT item, count(*) AS n_keys FROM ki GROUP BY 1
)
SELECT item_a, item_b, n_both, ra.n_keys AS n_a, rb.n_keys AS n_b,
       1000000 * n_both // least(ra.n_keys, rb.n_keys) AS containment_fp
FROM pairs
JOIN reach ra ON ra.item = item_a
JOIN reach rb ON rb.item = item_b
ORDER BY n_both DESC, item_a ASC, item_b ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Peak concurrency: sweep-line over session intervals.


def peak_concurrency(
    sessions: DataFrame,
    start_col: str = "session_start",
    end_col: str = "session_end",
) -> DataFrame:
    """Per-day peak number of simultaneously open sessions — the classic
    sweep line: each session emits (+1 at start, -1 at end-exclusive),
    events sort by (time, delta DESC) so a session starting the instant
    another ends counts as overlapping, and the running sum's maximum is
    the answer.

    Scale shape: a GLOBAL sweep would be a single-partition sort, so the
    sweep is partitioned by day — each session is exploded into the days
    it touches and clipped to the day's bounds (the day boundary crossing
    contributes +1 at the next day's 00:00 via the clipped start, so a
    session open at midnight is counted in both days).  Cost: one shuffle
    on the day key + a per-day sort; day-count per session is bounded by
    session length, not stream length.

    Returns (day, peak) with day = timestamp-truncated day.

    Intervals are end-exclusive, so rows with ``end <= start`` are empty
    and are dropped before the day explode — without the guard, a stop day
    preceding the start day makes ``F.sequence`` throw "Illegal sequence
    boundaries" on raw (non-sessionize) interval inputs.
    """
    sessions = sessions.where(F.col(end_col) > F.col(start_col))
    days = sessions.withColumn(
        "day",
        F.explode(
            F.sequence(
                F.date_trunc("day", F.col(start_col)),
                F.date_trunc(
                    "day",
                    F.col(end_col) - F.expr("INTERVAL 1 MICROSECOND"),
                ),
                F.expr("INTERVAL 1 DAY"),
            )
        ),
    )
    clipped = days.select(
        "day",
        F.greatest(F.col(start_col), F.col("day")).alias("lo"),
        F.least(
            F.col(end_col), F.col("day") + F.expr("INTERVAL 1 DAY")
        ).alias("hi"),
    )
    deltas = clipped.select(
        "day", F.col("lo").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        clipped.select(
            "day", F.col("hi").alias("t"), F.lit(-1).alias("delta")
        )
    )
    w = (
        Window.partitionBy("day")
        .orderBy(F.col("t").asc(), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        deltas.withColumn("open", F.sum("delta").over(w))
        .groupBy("day")
        .agg(F.max("open").cast("long").alias("peak"))
    )


def peak_concurrency_sql(sessions_cte: str) -> str:
    """Oracle twin over a CTE body yielding (session_start, session_end).
    ``sessions_cte`` must be a complete WITH-able SELECT."""
    return f"""
WITH sess0 AS ({sessions_cte}),
sess AS (
  -- end-exclusive contract shared with the Spark side (ADVICE r04 #2):
  -- zero/negative-length intervals are empty and emit no deltas; without
  -- this filter a zero-length midday interval transiently raises the
  -- running sum under the (t ASC, delta DESC) sweep order.
  SELECT * FROM sess0 WHERE session_end > session_start
),
d AS (
  SELECT unnest(generate_series(
           date_trunc('day', session_start),
           date_trunc('day', session_end - INTERVAL 1 MICROSECOND),
           INTERVAL 1 DAY)) AS day,
         session_start, session_end
  FROM sess
),
clipped AS (
  SELECT day,
         greatest(session_start, day) AS lo,
         least(session_end, day + INTERVAL 1 DAY) AS hi
  FROM d
),
deltas AS (
  SELECT day, lo AS t, 1 AS delta FROM clipped
  UNION ALL
  SELECT day, hi AS t, -1 AS delta FROM clipped
),
swept AS (
  SELECT day,
         sum(delta) OVER (
           PARTITION BY day ORDER BY t ASC, delta DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS open
  FROM deltas
)
SELECT day, CAST(max(open) AS BIGINT) AS peak FROM swept GROUP BY day
"""


def funnel_conversion_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    step_col: str,
    steps: list[str],
) -> DataFrame:
    """Conversion-latency report for keys completing the WHOLE funnel:
    time from the first step's first qualifying event to the last step's.
    Same chained window stages as :func:`funnel`; the latency percentiles
    are the exact interpolated ``percentile`` (bit-equal to DuckDB's
    ``quantile_cont`` — the agg_percentiles precedent) over integer
    microsecond durations.  One row out."""
    w = Window.partitionBy(key_col)
    cur = df.select(key_col, ts_col, step_col)
    prev = None
    cols = []
    for i, step in enumerate(steps):
        col = f"__t{i}"
        cond = F.col(step_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        cur = cur.withColumn(col, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = col
        cols.append(col)
    per_key = cur.groupBy(key_col).agg(
        *[F.min(c).alias(c) for c in cols]
    )
    durs = per_key.where(F.col(cols[-1]).isNotNull()).select(
        (
            F.unix_micros(F.col(cols[-1]).cast("timestamp"))
            - F.unix_micros(F.col(cols[0]).cast("timestamp"))
        ).alias("dur_us")
    )
    return durs.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(dur_us, 0.5)"), 4).alias("p50_us"),
        F.round(F.expr("percentile(dur_us, 0.9)"), 4).alias("p90_us"),
        F.min("dur_us").alias("min_us"),
        F.max("dur_us").alias("max_us"),
    )


def funnel_conversion_stats_sql(
    table: str, key_col: str, ts_col: str, step_col: str, steps: list[str]
) -> str:
    """Oracle twin of :func:`funnel_conversion_stats`."""
    stages = [f"SELECT {key_col}, {ts_col}, {step_col} FROM {table}"]
    for i, step in enumerate(steps):
        cond = f"{step_col} = '{step}'"
        if i > 0:
            cond += f" AND {ts_col} > t{i - 1}"
        stages.append(
            f"SELECT *, min(CASE WHEN {cond} THEN {ts_col} END) "
            f"OVER (PARTITION BY {key_col}) AS t{i} FROM s{i}"
        )
    ctes = ",\n".join(
        f"s{i + 1} AS ({q})" for i, q in enumerate(stages[1:])
    )
    last = len(steps) - 1
    return f"""
WITH s0 AS ({stages[0]}),
{ctes},
per_key AS (
  SELECT {key_col}, min(t0) AS t_first, min(t{last}) AS t_last
  FROM s{len(steps)} GROUP BY {key_col}
),
durs AS (
  SELECT epoch_us(t_last) - epoch_us(t_first) AS dur_us
  FROM per_key WHERE t_last IS NOT NULL
)
SELECT count(*) AS n_converted,
       round(quantile_cont(dur_us, 0.5), 4) AS p50_us,
       round(quantile_cont(dur_us, 0.9), 4) AS p90_us,
       CAST(min(dur_us) AS BIGINT) AS min_us,
       CAST(max(dur_us) AS BIGINT) AS max_us
FROM durs
"""


def association_rules(
    df: DataFrame,
    key_col: str = "user_id",
    item_col: str = "event_type",
    min_both: int = 2,
    k: int = 20,
) -> DataFrame:
    """Directed association rules a -> b from the basket co-occurrence
    census: support (baskets with both), confidence (share of a-baskets
    that also hold b) and lift (co-occurrence vs independence), all in
    exact ppm fixed point — the market-basket / next-event-suggestion
    miner.  Each unordered co-occurring pair yields BOTH directions.

    Same scale shape as ``cooccurrence_pairs`` (one collect_set shuffle,
    vocab-bounded HOF pair expansion, broadcast reach join-back) plus a
    1-row basket-count scalar.  The lift numerator (1e6 * n_both *
    n_baskets ~ 1e6 * baskets^2) exceeds int64 past ~3e6 baskets, so it is
    widened to decimal(38,0) / HUGEINT on both engines before the integral
    divide (ADVICE r04 #3 — the gini/pareto decimal treatment); confidence
    stays int64 (1e6 * n_both <= 1e6 * baskets).  Output ordered
    (lift desc, conf desc, a, b), top ``k``.
    """
    sets = materialized(
        df.filter(F.col(key_col).isNotNull() & F.col(item_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(F.array_sort(F.collect_set(F.col(item_col))).alias("items"))
    )
    a = F.col("items")
    pair_structs = F.flatten(
        F.transform(
            a,
            lambda x, i: F.transform(
                F.slice(a, i + F.lit(2), F.size(a)),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )
    pairs = (
        sets.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.item_a").alias("item_a"),
                 F.col("p.item_b").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= min_both)
    )
    reach = (
        sets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )
    n_baskets = sets.agg(F.count(F.lit(1)).alias("__nb"))
    directed = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "n_both",
    ).unionAll(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "n_both",
        )
    )
    ra = reach.select(
        F.col("item").alias("antecedent"), F.col("n_keys").alias("__na")
    )
    rb = reach.select(
        F.col("item").alias("consequent"), F.col("n_keys").alias("__nc")
    )
    out = (
        directed.join(F.broadcast(ra), "antecedent")
        .join(F.broadcast(rb), "consequent")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "n_both",
            F.expr("1000000 * n_both DIV __na").alias("confidence_ppm"),
            # lift numerator is 1e6 * n_both * n_baskets ~ 1e6 * baskets^2:
            # int64 wraps silently past ~3e6 baskets (ADVICE r04 #3), so the
            # product rides decimal(38,0); Spark's DIV on decimal operands
            # still yields BIGINT, keeping the output schema long.
            F.expr(
                "(CAST(n_both AS DECIMAL(38,0)) * __nb * 1000000)"
                " DIV (CAST(__na AS DECIMAL(38,0)) * __nc)"
            ).alias("lift_ppm"),
        )
    )
    return out.orderBy(
        F.desc("lift_ppm"), F.desc("confidence_ppm"),
        "antecedent", "consequent",
    ).limit(k)


def association_rules_sql(
    table: str = "events",
    key_col: str = "user_id",
    item_col: str = "event_type",
    min_both: int = 2,
    k: int = 20,
) -> str:
    return f"""
WITH ki AS (
  SELECT DISTINCT {key_col} AS key, {item_col} AS item FROM {table}
  WHERE {key_col} IS NOT NULL AND {item_col} IS NOT NULL
),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_both
  FROM ki a JOIN ki b ON a.key = b.key AND a.item < b.item
  GROUP BY 1, 2
  HAVING count(*) >= {min_both}
),
reach AS (SELECT item, count(*) AS n_keys FROM ki GROUP BY 1),
nb AS (SELECT count(DISTINCT key) AS n_baskets FROM ki),
directed AS (
  SELECT item_a AS antecedent, item_b AS consequent, n_both FROM pairs
  UNION ALL
  SELECT item_b, item_a, n_both FROM pairs
)
SELECT antecedent, consequent, n_both,
       1000000 * n_both // ra.n_keys AS confidence_ppm,
       CAST(CAST(n_both AS HUGEINT) * nb.n_baskets * 1000000
            // (CAST(ra.n_keys AS HUGEINT) * rc.n_keys) AS BIGINT)
         AS lift_ppm
FROM directed
JOIN reach ra ON ra.item = antecedent
JOIN reach rc ON rc.item = consequent
CROSS JOIN nb
ORDER BY lift_ppm DESC, confidence_ppm DESC, antecedent, consequent
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# Marketing attribution: last-touch credit for conversion events.


def last_touch_attribution(
    df: DataFrame,
    touch_types: list[str],
    conversion_type: str = "purchase",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Last-touch attribution: every conversion event credits the user's
    most recent PRECEDING touch event (strictly earlier in the
    (ts, event_id) total order); conversions with no prior touch credit
    the 'none' channel.  Output: (attributed_type, n_conversions,
    revenue_cents) — exact-cent revenue per credited channel.

    Scale shape: ONE window partitioned by user (the carry-forward
    last-non-null over the per-user event order — no self-join, no
    per-conversion scan-back) + the channel rollup; both shuffles are on
    real keys, never a global sort.  The same plan is the first-touch
    variant with min instead of carry-forward.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col(type_col).isin(*touch_types), F.col(type_col)
    )
    attributed = (
        df.filter(F.col(key_col).isNotNull())
        .withColumn("__attr", F.last(touch, ignorenulls=True).over(w))
        .filter(F.col(type_col) == conversion_type)
    )
    return (
        attributed.groupBy(
            F.coalesce(F.col("__attr"), F.lit("none")).alias("attributed_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            # coalesce(0): a channel whose every conversion has NULL value
            # reports 0 cents, matching the streaming twin's running-sum
            # state (which adds 0 per NULL conversion — ADVICE r05)
            F.coalesce(
                F.sum(
                    F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast(
                        "decimal(38,0)"
                    )
                ).cast("long"),
                F.lit(0).cast("long"),
            ).alias("revenue_cents"),
        )
    )


def last_touch_attribution_sql(
    touch_types: list[str],
    conversion_type: str = "purchase",
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> str:
    """Oracle twin: DuckDB's IGNORE NULLS last_value over the identical
    total order and exclusive frame."""
    types = ", ".join(f"'{t}'" for t in touch_types)
    return f"""
WITH attr AS (
  SELECT {type_col}, {value_col},
         last_value(CASE WHEN {type_col} IN ({types}) THEN {type_col} END
                    IGNORE NULLS) OVER (
           PARTITION BY {key_col}
           ORDER BY {ts_col} ASC, {id_col} ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS a
  FROM {table}
  WHERE {key_col} IS NOT NULL
)
SELECT coalesce(a, 'none') AS attributed_type,
       count(*) AS n_conversions,
       coalesce(CAST(sum(CAST(floor({value_col} * 100 + 0.5) AS DECIMAL(38,0)))
            AS BIGINT), 0) AS revenue_cents
FROM attr
WHERE {type_col} = '{conversion_type}'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Gaps-and-islands: longest consecutive-day activity streak per user.


def activity_streaks(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Longest consecutive-day activity streak per user, reported as a
    histogram (streak_days, n_users) — the classic gaps-and-islands
    pattern: distinct active days per user, island key = day minus
    row_number days (constant within a consecutive run), longest run =
    max island size.

    Scale shape: the (user, day) distinct is the one data-scale shuffle;
    the row_number window and both rollups are partitioned by user (the
    histogram's group key is a small int).  No self-joins, no global
    sorts.
    """
    days = (
        df.filter(F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias("k"),
            F.date_trunc("day", F.col(ts_col)).alias("d"),
        )
        .distinct()
    )
    w = Window.partitionBy("k").orderBy("d")
    islands = days.withColumn(
        "__isl",
        F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
        - F.row_number().over(w),
    )
    runs = islands.groupBy("k", "__isl").agg(
        F.count(F.lit(1)).alias("__len")
    )
    longest = runs.groupBy("k").agg(F.max("__len").alias("streak_days"))
    return longest.groupBy("streak_days").agg(
        F.count(F.lit(1)).alias("n_users")
    )


def activity_streaks_sql(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> str:
    return f"""
WITH days AS (
  SELECT DISTINCT {key_col} AS k, date_trunc('day', {ts_col}) AS d
  FROM {table} WHERE {key_col} IS NOT NULL
),
isl AS (
  SELECT k,
         date_diff('day', DATE '1970-01-01', d)
           - row_number() OVER (PARTITION BY k ORDER BY d) AS i
  FROM days
),
runs AS (SELECT k, i, count(*) AS len FROM isl GROUP BY 1, 2),
longest AS (SELECT k, max(len) AS streak_days FROM runs GROUP BY 1)
SELECT CAST(streak_days AS BIGINT) AS streak_days,
       count(*) AS n_users
FROM longest GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Seasonality profile: day-of-week x hour activity fingerprint.


def seasonal_profile(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Event count + exact-cent value sum + portable average per
    (ISO day-of-week, hour) cell — the load/seasonality fingerprint that
    sizes capacity and anomaly baselines.  One hash aggregate over a
    168-cell key space (metadata-scale output); avg = decimal sum cast
    double / count, the engine-portable average discipline.
    """
    return (
        df.groupBy(
            (F.weekday(F.col(ts_col)) + 1).cast("long").alias("iso_dow"),
            F.hour(F.col(ts_col)).cast("long").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast(
                    "decimal(38,0)"
                )
            )
            .cast("long")
            .alias("value_cents"),
        )
        .withColumn(
            "avg_value",
            F.round(
                F.col("value_cents").cast("double")
                / F.col("n_events")
                / F.lit(100.0),
                6,
            ),
        )
    )


def seasonal_profile_sql(
    table: str = "events",
    ts_col: str = "ts",
    value_col: str = "value",
) -> str:
    return f"""
SELECT CAST(isodow({ts_col}) AS BIGINT) AS iso_dow,
       CAST(hour({ts_col}) AS BIGINT) AS hour,
       count(*) AS n_events,
       CAST(sum(CAST(floor({value_col} * 100 + 0.5) AS DECIMAL(38,0)))
            AS BIGINT) AS value_cents,
       round(CAST(CAST(sum(CAST(floor({value_col} * 100 + 0.5)
                            AS DECIMAL(38,0))) AS BIGINT) AS DOUBLE)
             / count(*) / 100.0, 6) AS avg_value
FROM {table}
GROUP BY 1, 2
"""
