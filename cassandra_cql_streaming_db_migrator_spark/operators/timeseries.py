"""Time-series regularization: bucket resampling + gap filling with LOCF.

The hypertable operation the relational surface lacks: turn an irregular
event feed into a REGULAR per-key time grid — one row per (key, bucket)
even where no event happened — carrying the last observation forward into
the gaps.  Downstream consumers (training-feature windows, rate
monitors, chart backends) need the dense grid; computing it at query time
per consumer re-scans the feed, so it's an engine operator.

Shape (all built-ins, no Python):
  1. per-(key, bucket) last observation: ``max_by(value, (ts, tiebreak))``
     — a HASH aggregate with map-side partials (an order-desc window would
     sort; max_by folds),
  2. per-key span: min/max bucket over the output of (1) — aggregates the
     already-collapsed buckets, not the feed,
  3. the dense grid: ``explode(sequence(min_bucket, max_bucket, step))``,
  4. grid LEFT JOIN observations ON (key, bucket), then LOCF:
     ``last(value, ignoreNulls) over (partition key order bucket)``.

Cost: the feed shuffles once (into the (key, bucket) aggregate); the
grid-side join and the LOCF window shuffle only grid rows (keys x buckets,
already collapsed).  Grid size is bounded by span/step per key — callers
pick ``step`` so keys x buckets stays proportional to the real data, the
same contract as any resample.

Determinism: (ts, tiebreak) is unique per key, so ``max_by`` over the
struct is total-ordered; LOCF copies values (no float arithmetic) — the
output is a pure function of the data on any partitioning/engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# DuckDB's arg_min/arg_max and Spark's min_by/max_by need ONE orderable
# key; the (event-time, tiebreak) pair rides a zero-padded string.  Both
# components are biased by 2^62 so negative values (pre-epoch timestamps,
# negative ids) still order lexicographically == numerically — an unbiased
# '%020d' renders -2 as '-0…2', which sorts AFTER '-0…1' and silently
# swaps open/close.  Domain: |epoch_us| and |tiebreak| < 2^62 (i.e. any
# realistic timestamp, ids below ~4.6e18).  ONE definition, shared by the
# batch OHLC, the streaming OHLC twin, and the gap-fill oracle — parity
# depends on these never drifting apart.
ORD_KEY_BIAS = 1 << 62


def ord_key(ts_col: str, tiebreak_col: str) -> Column:
    """Total-order string key over (event-time micros, tiebreak).

    NULL-safe: a NULL ts or tiebreak yields a NULL key on BOTH engines, so
    min_by/max_by and arg_min/arg_max alike SKIP the row for frontier
    election (it still counts in count/min/max aggregates).  Without the
    explicit guard Spark's format_string renders NULL as the literal
    string 'null' while DuckDB's printf propagates NULL — the engines
    would elect different frontiers on any feed with NULL event times."""
    raw = F.format_string(
        "%020d#%020d",
        F.unix_micros(F.col(ts_col).cast("timestamp")) + F.lit(ORD_KEY_BIAS),
        F.col(tiebreak_col) + F.lit(ORD_KEY_BIAS),
    )
    return F.when(
        F.col(ts_col).isNotNull() & F.col(tiebreak_col).isNotNull(), raw
    )


def ord_key_sql(ts_expr: str, tb_expr: str) -> str:
    """The identical key as DuckDB SQL."""
    return (
        f"printf('%020d#%020d', epoch_us({ts_expr}) + {ORD_KEY_BIAS}, "
        f"{tb_expr} + {ORD_KEY_BIAS})"
    )


def gap_fill_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    step_seconds: int = 21600,
) -> DataFrame:
    """Dense per-key grid at ``step_seconds`` resolution from the first to
    the last observed bucket of each key, values LOCF-filled.  Returns
    ``key, bucket_ts, value_locf, n_obs, is_gap`` (is_gap: no observation
    in that bucket)."""
    step = F.lit(step_seconds)
    bucket = F.timestamp_seconds(
        (F.unix_timestamp(F.col(ts_col)) / step).cast("long") * step
    )
    obs = (
        df.select(
            F.col(key_col),
            bucket.alias("bucket_ts"),
            F.col(value_col),
            F.col(ts_col),
            F.col(tiebreak_col),
        )
        .groupBy(key_col, "bucket_ts")
        .agg(
            F.max_by(value_col, F.struct(ts_col, tiebreak_col)).alias("__last"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )
    spans = obs.groupBy(key_col).agg(
        F.min("bucket_ts").alias("__lo"), F.max("bucket_ts").alias("__hi")
    )
    grid = spans.select(
        key_col,
        F.explode(
            F.expr(f"sequence(__lo, __hi, interval {step_seconds} seconds)")
        ).alias("bucket_ts"),
    )
    w = Window.partitionBy(key_col).orderBy("bucket_ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        grid.join(obs, [key_col, "bucket_ts"], "left")
        .select(
            key_col,
            "bucket_ts",
            F.last("__last", ignorenulls=True).over(w).alias("value_locf"),
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
            F.col("__last").isNull().alias("is_gap"),
        )
    )


def gap_fill_locf_sql(
    table: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    step_seconds: int = 21600,
) -> str:
    """The identical grid build as DuckDB SQL (oracle twin).  DuckDB's
    ``epoch()`` is fractional seconds; ``CAST(... AS BIGINT)`` after the
    division floors exactly like Spark's integer ``unix_timestamp`` fold
    for post-1970 data.  DuckDB's ``arg_max`` takes no composite key, so
    the (ts, tiebreak) order rides a zero-padded string — lexicographic on
    '%020d#%020d' equals numeric order on the pair for non-negatives.
    The value arg is struct-wrapped: DuckDB arg_max SKIPS NULL value args
    while Spark max_by returns the frontier row's value even when NULL —
    the struct (non-NULL, NULL-able field) aligns the two."""
    return f"""
WITH obs AS (
  SELECT {key_col},
         make_timestamp(CAST(floor(epoch({ts_col}) / {step_seconds}) AS BIGINT)
                        * {step_seconds} * 1000000) AS bucket_ts,
         arg_max(struct_pack(v := {value_col}),
                 {ord_key_sql(ts_col, tiebreak_col)}).v
           AS last_v,
         count(*) AS n_obs
  FROM {table}
  GROUP BY 1, 2
),
spans AS (
  SELECT {key_col}, min(bucket_ts) AS lo, max(bucket_ts) AS hi
  FROM obs GROUP BY 1
),
grid AS (
  SELECT {key_col},
         unnest(generate_series(lo, hi, INTERVAL {step_seconds} SECONDS))
           AS bucket_ts
  FROM spans
)
SELECT g.{key_col}, g.bucket_ts,
       last_value(o.last_v IGNORE NULLS) OVER (
         PARTITION BY g.{key_col} ORDER BY g.bucket_ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf,
       coalesce(o.n_obs, 0) AS n_obs,
       o.last_v IS NULL AS is_gap
FROM grid g LEFT JOIN obs o
  ON g.{key_col} = o.{key_col} AND g.bucket_ts = o.bucket_ts
"""


def ohlc_downsample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    bucket_seconds: int = 21_600,
) -> DataFrame:
    """Open/high/low/close + volume per (key, time bucket) — the canonical
    downsample for a numeric event feed (market bars, sensor rollups,
    metric compaction before retention).

    Shape: ONE pure hash aggregate (one shuffle, map-side partials, no
    sort): open/close are ``min_by``/``max_by`` over a zero-padded
    "(us, tiebreak)" string key — the same total-order encoding
    :func:`gap_fill_locf` uses — so there is no per-bucket row_number
    sort.  Determinism: (ts, tiebreak) is unique per key, making
    min_by/max_by total-ordered; high/low/volume are order-insensitive.
    Values are rounded at 6 (per-row round of a double — deterministic
    given identical input bits).
    """
    bus = bucket_seconds * 1_000_000
    base = df.select(
        key_col,
        F.col(value_col).alias("__v"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us"),
        ord_key(ts_col, tiebreak_col).alias("__ord"),
    ).withColumn("__bucket", F.expr(f"__us DIV {bus}"))
    return (
        base.groupBy(key_col, "__bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.expr("min_by(__v, __ord)"), 6).alias("open"),
            F.round(F.max("__v"), 6).alias("high"),
            F.round(F.min("__v"), 6).alias("low"),
            F.round(F.expr("max_by(__v, __ord)"), 6).alias("close"),
        )
        .select(
            key_col,
            F.col("__bucket").alias("bucket_id"),
            "n_events",
            "open",
            "high",
            "low",
            "close",
        )
    )


def ohlc_downsample_sql(
    table: str,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    bucket_seconds: int = 21_600,
) -> str:
    """The identical downsample as DuckDB SQL (oracle twin)."""
    bus = bucket_seconds * 1_000_000
    return f"""
WITH b AS (
  SELECT {key_col}, {value_col} AS v,
         epoch_us({ts_col}) // {bus} AS bucket_id,
         {ord_key_sql(ts_col, tiebreak_col)} AS ord_key
  FROM {table}
)
SELECT {key_col}, bucket_id, count(*) AS n_events,
       round(arg_min(struct_pack(v := v), ord_key).v, 6) AS open,
       round(max(v), 6) AS high,
       round(min(v), 6) AS low,
       round(arg_max(struct_pack(v := v), ord_key).v, 6) AS close
FROM b
GROUP BY {key_col}, bucket_id
"""
