"""Temporal / CDC table construction (SCD type-2 history).

The reference migrates *current-state* tables (one row per PK,
MigrateTableTask.java's read->transform->upsert loop).  A migration-adjacent
capability it lacks — and the standard warehouse pattern for "what did this
row look like on date X" — is the slowly-changing-dimension type-2 history:
collapse an event/change feed into validity intervals per key, with each
interval carrying the attribute value, its [valid_from, valid_to) bounds and
an is-current flag.

Shape: run-length encoding over time.  A "run" starts whenever the tracked
attribute differs from its predecessor (lag over the per-key time order);
the running count of run-starts is a per-key group id; one aggregate per
(key, run) yields the interval, and valid_to is the next interval's
valid_from (lead).  Two window passes + one aggregate over the SAME per-key
hash partitioning — Catalyst reuses the exchange, so the whole build is one
shuffle of the feed, which is the floor for any per-key history.

Determinism: the time order carries an id tiebreaker, so equal timestamps
produce a stable run assignment on any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_scd2(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse a change feed into SCD2 validity intervals per key.

    Returns one row per (key, attribute run): ``key, attr, valid_from,
    valid_to (NULL on the open interval), n_events, is_current``.
    """
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(key_col).orderBy(*order)
    runs = (
        df.select(key_col, ts_col, attr_col, tiebreak_col)
        .withColumn("__prev", F.lag(attr_col).over(w))
        .withColumn("__first", F.row_number().over(w) == 1)
        .withColumn(
            "__start",
            # null-SAFE change test: a value->NULL transition must start a
            # new run (a NULLed-out attribute is drift, not a continuation
            # — the silent-migration bug class), and NULL->NULL must NOT.
            # __prev alone can't flag the first row once NULL attrs are
            # legal, hence the explicit row_number test.
            F.when(
                F.col("__first")
                | ~F.col("__prev").eqNullSafe(F.col(attr_col)),
                1,
            ).otherwise(0),
        )
        .withColumn("__run", F.sum("__start").over(w))
    )
    # attr is constant within a run by construction; min() (not first())
    # keeps the aggregate order-insensitive on any partitioning.
    intervals = runs.groupBy(key_col, "__run").agg(
        F.min(attr_col).alias(attr_col),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_next = Window.partitionBy(key_col).orderBy("__run")
    return (
        intervals.withColumn("valid_to", F.lead("valid_from").over(w_next))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(key_col, attr_col, "valid_from", "valid_to", "n_events", "is_current")
    )


def build_scd2_sql(
    table: str, key_col: str, ts_col: str, attr_col: str, tiebreak_col: str
) -> str:
    """The identical interval build as DuckDB SQL (oracle twin)."""
    return f"""
WITH runs AS (
  SELECT {key_col}, {ts_col}, {attr_col}, {tiebreak_col},
         CASE WHEN row_number() OVER w = 1
                   OR lag({attr_col}) OVER w IS DISTINCT FROM {attr_col}
              THEN 1 ELSE 0 END AS st
  FROM {table}
  WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col}, {tiebreak_col})
),
grp AS (
  SELECT *, sum(st) OVER (PARTITION BY {key_col}
                          ORDER BY {ts_col}, {tiebreak_col}) AS run
  FROM runs
),
iv AS (
  SELECT {key_col}, run, min({attr_col}) AS {attr_col},
         min({ts_col}) AS valid_from, count(*) AS n_events
  FROM grp GROUP BY {key_col}, run
)
SELECT {key_col}, {attr_col}, valid_from,
       lead(valid_from) OVER (PARTITION BY {key_col} ORDER BY run) AS valid_to,
       n_events,
       lead(valid_from) OVER (PARTITION BY {key_col} ORDER BY run) IS NULL
         AS is_current
FROM iv
"""


def latest_by_key(
    df,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_cols: list[str],
):
    """CDC read-side compaction: the CURRENT row per key from a change feed
    — the read-path twin of the upsert sink (K1): a target table that was
    never materialized can be served as a view with exactly upsert-merge
    semantics (last writer per key wins, write order = (ts, tiebreak)).

    Shape: ONE pure hash aggregate — ``max_by`` over the same zero-padded
    (ts, tiebreak) order key the OHLC/gap-fill operators use, so there is
    no per-key window sort and no shuffle beyond the aggregate's state
    exchange; map-side partials reduce each partition to one candidate row
    per key before anything moves.  Contrast build_scd2, which keeps the
    full history: this keeps only the frontier.
    """
    from pyspark.sql import functions as F

    from .timeseries import ord_key

    base = df.select(
        key_col,
        ord_key(ts_col, tiebreak_col).alias("__ord"),
        F.col(ts_col).alias("__ts"),
        *value_cols,
    )
    aggs = [
        F.count(F.lit(1)).alias("n_versions"),
        F.expr("max_by(__ts, __ord)").alias("last_ts"),
    ]
    for c in value_cols:
        aggs.append(F.expr(f"max_by({c}, __ord)").alias(f"last_{c}"))
    return base.groupBy(key_col).agg(*aggs)


def latest_by_key_sql(
    table: str,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_cols: list[str],
) -> str:
    from .timeseries import ord_key_sql

    ok = ord_key_sql(ts_col, tiebreak_col)
    # NULL-proofing: DuckDB's arg_max SKIPS rows whose value argument is
    # NULL, but Spark's max_by returns the frontier row's value even when
    # that value is NULL — and a CDC feed setting a column to NULL is the
    # last write and must win.  Wrapping the value in a single-field struct
    # makes the argument non-NULL (the field inside may be NULL), aligning
    # arg_max with max_by exactly.
    last_cols = ",\n       ".join(
        f"arg_max(struct_pack(v := {c}), {ok}).v AS last_{c}"
        for c in value_cols
    )
    return f"""
SELECT {key_col}, count(*) AS n_versions,
       arg_max(struct_pack(v := {ts_col}), {ok}).v AS last_ts,
       {last_cols}
FROM {table}
GROUP BY {key_col}
"""
