"""Event-analytics operator tests: sessionization (incl. parity with the
streaming session_window), funnel ordering, cohort retention, rolling
time-RANGE windows."""

from __future__ import annotations

from datetime import datetime
from decimal import Decimal

from pyspark.sql import Row

from cassandra_cql_streaming_db_migrator_spark.operators.events import (
    cohort_retention,
    funnel,
    rolling_time_window,
    sessionize,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return datetime(2024, 1, 1, minutes // 60, minutes % 60)


def test_sessionize_gap_splits(spark):
    rows = [
        Row(k=1, ts=_ts(0), v=1.0, eid=1),
        Row(k=1, ts=_ts(5), v=2.0, eid=2),    # same session (gap 10m)
        Row(k=1, ts=_ts(20), v=4.0, eid=3),   # 15m silence -> new session
        Row(k=2, ts=_ts(0), v=8.0, eid=4),
    ]
    out = sorted(
        sessionize(
            spark.createDataFrame(rows), "k", "ts", 600, value_col="v",
            tiebreak_col="eid",
        ).collect(),
        key=lambda r: (r.k, r.session_start),
    )
    assert len(out) == 3
    s1, s2, s3 = out
    assert (s1.k, s1.n_events, s1.sum_value) == (1, 2, 3.0)
    assert s1.session_start == _ts(0)
    assert s1.session_end == _ts(15)  # last event (t+5) + 10m gap
    assert (s2.k, s2.n_events, s2.session_start) == (1, 1, _ts(20))
    assert (s3.k, s3.n_events, s3.sum_value) == (2, 1, 8.0)


def test_sessionize_matches_streaming_session_window(spark, sf_dir):
    """The batch operator must agree row-for-row with Spark's streaming
    session_window on the same feed/gap — the batch-backfill +
    live-stream story depends on it."""
    from cassandra_cql_streaming_db_migrator_spark.sources.parquet import load_table
    from cassandra_cql_streaming_db_migrator_spark.streaming.stream import (
        read_events_stream,
        run_to_memory,
        session_window_agg,
    )

    batch = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in sessionize(
            load_table(spark, sf_dir, "events"), "user_id", "ts", 600,
            value_col="value",
        ).collect()
    }
    streamed = {
        (r.user_id, r.session_start, r.session_end): (
            r.n_events,
            float(round(Decimal(r.sum_value), 2)),
        )
        for r in run_to_memory(
            session_window_agg(read_events_stream(spark, sf_dir), "10 minutes")
        ).collect()
    }
    assert batch == streamed


def test_funnel_requires_order(spark):
    rows = [
        # user 1 completes the funnel in order
        Row(k=1, ts=_ts(0), e="signup"),
        Row(k=1, ts=_ts(1), e="click"),
        Row(k=1, ts=_ts(2), e="purchase"),
        # user 2 purchases BEFORE clicking: must not count as step 3
        Row(k=2, ts=_ts(0), e="signup"),
        Row(k=2, ts=_ts(1), e="purchase"),
        Row(k=2, ts=_ts(2), e="click"),
        # user 3 never signs up: counts nowhere despite clicking
        Row(k=3, ts=_ts(0), e="click"),
    ]
    out = {
        r.step_name: r.n_keys
        for r in funnel(
            spark.createDataFrame(rows), "k", "ts", "e",
            ["signup", "click", "purchase"],
        ).collect()
    }
    assert out == {"signup": 2, "click": 2, "purchase": 1}


def test_funnel_same_timestamp_not_after(spark):
    # strictly-after semantics: a simultaneous event does not advance
    rows = [Row(k=1, ts=_ts(0), e="signup"), Row(k=1, ts=_ts(0), e="click")]
    out = {
        r.step_name: r.n_keys
        for r in funnel(spark.createDataFrame(rows), "k", "ts", "e",
                        ["signup", "click"]).collect()
    }
    assert out == {"signup": 1, "click": 0}


def test_cohort_retention_offsets(spark):
    day = 86_400
    rows = [
        # key 1 first seen day 0, active day 0 and day 2
        Row(k=1, ts=datetime(2024, 1, 1)),
        Row(k=1, ts=datetime(2024, 1, 3)),
        # key 2 first seen day 2, active day 2 (same calendar day twice)
        Row(k=2, ts=datetime(2024, 1, 3, 1)),
        Row(k=2, ts=datetime(2024, 1, 3, 2)),
    ]
    out = {
        (r.cohort_period, r.period_offset): r.n_keys
        for r in cohort_retention(
            spark.createDataFrame(rows), "k", "ts", period_seconds=day
        ).collect()
    }
    assert out == {
        (datetime(2024, 1, 1), 0): 1,
        (datetime(2024, 1, 1), 2): 1,
        (datetime(2024, 1, 3), 0): 1,
    }


def test_rolling_time_window_boundaries(spark):
    rows = [
        Row(k=1, ts=_ts(0), v=1.0),
        Row(k=1, ts=_ts(30), v=2.0),
        Row(k=1, ts=_ts(90), v=4.0),  # 60m window: t=30 in range, t=0 out
    ]
    out = {
        r.ts: (r.rolling_n, r.rolling_sum)
        for r in rolling_time_window(
            spark.createDataFrame(rows), "k", "ts", "v", window_seconds=3600
        ).collect()
    }
    assert out[_ts(0)] == (1, 1.0)
    assert out[_ts(30)] == (2, 3.0)
    # RANGE frame is inclusive at the trailing edge: t=30 is exactly 60m
    # before t=90 and stays in the frame
    assert out[_ts(90)] == (2, 6.0)


def test_pit_enrich_respects_validity_intervals(spark):
    """Point-in-time semantics: each fact sees the dimension value whose
    SCD2 interval covers ITS timestamp — not the latest one."""
    from cassandra_cql_streaming_db_migrator_spark.operators.joins import asof_join
    from cassandra_cql_streaming_db_migrator_spark.operators.temporal import (
        build_scd2,
    )

    changes = spark.createDataFrame(
        [Row(k=1, ts=10, eid=1, tier=1), Row(k=1, ts=20, eid=2, tier=2)]
    )
    hist = build_scd2(changes, "k", "ts", "tier", "eid")
    facts = spark.createDataFrame(
        [Row(k=1, ts=5, fid=100),   # before any interval -> NULL
         Row(k=1, ts=10, fid=101),  # at the boundary -> tier 1 (inclusive)
         Row(k=1, ts=15, fid=102),  # inside interval 1
         Row(k=1, ts=25, fid=103)]  # open current interval -> tier 2
    )
    out = {
        r.fid: r.tier
        for r in asof_join(
            facts, hist.select("k", "valid_from", "tier"),
            keys=["k"], left_ts="ts", right_ts="valid_from",
            payload_cols=["tier"],
        ).collect()
    }
    assert out == {100: None, 101: 1, 102: 1, 103: 2}
