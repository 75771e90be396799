"""Streaming queries (SURVEY §2.9 T1-T4 subsumed, T8 exposed).

Each query runs a real Structured Streaming pipeline (file stream ->
stateful aggregate -> memory sink, availableNow trigger) to completion and
returns the result, so the oracle checks end-to-end streaming semantics
against batch SQL — valid because a bounded stream fully processed must
agree with the batch computation (complete output mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.stream import (
    read_events_stream,
    run_to_memory,
    streaming_dedup_counts,
    tumbling_window_agg,
)
from . import QueryDef


def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    return run_to_memory(tumbling_window_agg(events, "1 hour"))


_STREAM_TUMBLING_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       sum(CAST(value AS DECIMAL(28,10))) AS sum_value
FROM events GROUP BY 1, 2
"""


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    return run_to_memory(streaming_dedup_counts(events))


_STREAM_DEDUP_SQL = """
WITH deduped AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_id ORDER BY event_id) AS rn
  FROM events)
SELECT event_type, count(*) AS n_events,
       sum(CAST(value AS DECIMAL(28,10))) AS sum_value
FROM deduped WHERE rn = 1 GROUP BY event_type
"""


QUERIES = [
    QueryDef("stream_tumbling_agg", stream_tumbling_agg, _STREAM_TUMBLING_SQL,
             "T8: event-time tumbling window agg via Structured Streaming",
             bench=False),
    QueryDef("stream_dedup", stream_dedup, _STREAM_DEDUP_SQL,
             "T8: stateful streaming dedup + counts", bench=False),
]
