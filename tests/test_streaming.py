"""Streaming-vs-batch agreement: a bounded stream fully processed in
complete mode must equal the batch computation (SURVEY §2.9 T8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_cql_streaming_db_migrator_spark.sources.parquet import load_table
from cassandra_cql_streaming_db_migrator_spark.streaming.stream import (
    read_events_stream,
    run_to_memory,
    streaming_dedup_counts,
    tumbling_window_agg,
)


def _as_sorted_tuples(rows):
    return sorted(tuple(r) for r in rows)


def test_tumbling_agg_equals_batch(spark, sf_dir):
    stream_out = run_to_memory(tumbling_window_agg(read_events_stream(spark, sf_dir), "1 hour"))
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)")).alias("sum_value"),
        )
        .select(F.col("window.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    assert _as_sorted_tuples(stream_out.collect()) == _as_sorted_tuples(batch.collect())


def test_streaming_dedup_equals_batch(spark, sf_dir):
    stream_out = run_to_memory(streaming_dedup_counts(read_events_stream(spark, sf_dir)))
    batch = (
        load_table(spark, sf_dir, "events")
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)")).alias("sum_value"),
        )
    )
    assert _as_sorted_tuples(stream_out.collect()) == _as_sorted_tuples(batch.collect())


def test_watermark_accepted_on_stream(spark, sf_dir):
    # wiring check: watermarked plan builds and runs (append-mode semantics
    # are production wiring; complete mode is the bounded-test path)
    agg = tumbling_window_agg(read_events_stream(spark, sf_dir), "1 hour", watermark="30 minutes")
    out = run_to_memory(agg)
    assert out.count() > 0
