"""Streaming table migration (SURVEY §2.9 T1-T5 as Structured Streaming).

The reference's whole executor — paged reads (T1), inter-page throttling
(T2), batch accumulation (T3), parallel writes (T4) — becomes one
``readStream -> transform -> foreachBatch(upsert)`` query:

  * microbatch == the reference's page/process-batch unit;
  * ``maxFilesPerTrigger`` / trigger intervals == pageSize +
    pauseMillisBetweenPages (source-side rate limiting / backpressure);
  * ``foreachBatch`` upsert-by-PK == the per-row UPDATE pool, minus the
    row-at-a-time RPCs;
  * checkpointing makes a crashed migration restartable from the last
    committed microbatch (the reference restarts from zero or overwrites).
    Delivery is effectively-once for the UPSERT path (replayed batches
    re-merge the same rows idempotently) and epoch-fenced for the COUNTER
    path (sinks.counter_merge_parquet records the last applied epoch and
    skips replays; only a crash inside the data-write/marker-write sliver
    still replays once — see its docstring).

The same table-migration spec (plans.spec.TableMigration) drives the
transform, so batch and streaming migrations share one definition — the
filter chain, computed columns and TTL arithmetic are identical code.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.compute import with_computed_columns
from ..operators.filters import apply_filter_chain, pushdown_filter
from ..operators.ttl import ttl_preserving_columns
from ..plans.spec import TableMigration
from ..sinks.sinks import counter_merge_parquet, upsert_parquet


def apply_migration_transform(stream: DataFrame, spec: TableMigration) -> DataFrame:
    """The spec's row pipeline on a streaming DataFrame (filters, computed
    columns, TTL) — anti-join/counter stages are batch-side concerns handled
    inside the sink's foreachBatch where both sides are bounded."""
    df = stream
    if spec.where_clause:
        df = pushdown_filter(df, spec.where_clause)
    df = apply_filter_chain(df, spec.filters)
    df = with_computed_columns(df, spec.calculated_columns)
    if spec.respect_ttl and spec.source_default_ttl and spec.target_default_ttl:
        df = ttl_preserving_columns(df, spec.source_default_ttl, spec.target_default_ttl)
    return df


def migrate_stream_to_parquet(
    stream: DataFrame,
    spec: TableMigration,
    target_path: str,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Run a streaming migration into a parquet target with upsert-by-PK
    semantics in ``foreachBatch`` (K1 for non-Cassandra sinks).  With
    ``available_now`` the query drains the bounded source and stops —
    the deterministic test mode; production drops that flag and sets a
    processing-time trigger."""
    transformed = apply_migration_transform(stream, spec)
    checkpoint = checkpoint_dir or tempfile.mkdtemp(prefix="migrate_ckpt_")

    def sink_batch(batch: DataFrame, epoch_id: int) -> None:
        if spec.simulate_only:
            batch.count()  # K5: execute fully, write nothing
            return
        if spec.counter_columns:
            # K3: counter tables merge additively, microbatch by microbatch,
            # epoch-fenced so a foreachBatch replay cannot double-count
            counter_merge_parquet(
                batch,
                target_path,
                spec.key_columns,
                spec.counter_columns,
                epoch_id=epoch_id,
            )
        else:
            upsert_parquet(batch, target_path, spec.key_columns)

    writer = (
        transformed.writeStream.foreachBatch(sink_batch)
        .option("checkpointLocation", checkpoint)
        .queryName(f"migrate_{spec.table_name}")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now:
        query.awaitTermination()
        query.stop()
    return query
