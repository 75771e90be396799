"""Balanced shard export — the training-data delivery sink.

Large-corpus training jobs consume fixed-count shard sets (webdataset /
tfrecord convention): N roughly-equal shards, deterministic membership
(re-export reproduces byte-identical shard assignment), each shard a
self-contained file set a data-loader worker can own.

Design (100 TB):
  * membership is per-row hash arithmetic (the corpus-governance
    poly-hash, NOT a sort): narrow, reproducible on any cluster shape,
    and stable under re-runs — a global greedy bin-packing would need a
    driver-side sort of the corpus and would reassign everything when
    one document changes;
  * one shuffle: ``repartition(n_shards, shard)`` routes each shard to
    exactly one writer task, so a shard is one file (plus
    ``maxRecordsPerFile`` splits when a shard exceeds the configured
    file granularity);
  * the report (per-shard rows + weight sum) comes from the SAME
    assignment expression, so the manifest can never drift from the
    written layout.

Cites the reference's sink surface (MigrateTableTask.java:534-564 writes
row-at-a-time to one target table; sharded file export is the analytics
-engine extension of that sink family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import poly_hash

SHARD_COL = "shard"


def shard_assignment(id_col: Column, n_shards: int) -> Column:
    """Deterministic shard id in [0, n_shards): polynomial hash of the id
    rendered as a string (same family as the split/mix operators), mod
    n_shards.  Uniform in expectation; stable across runs and engines."""
    return (poly_hash(id_col.cast("string")) % F.lit(n_shards)).cast("int")


def write_sharded(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    max_records_per_file: int | None = None,
) -> DataFrame:
    """Write ``df`` as ``n_shards`` hash-assigned parquet shards under
    ``path`` (directory layout ``shard=K/``) and return the per-shard
    manifest (shard, n_rows) computed from the same assignment.

    The repartition on the shard id gives each shard one writer task ->
    one output file per shard (bounded by ``max_records_per_file`` when
    set), which is what a fixed-worker data-loader wants to own."""
    assigned = df.withColumn(SHARD_COL, shard_assignment(F.col(id_col), n_shards))
    writer = assigned.repartition(n_shards, F.col(SHARD_COL)).write.mode(
        "overwrite"
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.partitionBy(SHARD_COL).parquet(path)
    return (
        assigned.groupBy(SHARD_COL)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(SHARD_COL)
    )


def read_sharded(spark: SparkSession, path: str) -> DataFrame:
    """Read a shard set back; ``shard`` comes back as a partition column,
    so shard-pruned reads (`WHERE shard = K`) scan one directory."""
    return spark.read.parquet(path)
