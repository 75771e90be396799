"""Mergeability + boundedness tests for the streaming diversity sampler
(streaming.stream.streaming_cluster_sample_state, round 10).

The contract: per cluster the state holds the cap SMALLEST (salted-hash,
id) pairs — KMV's min-set shape — so the drained sample must equal the
batch ranker whatever the microbatch placement, and the state can never
exceed cap items per cluster no matter how many rows stream through.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from cassandra_cql_streaming_db_migrator_spark.functions.hashing import poly_hash
from cassandra_cql_streaming_db_migrator_spark.operators.clustering import (
    _assign,
    _lloyd_centroids,
)
from cassandra_cql_streaming_db_migrator_spark.sources.parquet import load_table
from cassandra_cql_streaming_db_migrator_spark.streaming.stream import (
    read_documents_stream_chunked,
    run_to_memory,
    streaming_cluster_sample_state,
)

CAP = 5  # tiny on purpose: every cluster overflows, truncation is live


def _drain(spark, valid, cents, chunk_expr):
    """Stream `valid` in the microbatch order pinned by chunk_expr and
    return the drained {cluster: (n_seen, [(h, id), ...])} map."""
    from pyspark.sql import Window as _W

    stream = read_documents_stream_chunked(
        spark,
        valid.withColumn("__chunk", chunk_expr),
        n_chunks=2,
        chunk_col="__chunk",
    )
    hv = poly_hash(F.concat(F.col("vec_id").cast("string"), F.lit("#scs")))
    rows = _assign(stream, cents, "embedding").select(
        F.col("__cid").alias("cluster_id"), hv.alias("hv"), "vec_id"
    )
    sketch = run_to_memory(
        streaming_cluster_sample_state(rows, cap=CAP), output_mode="update"
    )
    w = _W.partitionBy("cluster_id")
    final = sketch.withColumn("__mx", F.max("rev").over(w)).where(
        F.col("rev") == F.col("__mx")
    )
    return {
        r["cluster_id"]: (r["n_seen"], list(zip(r["hs"], r["ids"])))
        for r in final.collect()
    }


def test_drained_sample_is_microbatch_order_free(spark, sf_dir):
    """Pin two OPPOSITE ingest schedules (chunk_col, the ADVICE r08 #4
    discipline) — low ids first, then high ids first: k-min of a union
    is k-min of merged sets, so both drains must agree exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    valid = emb.where(
        F.col("embedding").isNotNull() & (F.size("embedding") > 0)
    )
    cents = _lloyd_centroids(
        valid.where(F.col("vec_id") % 10 != 0), 8, 2, "embedding", "vec_id"
    )
    split = (F.col("vec_id") % 2 == 0).cast("int")
    a = _drain(spark, valid, cents, split)
    b = _drain(spark, valid, cents, 1 - split)
    assert a == b


def test_state_stays_bounded_and_matches_batch_ranker(spark, sf_dir):
    """Every cluster's retained sample is exactly the batch top-CAP by
    (hash, id), and never more than CAP items even though the whole
    population streamed through."""
    emb = load_table(spark, sf_dir, "embeddings")
    valid = emb.where(
        F.col("embedding").isNotNull() & (F.size("embedding") > 0)
    )
    cents = _lloyd_centroids(
        valid.where(F.col("vec_id") % 10 != 0), 8, 2, "embedding", "vec_id"
    )
    drained = _drain(spark, valid, cents, (F.col("vec_id") % 2 == 0).cast("int"))

    hv = poly_hash(F.concat(F.col("vec_id").cast("string"), F.lit("#scs")))
    batch = (
        _assign(valid, cents, "embedding")
        .select(F.col("__cid").alias("cluster_id"), hv.alias("hv"), "vec_id")
        .collect()
    )
    by_cluster: dict[int, list[tuple[int, int]]] = {}
    for r in batch:
        by_cluster.setdefault(r["cluster_id"], []).append(
            (r["hv"], r["vec_id"])
        )
    for cid, items in by_cluster.items():
        n_seen, sample = drained[cid]
        assert n_seen == len(items)
        assert len(sample) <= CAP
        assert sample == sorted(items)[:CAP]
