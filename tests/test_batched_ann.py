"""Batched ANN read paths (VERDICT r07 ask #3): each batched operator's
per-query slice must equal the single-query operator run for that query —
the batch is a serving optimization, never a semantics change."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def store_root(tmp_path, monkeypatch):
    root = str(tmp_path / "artifacts")
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", root)
    return root


def _emb(spark):
    from cassandra_cql_streaming_db_migrator_spark.sources.parquet import (
        load_table,
    )

    return load_table(spark, SF, "embeddings")


def test_lsh_batch_slice_equals_single_query(spark):
    from cassandra_cql_streaming_db_migrator_spark.operators.similarity import (
        lsh_ann_batch,
        lsh_ann_topk,
    )

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 4)
    batch = lsh_ann_batch(emb, queries, k=10, n_bits=6).collect()
    for qid in range(4):
        single = lsh_ann_topk(
            emb, emb.filter(F.col("vec_id") == qid), k=10, n_bits=6
        ).collect()
        got = sorted(
            (r["vec_id"], r["cosine"], r["rn"])
            for r in batch
            if r["query_id"] == qid
        )
        want = sorted(
            (r["vec_id"], r["cosine"], i + 1)
            for i, r in enumerate(
                sorted(single, key=lambda r: (-r["cosine"], r["vec_id"]))
            )
        )
        assert got == want, f"query {qid} diverged"


def test_graph_batch_slice_equals_single_query(spark):
    from cassandra_cql_streaming_db_migrator_spark.operators.caching import (
        materialized,
    )
    from cassandra_cql_streaming_db_migrator_spark.operators.similarity import (
        block_knn_edges,
        graph_beam_search,
        graph_beam_search_batch,
        ivf_cell_assign,
    )

    emb = _emb(spark)
    nodes = materialized(ivf_cell_assign(emb, n_cells=16))
    edges = materialized(block_knn_edges(nodes, k=3))
    queries = emb.filter(F.col("vec_id") < 3)
    batch = graph_beam_search_batch(
        nodes, edges, queries, k=10, beam=4, hops=3
    ).collect()
    for qid in range(3):
        single = graph_beam_search(
            nodes, edges, emb.filter(F.col("vec_id") == qid),
            k=10, beam=4, hops=3,
        ).collect()
        got = [
            (r["vec_id"], r["cosine"])
            for r in sorted(
                (r for r in batch if r["query_id"] == qid),
                key=lambda r: r["rn"],
            )
        ]
        want = [(r["vec_id"], r["cosine"]) for r in single]
        assert got == want, f"query {qid} walk diverged"


def test_ivf_pq_batch_slice_equals_single_query(spark, store_root):
    from cassandra_cql_streaming_db_migrator_spark.operators.clustering import (
        _query_vectors,
        ivf_pq_build,
        ivf_pq_serve,
        ivf_pq_serve_batch,
    )
    from cassandra_cql_streaming_db_migrator_spark.sinks.artifacts import (
        artifact_store,
    )

    emb = _emb(spark)
    store = artifact_store(SF)
    ivf_pq_build(emb, store, n_cells=8)
    queries = _query_vectors(emb, 4, "embedding", "vec_id", 4, 16)
    batch = ivf_pq_serve_batch(
        spark, store, queries, topk=10, n_probe=2
    ).collect()
    for qid, qv in queries:
        single = ivf_pq_serve(spark, store, qv, topk=10, n_probe=2).collect()
        got = [
            (r["vec_id"], r["cell"], r["adc_dist"])
            for r in sorted(
                (r for r in batch if r["query_id"] == qid),
                key=lambda r: r["rn"],
            )
        ]
        want = [(r["vec_id"], r["cell"], r["adc_dist"]) for r in single]
        assert got == want, f"query {qid} serve diverged"


def test_batch_outputs_k_rows_per_query(spark, store_root):
    from cassandra_cql_streaming_db_migrator_spark.operators.similarity import (
        lsh_ann_batch,
    )

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 8)
    out = lsh_ann_batch(emb, queries, k=10, n_bits=6)
    per_q = {
        r["query_id"]: r["n"]
        for r in out.groupBy("query_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(per_q) == set(range(8))
    assert all(n <= 10 for n in per_q.values())
