"""Trained-artifact persistence battery (VERDICT r06 ask #2): the parquet
round trip of every trained structure is value-exact, the serve paths
never retrain, and the store lifecycle follows the warehouse GC rules."""

from __future__ import annotations

import os

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def store_root(tmp_path, monkeypatch):
    root = str(tmp_path / "artifacts")
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", root)
    return root


def _emb(spark):
    from cassandra_cql_streaming_db_migrator_spark.sources.parquet import load_table

    return load_table(spark, SF, "embeddings")


def _docs(spark):
    from cassandra_cql_streaming_db_migrator_spark.sources.parquet import load_table

    return load_table(spark, SF, "documents")


# --- IVF-PQ ----------------------------------------------------------------

def test_ivf_pq_load_then_serve_equals_train_then_serve(spark, store_root):
    from cassandra_cql_streaming_db_migrator_spark.operators.clustering import (
        _query_vector,
        ivf_pq_ann,
        ivf_pq_build,
        ivf_pq_serve,
    )
    from cassandra_cql_streaming_db_migrator_spark.sinks.artifacts import (
        artifact_store,
    )

    emb = _emb(spark)
    inline = ivf_pq_ann(emb, query_id=0, topk=10, n_cells=8, n_probe=2)
    store = artifact_store(SF)
    ivf_pq_build(emb, store, n_cells=8)
    qv = _query_vector(emb, 0, "embedding", "vec_id", 4, 16)
    served = ivf_pq_serve(spark, store, qv, topk=10, n_probe=2)
    assert [tuple(r) for r in inline.collect()] == [
        tuple(r) for r in served.collect()
    ]
    assert inline.schema == served.schema


def test_ivf_pq_serve_does_not_train(spark, store_root, monkeypatch):
    from cassandra_cql_streaming_db_migrator_spark.operators import clustering
    from cassandra_cql_streaming_db_migrator_spark.sinks.artifacts import (
        artifact_store,
    )

    emb = _emb(spark)
    store = artifact_store(SF)
    clustering.ivf_pq_build(emb, store, n_cells=8)
    qv = clustering._query_vector(emb, 0, "embedding", "vec_id", 4, 16)

    def boom(*a, **k):
        raise AssertionError("serve path must not train")

    monkeypatch.setattr(clustering, "pq_train_assign", boom)
    out = clustering.ivf_pq_serve(spark, store, qv, topk=10, n_probe=2)
    assert len(out.collect()) == 10


def test_codebook_roundtrip_bit_exact(spark, store_root):
    from cassandra_cql_streaming_db_migrator_spark.sinks.artifacts import (
        artifact_store,
        load_pq_codebooks,
        save_pq_codebooks,
    )

    cents = [
        [[0.1, 0.2, 0.30000000000000004], [1.5, -2.25, 3.0]],
        [[7e-300, -1.1, 0.0], [0.3333333333333333, 2.0, 4.5]],
    ]
    store = artifact_store(SF)
    save_pq_codebooks(spark, store, cents)
    assert load_pq_codebooks(spark, store) == cents


# --- BPE tokenizer ----------------------------------------------------------

def test_bpe_tokenizer_roundtrip(spark, store_root):
    from cassandra_cql_streaming_db_migrator_spark.sinks.artifacts import (
        artifact_store,
        load_bpe_tokenizer,
        save_bpe_tokenizer,
    )

    merges = [(0, "a", "b", 10), (1, "ab", "c", 7)]
    vocab = [" ", "a", "b", "c"]
    store = artifact_store(SF)
    save_bpe_tokenizer(spark, store, merges, vocab)
    got_m, got_v = load_bpe_tokenizer(spark, store)
    assert got_m == merges
    assert got_v == vocab


# --- trigram LM --------------------------------------------------------------

def test_lm_saved_model_scores_equal_inline(spark, store_root):
    from cassandra_cql_streaming_db_migrator_spark.operators.textops import (
        trigram_lm_model,
        trigram_lm_score,
    )
    from cassandra_cql_streaming_db_migrator_spark.sinks.artifacts import (
        artifact_store,
        load_artifact,
        save_artifact,
    )

    docs = _docs(spark).limit(60)
    store = artifact_store(SF)
    save_artifact(trigram_lm_model(docs), store, "lm_test_model")
    model = load_artifact(spark, store, "lm_test_model")
    inline = {
        r["doc_id"]: (r["n_trigrams"], r["mean_tri_prob"])
        for r in trigram_lm_score(docs).collect()
    }
    served = {
        r["doc_id"]: (r["n_trigrams"], r["mean_tri_prob"])
        for r in trigram_lm_score(docs, model=model).collect()
    }
    assert inline == served


# --- store lifecycle ----------------------------------------------------------

def test_has_artifact_requires_commit_marker(spark, store_root):
    from cassandra_cql_streaming_db_migrator_spark.sinks.artifacts import (
        artifact_store,
        has_artifact,
    )

    store = artifact_store(SF)
    os.makedirs(os.path.join(store, "half_written"), exist_ok=True)
    assert not has_artifact(store, "half_written")
    assert not has_artifact(store, "never_written")


def test_store_open_reaps_dead_sibling(spark, store_root):
    from cassandra_cql_streaming_db_migrator_spark.sinks.artifacts import (
        artifact_store,
    )

    dead_pid = 2 ** 22 + 54321
    os.makedirs(os.path.join(store_root, f"stale_fixture_{dead_pid}"))
    live = artifact_store(SF)
    assert not os.path.isdir(os.path.join(store_root, f"stale_fixture_{dead_pid}"))
    assert os.path.isdir(live)


def test_store_is_fixture_and_pid_scoped(spark, store_root):
    from cassandra_cql_streaming_db_migrator_spark.sinks.artifacts import (
        artifact_store,
    )

    a = artifact_store("/root/testdata/sf0.001")
    b = artifact_store("/root/testdata/sf0.01")
    assert a != b
    assert a.endswith(f"_{os.getpid()}")
