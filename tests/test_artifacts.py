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


# --- Content/version keying (VERDICT r07 ask #4, ADVICE r07) ---------------

def _fake_fixture(tmp_path, name="fx"):
    """A minimal fixture dir: one 'parquet' file whose bytes we control
    (the token hashes stat metadata, never parquet internals)."""
    d = tmp_path / name
    d.mkdir()
    (d / "documents.parquet").write_bytes(b"v1" * 16)
    return str(d)


def test_corpus_mutation_changes_store_key_and_forces_rebuild(
    spark, store_root, tmp_path
):
    from cassandra_cql_streaming_db_migrator_spark.sinks.artifacts import (
        artifact_store,
        has_artifact,
        save_artifact,
    )

    fx = _fake_fixture(tmp_path)
    store1 = artifact_store(fx)
    save_artifact(
        spark.createDataFrame([(1,)], "x int"), store1, "trained_thing"
    )
    assert has_artifact(store1, "trained_thing")
    # Same content -> same store -> the serve path reuses the artifact.
    assert artifact_store(fx) == store1

    # Regenerate the corpus: contents (and size) change -> new token ->
    # a DIFFERENT store where the artifact is absent, so any *_from_
    # artifacts gate sees has_artifact() False and rebuilds.  A stale
    # index can never be served against the new corpus.
    with open(os.path.join(fx, "documents.parquet"), "wb") as f:
        f.write(b"v2-regenerated" * 16)
    store2 = artifact_store(fx)
    assert store2 != store1
    assert not has_artifact(store2, "trained_thing")


def test_content_token_is_metadata_only_and_deterministic(tmp_path):
    from cassandra_cql_streaming_db_migrator_spark.sinks.artifacts import (
        fixture_content_token,
    )

    fx = _fake_fixture(tmp_path)
    t1 = fixture_content_token(fx)
    t2 = fixture_content_token(fx)
    assert t1 == t2 and len(t1) == 12
    # Non-parquet files do not participate in the key (logs, checksums).
    (tmp_path / "fx" / "notes.txt").write_text("ignored")
    assert fixture_content_token(fx) == t1
    # A new table (new parquet name) does.
    (tmp_path / "fx" / "events.parquet").write_bytes(b"e")
    assert fixture_content_token(fx) != t1


def test_pid_reuse_adoption_still_registers_cleanup(store_root, tmp_path):
    # ADVICE r07: when the store dir ALREADY exists (pid reuse after a
    # dead process with the same pid), the open must still register the
    # atexit cleanup — the old dir-exists guard skipped it.
    from cassandra_cql_streaming_db_migrator_spark.sinks import artifacts

    fx = _fake_fixture(tmp_path, "fxreuse")
    token = artifacts.fixture_content_token(fx)
    slug_store = os.path.join(
        store_root,
        artifacts.re.sub(r"[^0-9a-z]+", "_", fx.lower()).strip("_")
        + f"_{token}_{os.getpid()}",
    )
    os.makedirs(slug_store)  # pre-existing: the pid-reuse shape
    artifacts._REGISTERED_STORES.discard(slug_store)
    opened = artifacts.artifact_store(fx)
    assert opened == slug_store
    assert slug_store in artifacts._REGISTERED_STORES
