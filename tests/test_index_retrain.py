"""Threshold-crossing + swap-protocol tests for the drift->retrain ACTION
loop (operators.clustering.index_retrain, VERDICT r09 ask #2).

The contract: measure occupancy drift FROM THE STANDING INDEX'S CODES;
at or below the declared threshold the store stays byte-untouched (pinned
by inode), above it the quantizer retrains on the CURRENT corpus, every
row is re-coded, and the triple swaps via the committed-next-then-swap
protocol (compact_streaming_index's crash discipline generalized to three
artifacts, codes-next as the gate).
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F

from cassandra_cql_streaming_db_migrator_spark.operators.clustering import (
    _coarse_centroids,
    build_index_triple,
    finish_index_retrain,
    index_retrain,
    pq_encode_frame,
    pq_train_assign,
)
from cassandra_cql_streaming_db_migrator_spark.queries.llm import (
    _drifted_corpus,
)
from cassandra_cql_streaming_db_migrator_spark.sinks.artifacts import (
    artifact_path,
    has_artifact,
    load_artifact,
)

M, K, SUB_DIM, N_CELLS = 4, 4, 16, 8


def _base_where():
    # built lazily: F.col needs an active session
    return F.col("vec_id") % 10 != 0


def _rows(df):
    return sorted(
        (r["vec_id"], r["cell"], r["cid0"], r["cid1"], r["cid2"], r["cid3"])
        for r in df.collect()
    )


def _file_ids(store, name):
    d = artifact_path(store, name)
    return sorted(
        (f, os.stat(os.path.join(d, f)).st_ino)
        for f in os.listdir(d)
        if os.path.isfile(os.path.join(d, f))
    )


def test_below_threshold_leaves_store_byte_untouched(spark, sf_dir, tmp_path):
    corpus = _drifted_corpus(spark, sf_dir)
    store = str(tmp_path / "rtr_store")
    os.makedirs(store)
    # first call builds the standing triple, then decides NO
    retrained, drift = index_retrain(
        spark, corpus, _base_where(), store, threshold_ppm=10**9, prefix="rtr"
    )
    assert retrained is False and drift > 0
    before = {
        n: _file_ids(store, f"rtr_{n}")
        for n in ("codes", "centroids", "codebooks")
    }
    retrained2, drift2 = index_retrain(
        spark, corpus, _base_where(), store, threshold_ppm=10**9, prefix="rtr"
    )
    assert retrained2 is False and drift2 == drift
    after = {
        n: _file_ids(store, f"rtr_{n}")
        for n in ("codes", "centroids", "codebooks")
    }
    assert after == before  # same files, same inodes — untouched


def test_above_threshold_retrains_to_train_on_full_contract(
    spark, sf_dir, tmp_path
):
    corpus = _drifted_corpus(spark, sf_dir)
    store = str(tmp_path / "rtr_store")
    os.makedirs(store)
    retrained, drift = index_retrain(
        spark, corpus, _base_where(), store, threshold_ppm=50_000, prefix="rtr"
    )
    assert retrained is True and drift > 50_000
    # no staged leftovers after the swap
    for part in ("codes", "centroids", "codebooks"):
        assert has_artifact(store, f"rtr_{part}")
        assert not os.path.exists(artifact_path(store, f"rtr_{part}_next"))

    # retrained codes == batch build trained on the FULL corpus
    _, books = pq_train_assign(corpus, "embedding", "vec_id", M, K, SUB_DIM)
    cell_ids, cvecs = _coarse_centroids(
        corpus, N_CELLS, "embedding", "vec_id", M, SUB_DIM
    )
    want = pq_encode_frame(
        corpus, books, cell_ids, cvecs, "embedding", "vec_id", M, SUB_DIM
    )
    got = load_artifact(spark, store, "rtr_codes")
    assert _rows(got) == _rows(want)

    # and != the base-trained codes (the retrain actually changed the
    # index — guards against a vacuous pass)
    _, books_b = pq_train_assign(
        corpus.where(_base_where()), "embedding", "vec_id", M, K, SUB_DIM
    )
    cell_ids_b, cvecs_b = _coarse_centroids(
        corpus.where(_base_where()), N_CELLS, "embedding", "vec_id", M, SUB_DIM
    )
    base_codes = pq_encode_frame(
        corpus, books_b, cell_ids_b, cvecs_b, "embedding", "vec_id", M,
        SUB_DIM,
    )
    assert _rows(got) != _rows(base_codes)


def test_threshold_boundary_is_strictly_greater_than(spark, sf_dir, tmp_path):
    corpus = _drifted_corpus(spark, sf_dir)
    store = str(tmp_path / "rtr_store")
    os.makedirs(store)
    _, drift = index_retrain(
        spark, corpus, _base_where(), store, threshold_ppm=10**9, prefix="rtr"
    )
    # drift == threshold: hold (<=); drift - 1: retrain (>)
    at, _ = index_retrain(
        spark, corpus, _base_where(), store, threshold_ppm=drift, prefix="rtr"
    )
    assert at is False
    over, _ = index_retrain(
        spark, corpus, _base_where(), store, threshold_ppm=drift - 1,
        prefix="rtr",
    )
    assert over is True


def test_interrupted_retrain_swap_recovers(spark, sf_dir, tmp_path):
    corpus = _drifted_corpus(spark, sf_dir)
    store = str(tmp_path / "rtr_store")
    os.makedirs(store)
    retrained, _ = index_retrain(
        spark, corpus, _base_where(), store, threshold_ppm=50_000, prefix="rtr"
    )
    assert retrained is True
    want = _rows(load_artifact(spark, store, "rtr_codes"))

    # crash window: the full staged triple is committed, nothing promoted
    for part in ("codes", "centroids", "codebooks"):
        shutil.move(
            artifact_path(store, f"rtr_{part}"),
            artifact_path(store, f"rtr_{part}_next"),
        )
    assert not has_artifact(store, "rtr_codes")
    assert finish_index_retrain(store, "rtr") is True
    for part in ("codes", "centroids", "codebooks"):
        assert has_artifact(store, f"rtr_{part}")
        assert not os.path.exists(artifact_path(store, f"rtr_{part}_next"))
    assert _rows(load_artifact(spark, store, "rtr_codes")) == want

    # partial crash: codes already promoted, centroids still staged —
    # re-running the finisher completes the rest (gate reopened by a
    # staged codes_next is the only way codes can still be pending)
    shutil.move(
        artifact_path(store, "rtr_centroids"),
        artifact_path(store, "rtr_centroids_next"),
    )
    shutil.copytree(
        artifact_path(store, "rtr_codes"),
        artifact_path(store, "rtr_codes_next"),
    )
    assert finish_index_retrain(store, "rtr") is True
    assert has_artifact(store, "rtr_centroids")
    assert not os.path.exists(artifact_path(store, "rtr_centroids_next"))
    assert _rows(load_artifact(spark, store, "rtr_codes")) == want


def test_orphan_staging_without_gate_is_dropped(spark, sf_dir, tmp_path):
    """A build that died BEFORE its codes-next gate commit leaves orphan
    staged centroids/codebooks: the finisher must drop them and keep the
    standing triple untouched."""
    corpus = _drifted_corpus(spark, sf_dir)
    store = str(tmp_path / "rtr_store")
    os.makedirs(store)
    build_index_triple(
        spark, corpus, corpus.where(_base_where()), store, "rtr",
        n_cells=N_CELLS,
    )
    want = _rows(load_artifact(spark, store, "rtr_codes"))
    before = _file_ids(store, "rtr_codes")

    shutil.copytree(
        artifact_path(store, "rtr_centroids"),
        artifact_path(store, "rtr_centroids_next"),
    )
    assert finish_index_retrain(store, "rtr") is False
    assert not os.path.exists(artifact_path(store, "rtr_centroids_next"))
    assert _file_ids(store, "rtr_codes") == before
    assert _rows(load_artifact(spark, store, "rtr_codes")) == want
