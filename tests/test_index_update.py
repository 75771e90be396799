"""Parity + lifecycle tests for the LIVE index-maintenance loop
(streaming.stream.streaming_index_update, VERDICT r07 ask #8 / r08 ask #1c).

The contract under test is the production crawl-ingest shape: the PQ
quantizer trains ONCE on the base corpus, arrivals are coded per
microbatch with the SAVED quantizer, and the drained merged index must
equal the batch rebuild "train on base, code the union" row-for-row —
the same standard every other streaming twin in the repo is pinned to
(stream_cdc_latest == cdc_latest, stream_hist_quantiles == the batch
histogram, ...).
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
import pytest

from cassandra_cql_streaming_db_migrator_spark.operators.clustering import (
    _coarse_centroids,
    pq_encode_frame,
    pq_train_assign,
)
from cassandra_cql_streaming_db_migrator_spark.sinks.artifacts import (
    artifact_store,
    has_artifact,
)
from cassandra_cql_streaming_db_migrator_spark.sources.parquet import load_table
from cassandra_cql_streaming_db_migrator_spark.streaming.stream import (
    streaming_index_update,
)

M, K, SUB_DIM, N_CELLS = 4, 4, 16, 8


def _splits(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 10 != 0)
    arrivals = emb.where(F.col("vec_id") % 10 == 0)
    return emb, base, arrivals


def _rows(df):
    return sorted(
        (r["vec_id"], r["cell"], r["cid0"], r["cid1"], r["cid2"], r["cid3"])
        for r in df.collect()
    )


def test_streaming_index_equals_batch_train_on_base(spark, sf_dir, tmp_path):
    """Drained merged index == batch 'train on base, code the union':
    the r7-ask done-criterion the round-8 ship skipped (VERDICT r08
    what's-wrong #1)."""
    emb, base, arrivals = _splits(spark, sf_dir)
    store = str(tmp_path / "sidx_store")
    os.makedirs(store)

    merged = streaming_index_update(
        spark, base=base, arrivals=arrivals, store=store,
        n_cells=N_CELLS, m=M, k=K, sub_dim=SUB_DIM,
    )

    # batch contract: quantizer from BASE only, every row coded with it
    frame, cents = pq_train_assign(base, "embedding", "vec_id", M, K, SUB_DIM)
    cell_ids, cvecs = _coarse_centroids(
        base, N_CELLS, "embedding", "vec_id", M, SUB_DIM
    )
    batch = pq_encode_frame(
        emb, cents, cell_ids, cvecs, "embedding", "vec_id", M, SUB_DIM
    )

    assert _rows(merged) == _rows(batch)


def test_arrival_codes_use_saved_quantizer_not_a_retrain(
    spark, sf_dir, tmp_path
):
    """The arrivals' codes must come from the BASE-trained quantizer —
    a per-batch retrain (the anti-pattern the query exists to rule out)
    would train on arrival rows and code them differently."""
    emb, base, arrivals = _splits(spark, sf_dir)
    store = str(tmp_path / "sidx_store")
    os.makedirs(store)

    merged = streaming_index_update(
        spark, base=base, arrivals=arrivals, store=store,
        n_cells=N_CELLS, m=M, k=K, sub_dim=SUB_DIM,
    )
    arrival_part = merged.where(F.col("vec_id") % 10 == 0)

    _, cents = pq_train_assign(base, "embedding", "vec_id", M, K, SUB_DIM)
    cell_ids, cvecs = _coarse_centroids(
        base, N_CELLS, "embedding", "vec_id", M, SUB_DIM
    )
    expected = pq_encode_frame(
        arrivals, cents, cell_ids, cvecs, "embedding", "vec_id", M, SUB_DIM
    )
    assert _rows(arrival_part) == _rows(expected)

    # and a retrain-on-arrivals would NOT reproduce them (guards against
    # the test passing vacuously because both quantizers coincide)
    _, cents_a = pq_train_assign(arrivals, "embedding", "vec_id", M, K, SUB_DIM)
    retrained = pq_encode_frame(
        arrivals, cents_a, cell_ids, cvecs, "embedding", "vec_id", M, SUB_DIM
    )
    assert _rows(arrival_part) != _rows(retrained)


def test_rerun_in_same_store_does_not_double_append(spark, sf_dir, tmp_path):
    """A second drain against the SAME store must overwrite last run's
    arrival codes, not stack them (the state['first'] overwrite-then-
    append discipline in code_batch)."""
    emb, base, arrivals = _splits(spark, sf_dir)
    store = str(tmp_path / "sidx_store")
    os.makedirs(store)

    first = streaming_index_update(
        spark, base=base, arrivals=arrivals, store=store,
        n_cells=N_CELLS, m=M, k=K, sub_dim=SUB_DIM,
    )
    # materialize run 1's rows BEFORE run 2: the second drain's overwrite
    # replaces the arrival-code files run 1's lazy plan still references
    first_rows = _rows(first)
    second = streaming_index_update(
        spark, base=base, arrivals=arrivals, store=store,
        n_cells=N_CELLS, m=M, k=K, sub_dim=SUB_DIM,
    )
    assert _rows(second) == first_rows


def test_fixture_token_change_forces_streaming_index_retrain(
    spark, sf_dir, tmp_path
):
    """VERDICT r08 ask #6 (retrain half): the streaming index is keyed by
    the store's fixture content token, so regenerating the corpus must
    route the NEXT run to a fresh store with no sidx_* artifacts — a
    stale quantizer can never code a new corpus version's arrivals."""
    fixture = str(tmp_path / "fixture")
    os.makedirs(fixture)
    src = os.path.join(sf_dir, "embeddings.parquet")
    dst = os.path.join(fixture, "embeddings.parquet")
    (shutil.copytree if os.path.isdir(src) else shutil.copyfile)(src, dst)

    store1 = artifact_store(fixture)
    emb, base, arrivals = _splits(spark, fixture)
    streaming_index_update(
        spark, base=base, arrivals=arrivals, store=store1,
        n_cells=N_CELLS, m=M, k=K, sub_dim=SUB_DIM,
    )
    assert has_artifact(store1, "sidx_codes")
    assert has_artifact(store1, "sidx_centroids")

    # regenerate the corpus: bump one data file's mtime (what a rewrite
    # does even when sizes coincide)
    target = dst
    if os.path.isdir(dst):
        parts = [p for p in os.listdir(dst) if p.endswith(".parquet")]
        target = os.path.join(dst, sorted(parts)[0])
    st = os.stat(target)
    os.utime(target, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))

    store2 = artifact_store(fixture)
    assert store2 != store1
    assert not has_artifact(store2, "sidx_codes")
    assert not has_artifact(store2, "sidx_centroids")
    assert not has_artifact(store2, "sidx_codebooks")


# ---------------------------------------------------------------------------
# Compaction (VERDICT r08 ask #6): fold arrival codes into the base artifact
# behind a crash-safe committed-next-then-swap, idempotently.


def test_compaction_folds_arrivals_and_is_idempotent(spark, sf_dir, tmp_path):
    from cassandra_cql_streaming_db_migrator_spark.sinks.artifacts import (
        load_artifact,
    )
    from cassandra_cql_streaming_db_migrator_spark.streaming.stream import (
        compact_streaming_index,
    )

    emb, base, arrivals = _splits(spark, sf_dir)
    store = str(tmp_path / "sidx_store")
    os.makedirs(store)
    merged = streaming_index_update(
        spark, base=base, arrivals=arrivals, store=store,
        n_cells=N_CELLS, m=M, k=K, sub_dim=SUB_DIM,
    )
    want = _rows(merged)

    assert compact_streaming_index(spark, store) is True
    assert not has_artifact(store, "sidx_arrival_codes")
    assert not has_artifact(store, "sidx_codes_next")
    # the compacted base artifact hash-equals the pre-compaction union
    assert _rows(load_artifact(spark, store, "sidx_codes")) == want
    # nothing left to fold: second compact is a no-op
    assert compact_streaming_index(spark, store) is False

    # RE-STREAMED arrivals after a compaction must not duplicate rows in
    # the compacted artifact: the anti-join-by-id merge makes re-folding
    # byte-identical codes a no-op (the saved quantizer is deterministic)
    streaming_index_update(
        spark, base=base, arrivals=arrivals, store=store,
        n_cells=N_CELLS, m=M, k=K, sub_dim=SUB_DIM,
    )
    assert compact_streaming_index(spark, store) is True
    assert _rows(load_artifact(spark, store, "sidx_codes")) == want


def test_interrupted_compaction_swap_recovers(spark, sf_dir, tmp_path):
    # Crash window: sidx_codes_next committed, old sidx_codes already
    # removed.  Both compact_streaming_index and streaming_index_update
    # must finish the swap instead of treating the index as missing.
    import shutil as _sh

    from cassandra_cql_streaming_db_migrator_spark.sinks.artifacts import (
        artifact_path,
        load_artifact,
    )
    from cassandra_cql_streaming_db_migrator_spark.streaming.stream import (
        compact_streaming_index,
    )

    emb, base, arrivals = _splits(spark, sf_dir)
    store = str(tmp_path / "sidx_store")
    os.makedirs(store)
    merged = streaming_index_update(
        spark, base=base, arrivals=arrivals, store=store,
        n_cells=N_CELLS, m=M, k=K, sub_dim=SUB_DIM,
    )
    want = _rows(merged)
    assert compact_streaming_index(spark, store) is True

    # simulate the interruption: the committed compacted artifact exists
    # under the next name, the live name is gone
    _sh.move(
        artifact_path(store, "sidx_codes"),
        artifact_path(store, "sidx_codes_next"),
    )
    assert not has_artifact(store, "sidx_codes")
    assert compact_streaming_index(spark, store) is False  # recovery path
    assert has_artifact(store, "sidx_codes")
    assert not has_artifact(store, "sidx_codes_next")
    assert _rows(load_artifact(spark, store, "sidx_codes")) == want
