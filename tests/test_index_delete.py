"""Tombstone-delete protocol tests for the streaming index's last CRUD
letter (streaming.stream.streaming_index_cdc + the tombstone-aware
compaction, round 10).

The contract under test: an op-typed CDC stream maintains the index
per microbatch (upserts code-and-append with the saved base-trained
quantizer, deletes append id-only tombstones); the serve view is
(base ∪ arrivals) ANTI JOIN tombstones with TOMBSTONE-WINS semantics —
order-free across microbatch placements and idempotent under replay —
and compaction makes the logical deletes physical inside the same
committed swap that consumes the tombstone artifact.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from cassandra_cql_streaming_db_migrator_spark.operators.clustering import (
    _coarse_centroids,
    pq_encode_frame,
    pq_train_assign,
)
from cassandra_cql_streaming_db_migrator_spark.sinks.artifacts import (
    artifact_path,
    has_artifact,
    load_artifact,
    save_artifact,
)
from cassandra_cql_streaming_db_migrator_spark.sources.parquet import load_table
from cassandra_cql_streaming_db_migrator_spark.streaming.stream import (
    _finish_sidx_compaction,
    compact_streaming_index,
    streaming_index_cdc,
)

M, K, SUB_DIM, N_CELLS = 4, 4, 16, 8


def _splits(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 10 != 0)
    ups = emb.where(F.col("vec_id") % 10 == 0).withColumn("op", F.lit("u"))
    return emb, base, ups


def _dels(emb, where):
    return emb.where(where).withColumn("op", F.lit("d"))


def _rows(df):
    return sorted(
        (r["vec_id"], r["cell"], r["cid0"], r["cid1"], r["cid2"], r["cid3"])
        for r in df.collect()
    )


def _ids(df):
    return sorted(r["vec_id"] for r in df.select("vec_id").collect())


def _store(tmp_path):
    store = str(tmp_path / "cdc_store")
    os.makedirs(store)
    return store


def test_serve_view_is_union_minus_deletes(spark, sf_dir, tmp_path):
    """Drained view ids == (base ∪ upserts) \\ deletes, and the surviving
    rows carry exactly the batch train-on-base codes — deletion removes
    rows, never perturbs codes."""
    emb, base, ups = _splits(spark, sf_dir)
    changes = ups.unionByName(_dels(emb, F.col("vec_id") % 7 == 0))
    served = streaming_index_cdc(
        spark, base=base, changes=changes, store=_store(tmp_path),
        n_cells=N_CELLS, m=M, k=K, sub_dim=SUB_DIM,
    )

    frame, cents = pq_train_assign(base, "embedding", "vec_id", M, K, SUB_DIM)
    cell_ids, cvecs = _coarse_centroids(
        base, N_CELLS, "embedding", "vec_id", M, SUB_DIM
    )
    batch = pq_encode_frame(
        emb.where(F.col("vec_id") % 7 != 0),
        cents, cell_ids, cvecs, "embedding", "vec_id", M, SUB_DIM,
    )
    assert _rows(served) == _rows(batch)


def test_tombstone_wins_on_both_sides_of_the_upsert(spark, sf_dir, tmp_path):
    """Pin the ingest schedule both ways (chunk_col, the ADVICE r08 #4
    discipline): the delete in the batch BEFORE its upsert and in the
    batch AFTER it must drain to the same view — tombstone wins, not
    last-writer-wins."""
    emb, base, ups = _splits(spark, sf_dir)
    victim = ups.select(F.min("vec_id")).collect()[0][0]
    dels = _dels(emb, F.col("vec_id") == victim)

    views = []
    for delete_first in (True, False):
        d_chunk, u_chunk = (0, 1) if delete_first else (1, 0)
        changes = (
            ups.withColumn("__chunk", F.lit(u_chunk))
            .unionByName(dels.withColumn("__chunk", F.lit(d_chunk)))
        )
        served = streaming_index_cdc(
            spark, base=base, changes=changes,
            store=_store(tmp_path / f"o{delete_first}"),
            n_cells=N_CELLS, m=M, k=K, sub_dim=SUB_DIM,
            n_chunks=2, chunk_col="__chunk",
        )
        views.append(_rows(served))
    assert views[0] == views[1]
    assert victim not in {v[0] for v in views[0]}


def test_delete_of_absent_id_is_a_noop(spark, sf_dir, tmp_path):
    emb, base, ups = _splits(spark, sf_dir)
    ghost_ids = [10**9, 10**9 + 7]
    ghosts = spark.createDataFrame(
        [(i,) for i in ghost_ids], "vec_id long"
    ).join(emb.limit(1).drop("vec_id"), how="cross").withColumn(
        "op", F.lit("d")
    ).select(*ups.columns)
    served = streaming_index_cdc(
        spark, base=base, changes=ups.unionByName(ghosts),
        store=_store(tmp_path), n_cells=N_CELLS, m=M, k=K, sub_dim=SUB_DIM,
    )
    codeable = emb.where(
        F.col("embedding").isNotNull()
        & (F.size("embedding") >= M * SUB_DIM)
    )
    assert _ids(served) == _ids(codeable)  # nothing real was deleted


def test_replayed_drain_and_compaction_are_idempotent(
    spark, sf_dir, tmp_path
):
    """Drain the same changes twice in one process (the rerun contract:
    first batch overwrites), then compact: exactly one code row per
    surviving id, hash-equal to the single-drain compacted index."""
    emb, base, ups = _splits(spark, sf_dir)
    changes = ups.unionByName(_dels(emb, F.col("vec_id") % 7 == 0))
    store = _store(tmp_path)
    kw = dict(n_cells=N_CELLS, m=M, k=K, sub_dim=SUB_DIM)
    v1 = _rows(
        streaming_index_cdc(
            spark, base=base, changes=changes, store=store, **kw
        )
    )
    v2 = _rows(
        streaming_index_cdc(
            spark, base=base, changes=changes, store=store, **kw
        )
    )
    assert v1 == v2
    assert compact_streaming_index(spark, store, prefix="sidxd") is True
    compacted = load_artifact(spark, store, "sidxd_codes")
    assert _rows(compacted) == v1
    ids = _ids(compacted)
    assert len(ids) == len(set(ids))  # one row per id


def test_compaction_purges_tombstones_and_consumes_artifacts(
    spark, sf_dir, tmp_path
):
    emb, base, ups = _splits(spark, sf_dir)
    changes = ups.unionByName(_dels(emb, F.col("vec_id") % 7 == 0))
    store = _store(tmp_path)
    served = streaming_index_cdc(
        spark, base=base, changes=changes, store=store,
        n_cells=N_CELLS, m=M, k=K, sub_dim=SUB_DIM,
    )
    want = _rows(served)
    assert compact_streaming_index(spark, store, prefix="sidxd") is True
    assert _rows(load_artifact(spark, store, "sidxd_codes")) == want
    deleted = {
        r["vec_id"]
        for r in load_artifact(spark, store, "sidxd_codes")
        .where(F.col("vec_id") % 7 == 0).collect()
    }
    assert deleted == set()  # physically purged
    for consumed in ("sidxd_arrival_codes", "sidxd_tombstones",
                     "sidxd_codes_next"):
        assert not os.path.exists(artifact_path(store, consumed))
    # nothing left to fold -> second compaction is a clean no-op
    assert compact_streaming_index(spark, store, prefix="sidxd") is False


def test_compaction_with_tombstones_only(spark, sf_dir, tmp_path):
    """A delete-only CDC stream (no upserts at all) must still compact:
    the gate is arrivals OR tombstones."""
    emb, base, _ = _splits(spark, sf_dir)
    dels = _dels(emb, F.col("vec_id") % 13 == 6)
    store = _store(tmp_path)
    served = streaming_index_cdc(
        spark, base=base, changes=dels, store=store,
        n_cells=N_CELLS, m=M, k=K, sub_dim=SUB_DIM,
    )
    want = _rows(served)
    assert compact_streaming_index(spark, store, prefix="sidxd") is True
    assert _rows(load_artifact(spark, store, "sidxd_codes")) == want
    assert not os.path.exists(artifact_path(store, "sidxd_tombstones"))


def test_interrupted_swap_finishes_from_committed_next(
    spark, sf_dir, tmp_path
):
    """Crash between codes_next commit and the swap: a committed next
    always carries the tombstones already applied, so finishing is pure
    delete+rename — and the stale tombstone artifact is consumed with
    it."""
    emb, base, ups = _splits(spark, sf_dir)
    changes = ups.unionByName(_dels(emb, F.col("vec_id") % 7 == 0))
    store = _store(tmp_path)
    served = streaming_index_cdc(
        spark, base=base, changes=changes, store=store,
        n_cells=N_CELLS, m=M, k=K, sub_dim=SUB_DIM,
    )
    want = _rows(served)
    # simulate the crash point: commit the merged+purged next by hand,
    # stop before the swap (exactly compact_streaming_index's state
    # after save_artifact and before _finish)
    save_artifact(served, store, "sidxd_codes_next")
    assert has_artifact(store, "sidxd_tombstones")
    _finish_sidx_compaction(store, prefix="sidxd")
    assert _rows(load_artifact(spark, store, "sidxd_codes")) == want
    for consumed in ("sidxd_arrival_codes", "sidxd_tombstones",
                     "sidxd_codes_next"):
        assert not os.path.exists(artifact_path(store, consumed))


# ---------------------------------------------------------------------------
# Persisted replay fence on the CDC ingest (VERDICT r10 ask #2 / weak #1):
# one watermark fences both artifact kinds (arrival codes + tombstones).


def _epoch_files(store, artifact):
    import glob as _glob

    return sorted(
        (os.path.basename(p), os.stat(p).st_mtime_ns, os.stat(p).st_ino)
        for p in _glob.glob(
            os.path.join(store, artifact, "epoch*.parquet")
        )
    )


def test_cdc_ingest_watermark_fences_full_replay(spark, sf_dir, tmp_path):
    """A restarted CDC ingest replays every epoch from zero; the persisted
    watermark fences them all — arrival codes AND tombstones are
    byte-untouched and the serve view is identical (n-of-everything
    unchanged, not doubled)."""
    import json

    emb, base, ups = _splits(spark, sf_dir)
    changes = ups.unionByName(_dels(emb, F.col("vec_id") % 7 == 0))
    store = _store(tmp_path)
    kw = dict(n_cells=N_CELLS, m=M, k=K, sub_dim=SUB_DIM)

    first = _rows(
        streaming_index_cdc(
            spark, base=base, changes=changes, store=store, **kw
        )
    )
    wm_file = os.path.join(store, "sidxd_ingest_watermark.json")
    with open(wm_file) as f:
        wm = json.load(f)
    assert set(wm["artifacts"]) == {
        "sidxd_arrival_codes", "sidxd_tombstones",
    }
    wm_stat = os.stat(wm_file)
    arr_before = _epoch_files(store, "sidxd_arrival_codes")
    tomb_before = _epoch_files(store, "sidxd_tombstones")
    assert arr_before and tomb_before

    second = _rows(
        streaming_index_cdc(
            spark, base=base, changes=changes, store=store, **kw
        )
    )
    assert second == first
    assert _epoch_files(store, "sidxd_arrival_codes") == arr_before
    assert _epoch_files(store, "sidxd_tombstones") == tomb_before
    after = os.stat(wm_file)
    assert (after.st_mtime_ns, after.st_ino) == (
        wm_stat.st_mtime_ns, wm_stat.st_ino,
    )


def test_cdc_crash_window_replay_converges(spark, sf_dir, tmp_path):
    """Crash between the last epoch's applies and its watermark commit
    (simulated by rewinding the watermark one epoch, chunk schedule
    pinned): the replayed epoch REPLACES its own epoch-named files in
    both artifacts, so tombstone-wins serve output and the physical
    compaction are unchanged — never a double-applied batch."""
    import json

    emb, base, ups = _splits(spark, sf_dir)
    changes = ups.unionByName(_dels(emb, F.col("vec_id") % 7 == 0))
    changes = changes.withColumn(
        "chunk", F.pmod(F.col("vec_id"), F.lit(4))
    )
    store = _store(tmp_path)
    kw = dict(
        n_cells=N_CELLS, m=M, k=K, sub_dim=SUB_DIM, chunk_col="chunk"
    )

    first = _rows(
        streaming_index_cdc(
            spark, base=base, changes=changes, store=store, **kw
        )
    )
    wm_file = os.path.join(store, "sidxd_ingest_watermark.json")
    with open(wm_file) as f:
        wm = json.load(f)
    assert wm["last_epoch"] >= 1
    wm["last_epoch"] -= 1
    with open(wm_file, "w") as f:
        json.dump(wm, f)

    second = _rows(
        streaming_index_cdc(
            spark, base=base, changes=changes, store=store, **kw
        )
    )
    assert second == first
    # and the physical purge sees exactly one row per surviving id
    assert compact_streaming_index(spark, store, prefix="sidxd") is True
    ids = _ids(load_artifact(spark, store, "sidxd_codes"))
    assert len(ids) == len(set(ids))


def test_compaction_drops_the_ingest_watermark(spark, sf_dir, tmp_path):
    """The watermark records exactly the artifacts compaction consumes —
    the swap must drop it with them so the NEXT ingest starts fresh
    instead of resuming against artifacts that no longer exist."""
    emb, base, ups = _splits(spark, sf_dir)
    changes = ups.unionByName(_dels(emb, F.col("vec_id") % 7 == 0))
    store = _store(tmp_path)
    kw = dict(n_cells=N_CELLS, m=M, k=K, sub_dim=SUB_DIM)

    streaming_index_cdc(
        spark, base=base, changes=changes, store=store, **kw
    )
    wm_file = os.path.join(store, "sidxd_ingest_watermark.json")
    assert os.path.isfile(wm_file)
    assert compact_streaming_index(spark, store, prefix="sidxd") is True
    assert not os.path.isfile(wm_file)
    assert not has_artifact(store, "sidxd_arrival_codes")
    assert not has_artifact(store, "sidxd_tombstones")
