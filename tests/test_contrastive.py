"""Round-10 late additions: contrastive triplet mining and the
Matryoshka dimension-truncation recall curve (operators/similarity.py).

Both kernels are verified against a NumPy brute force that replicates the
sequential dimension fold, so rank comparisons are bit-exact rather than
tolerance-based.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from cassandra_cql_streaming_db_migrator_spark.operators.similarity import (
    contrastive_topk,
    prefix_dim_recall,
)
from cassandra_cql_streaming_db_migrator_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _emb_rows(spark):
    emb = load_table(spark, SF, "embeddings")
    rows = emb.select("vec_id", "label", "embedding").collect()
    ids = np.array([r[0] for r in rows])
    labels = np.array([r[1] for r in rows])
    mat = np.stack([np.asarray(r[2], dtype=np.float64) for r in rows])
    return emb, ids, labels, mat


def _fold_cos(mat, qv):
    """The kernels' sequential dimension fold, replicated exactly."""
    acc = np.zeros(mat.shape[0], dtype=np.float64)
    nrm = np.zeros(mat.shape[0], dtype=np.float64)
    qn = 0.0
    for d in range(mat.shape[1]):
        acc = acc + mat[:, d] * qv[d]
        nrm = nrm + mat[:, d] * mat[:, d]
        qn = qn + qv[d] * qv[d]
    return acc / (np.sqrt(nrm) * np.sqrt(qn))


def test_contrastive_triplets_match_brute_force(spark):
    emb, ids, labels, mat = _emb_rows(spark)
    anchors = emb.filter(F.col("vec_id") % 50 == 0)
    got = {
        (r["anchor_id"], r["role"], r["rn"]): (r["neighbor_id"], r["cosine"])
        for r in contrastive_topk(emb, anchors, k_pos=1, k_neg=3).collect()
    }
    n_expected = 0
    for aid in ids[ids % 50 == 0]:
        j = int(np.nonzero(ids == aid)[0][0])
        cos = _fold_cos(mat, mat[j])
        order = np.lexsort((ids, -cos))
        alab = labels[j]
        pos = [i for i in order
               if labels[i] == alab and ids[i] != aid
               and not np.isnan(cos[i])][:1]
        neg = [i for i in order
               if labels[i] != alab and not np.isnan(cos[i])][:3]
        for rn, i in enumerate(pos, start=1):
            assert got[(aid, "pos", rn)] == (ids[i], cos[i])
            n_expected += 1
        for rn, i in enumerate(neg, start=1):
            assert got[(aid, "neg", rn)] == (ids[i], cos[i])
            n_expected += 1
    assert len(got) == n_expected


def test_contrastive_roles_and_self_exclusion(spark):
    emb, ids, labels, mat = _emb_rows(spark)
    lab = {int(i): int(l) for i, l in zip(ids, labels)}
    anchors = emb.filter(F.col("vec_id") % 50 == 0)
    rows = contrastive_topk(emb, anchors, k_pos=1, k_neg=3).collect()
    assert rows
    for r in rows:
        assert r["neighbor_id"] != r["anchor_id"]
        if r["role"] == "pos":
            assert lab[r["neighbor_id"]] == lab[r["anchor_id"]]
            assert r["rn"] == 1
        else:
            assert lab[r["neighbor_id"]] != lab[r["anchor_id"]]
            assert 1 <= r["rn"] <= 3


def test_contrastive_empty_anchor_set(spark):
    # ADVICE r10 #1: the empty path must return the SAME field order as
    # the non-empty select (rn third) so positional consumers never break
    emb, *_ = _emb_rows(spark)
    out = contrastive_topk(emb, emb.filter(F.col("vec_id") < 0))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "anchor_id", "role", "rn", "neighbor_id", "cosine",
    ]


def test_contrastive_chunked_anchor_path_matches_broadcast(spark):
    """VERDICT r10 ask #6: past the broadcast bound the operator pages
    the anchors in id-ordered keyset blocks; value parity must be exact
    (blocks partition the anchor set and the window cut is per-anchor).
    A bound of 3 forces multiple blocks on the fixture anchor set."""
    emb, ids, *_ = _emb_rows(spark)
    anchors = emb.filter(F.col("vec_id") % 50 == 0)
    n_anchors = int((ids % 50 == 0).sum())
    assert n_anchors > 3  # the bound genuinely forces >1 block

    def norm(df):
        return sorted(map(tuple, df.collect()))

    broadcast = norm(contrastive_topk(emb, anchors, k_pos=1, k_neg=3))
    chunked = norm(
        contrastive_topk(
            emb, anchors, k_pos=1, k_neg=3, max_anchor_rows=3
        )
    )
    assert chunked == broadcast


def test_prefix_dim_recall_full_dim_is_unity_and_bounded(spark):
    emb, ids, labels, mat = _emb_rows(spark)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    corpus = emb.filter(F.col("vec_id") % 50 != 0)
    rows = {r["dim"]: r for r in prefix_dim_recall(
        corpus, queries, dims=(8, 16, 32, 64), k=10
    ).collect()}
    assert sorted(rows) == [8, 16, 32, 64]
    full = rows[64]
    assert full["n_hits"] == full["n_exact"]
    assert full["recall_ppm"] == 1_000_000
    for r in rows.values():
        assert 0 <= r["recall_ppm"] <= 1_000_000
        assert r["n_exact"] == full["n_exact"]


def test_prefix_dim_recall_matches_brute_force_at_each_dim(spark):
    emb, ids, labels, mat = _emb_rows(spark)
    qmask = ids % 50 == 0
    cmask = ~qmask
    cids, cmat = ids[cmask], mat[cmask]
    dims, k = (8, 16, 32, 64), 10
    tops = {d: {} for d in dims}
    for qid in ids[qmask]:
        j = int(np.nonzero(ids == qid)[0][0])
        for d in dims:
            cos = _fold_cos(cmat[:, :d], mat[j, :d])
            valid = ~np.isnan(cos)
            order = np.lexsort((cids[valid], -cos[valid]))
            tops[d][qid] = set(cids[valid][order][:k])
    exp = []
    n_exact = sum(len(v) for v in tops[64].values())
    for d in dims:
        hits = sum(len(tops[d][q] & tops[64][q]) for q in tops[d])
        exp.append((d, hits, n_exact, 1_000_000 * hits // n_exact))
    got = [
        (r["dim"], r["n_hits"], r["n_exact"], r["recall_ppm"])
        for r in prefix_dim_recall(
            load_table(spark, SF, "embeddings").filter(
                F.col("vec_id") % 50 != 0
            ),
            load_table(spark, SF, "embeddings").filter(
                F.col("vec_id") % 50 == 0
            ),
            dims=dims, k=k,
        ).collect()
    ]
    assert got == exp
