"""Round-9 second-wave operators: simhash_pairs banding, filtered ANN,
index drift gauge."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.001"


def _docs(spark):
    from cassandra_cql_streaming_db_migrator_spark.sources.parquet import (
        load_table,
    )

    return load_table(spark, SF, "documents")


def _emb(spark):
    from cassandra_cql_streaming_db_migrator_spark.sources.parquet import (
        load_table,
    )

    return load_table(spark, SF, "embeddings")


def test_simhash_banding_is_complete_and_duplicate_free(spark):
    # banding must find EXACTLY the quadratic-definition pairs, each once
    # (the first-matching-band emission replaces the distinct pass)
    from cassandra_cql_streaming_db_migrator_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_near_pairs,
    )

    fps = simhash_fingerprints(_docs(spark))
    got = [
        (r["doc_id_1"], r["doc_id_2"], r["dist"])
        for r in simhash_near_pairs(fps, max_dist=1).collect()
    ]
    assert len(got) == len(set(got)), "pair emitted from more than one band"

    rows = {r["doc_id"]: r["simhash"] for r in fps.collect()}
    ids = sorted(rows)
    want = sorted(
        (a, b, bin(rows[a] ^ rows[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(rows[a] ^ rows[b]).count("1") <= 1
    )
    assert sorted(got) == want


def test_simhash_banding_wider_radius(spark):
    # max_dist=3 -> 4 bands; still exactly the quadratic definition
    from cassandra_cql_streaming_db_migrator_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_near_pairs,
    )

    docs = _docs(spark).limit(40)
    fps = simhash_fingerprints(docs)
    got = sorted(
        (r["doc_id_1"], r["doc_id_2"], r["dist"])
        for r in simhash_near_pairs(fps, max_dist=3).collect()
    )
    rows = {r["doc_id"]: r["simhash"] for r in fps.collect()}
    ids = sorted(rows)
    want = sorted(
        (a, b, bin(rows[a] ^ rows[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(rows[a] ^ rows[b]).count("1") <= 3
    )
    assert got == want
    assert len(got) == len(set(got))


def test_filtered_ann_respects_predicate_and_subsets_unfiltered(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACTS", str(tmp_path / "arts"))
    from cassandra_cql_streaming_db_migrator_spark.queries.llm import (
        ann_filtered_batch,
    )

    emb = _emb(spark)
    allowed = {
        r["vec_id"] for r in emb.where("label = 1").select("vec_id").collect()
    }
    out = ann_filtered_batch(spark, SF).collect()
    assert out, "filtered search returned nothing"
    assert {r["vec_id"] for r in out} <= allowed
    # per query: ranks are 1..k contiguous and adc_dist non-decreasing
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rn"], r["adc_dist"]))
    for q, rows in by_q.items():
        rows.sort()
        assert [rn for rn, _ in rows] == list(range(1, len(rows) + 1))
        dists = [d for _, d in rows]
        assert dists == sorted(dists), f"query {q} not distance-ordered"


def test_index_drift_shares_are_consistent(spark):
    from cassandra_cql_streaming_db_migrator_spark.operators.clustering import (
        coarse_cell_drift,
    )

    emb = _emb(spark)
    rows = coarse_cell_drift(
        emb, F.col("vec_id") % 10 != 0, n_cells=8
    ).collect()
    n_base = sum(r["n_base"] for r in rows)
    n_all = sum(r["n_all"] for r in rows)
    assert n_all == emb.where(
        "embedding IS NOT NULL AND size(embedding) >= 64"
    ).count()
    assert n_base == emb.where(
        "vec_id % 10 != 0 AND embedding IS NOT NULL AND size(embedding) >= 64"
    ).count()
    for r in rows:
        assert r["share_base_ppm"] == 1_000_000 * r["n_base"] // n_base
        assert r["share_all_ppm"] == 1_000_000 * r["n_all"] // n_all
        assert r["share_drift_ppm"] == abs(
            r["share_all_ppm"] - r["share_base_ppm"]
        )
    # floor-division shares sum to <= 1e6 and within n_cells ulps
    s = sum(r["share_all_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= s <= 1_000_000
