"""Round-3 third-session operators: robust MAD outlier census, TPC-H
Q7/Q15 shapes, and the rest of the session's additions (chunking, CMS,
importance weights, semantic dedup) as they land."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_cql_streaming_db_migrator_spark.operators.robust import (
    MAD_SIGMA,
    mad_outlier_stats,
)
from cassandra_cql_streaming_db_migrator_spark.queries.relational import (
    q7_nation_volume,
    q15_top_supplier,
)
from cassandra_cql_streaming_db_migrator_spark.sources.parquet import load_table


# ------------------------------------------------------------------ MAD


def test_mad_outlier_stats_hand_computed(spark):
    # group "a": values 1..9 plus a 1e9 corruption -> median 5.5, the
    # corrupt row is the single outlier; mean-based gates would have been
    # dragged by the corruption, the MAD gate is not.
    rows = [("a", float(v)) for v in range(1, 10)] + [("a", 1e9)]
    # group "b": constant -> MAD 0, nothing can exceed a 0-width gate
    rows += [("b", 7.0)] * 4
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in mad_outlier_stats(df, "g", "v").collect()}
    a = got["a"]
    assert a["n"] == 10
    assert a["median"] == 5.5  # mean of 5 and 6
    # deviations from 5.5: .5 1.5 2.5 3.5 4.5 (x2 each) + huge -> MAD 2.5
    assert a["mad"] == 2.5
    assert a["n_outliers"] == 1
    b = got["b"]
    assert b["mad"] == 0.0 and b["n_outliers"] == 0 and b["median"] == 7.0


def test_mad_outlier_stats_partitioning_invariant(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    one = mad_outlier_stats(events.repartition(1), "event_type", "value")
    many = mad_outlier_stats(events.repartition(13), "event_type", "value")
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


def test_mad_outlier_stats_null_values_excluded(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0)], "g string, v double"
    )
    [r] = mad_outlier_stats(df, "g", "v").collect()
    assert r["n"] == 2 and r["median"] == 2.0


# ------------------------------------------------------------- chunking


def test_chunk_documents_coverage_and_overlap(spark):
    from cassandra_cql_streaming_db_migrator_spark.operators.corpus import (
        chunk_documents,
    )

    text = " ".join(f"w{i}" for i in range(100))  # 100 tokens
    df = spark.createDataFrame(
        [(1, text), (2, "a b"), (3, ""), (4, "   ")], "doc_id long, text string"
    )
    rows = chunk_documents(df, window=64, stride=48).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 1, 49 (97 dropped: 97 > 100 - 16); sizes 64, 52
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["chunk_idx"] for r in c1] == [0, 1]
    assert [r["n_tokens"] for r in c1] == [64, 52]
    # short and empty docs still yield exactly one chunk each
    assert [r["n_tokens"] for r in by_doc[2]] == [2]
    assert [r["n_tokens"] for r in by_doc[3]] == [0]
    assert [r["n_tokens"] for r in by_doc[4]] == [0]


def test_chunk_documents_is_narrow(spark, sf_dir):
    from cassandra_cql_streaming_db_migrator_spark.operators.corpus import (
        chunk_documents,
    )

    plan = chunk_documents(
        load_table(spark, sf_dir, "documents")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles: chunking is per-row


# ----------------------------------------------------------- framesample


def test_audio_frame_stats_real_wav_and_quarantine(spark):
    from cassandra_cql_streaming_db_migrator_spark.operators.multimodal import (
        audio_frame_stats,
        make_wav,
    )

    wav = make_wav(bytes(range(64)))  # samples 0..63
    rows = [
        (1, bytearray(wav)),
        (2, bytearray(b"not a wav")),   # quarantined, no frames
        (3, None),                       # NULL payload, no frames
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = sorted(
        audio_frame_stats(df, frame_len=32).collect(),
        key=lambda r: (r["doc_id"], r["frame_idx"]),
    )
    assert [r["doc_id"] for r in got] == [1, 1]
    first, second = got
    assert (first["frame_min"], first["frame_max"]) == (0, 31)
    assert first["frame_sum"] == sum(range(32))
    assert (second["frame_min"], second["frame_max"]) == (32, 63)
    assert second["frame_sum"] == sum(range(32, 64))


# ------------------------------------------------------------- semdedup


def test_semdedup_drops_duplicate_group_members(spark):
    from cassandra_cql_streaming_db_migrator_spark.operators.clustering import (
        semdedup,
    )

    # two tight groups + one singleton; within-group cosine ~1, across ~0
    rows = (
        [(i, [1.0, 0.0, 0.0, float(i) * 1e-3]) for i in range(3)]
        + [(10 + i, [0.0, 1.0, 0.0, float(i) * 1e-3]) for i in range(4)]
        + [(99, [0.0, 0.0, 1.0, 0.0])]
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semdedup(df, k=3, iterations=2, threshold=0.9).collect()
    assert sum(r["n_vecs"] for r in out) == 8
    # each multi-member group keeps exactly one representative
    assert sum(r["n_dropped"] for r in out) == (3 - 1) + (4 - 1)


def test_semdedup_respects_threshold(spark):
    from cassandra_cql_streaming_db_migrator_spark.operators.clustering import (
        semdedup,
    )

    rows = [(i, [1.0, 0.0]) for i in range(2)] + [(5, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    strict = semdedup(df, k=2, iterations=1, threshold=1.01).collect()
    assert sum(r["n_dropped"] for r in strict) == 0  # nothing reaches > 1


# ---------------------------------------------------------------- DSIR


def test_dsir_importance_separates_domains(spark):
    from cassandra_cql_streaming_db_migrator_spark.operators.corpus import (
        dsir_importance,
    )

    rows = [(i, "apple banana apple cherry", "tgt") for i in range(10)]
    rows += [(100 + i, "car dog engine wheel dog", "web") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["source"]: r
        for r in dsir_importance(df, target=F.col("source") == "tgt").collect()
    }
    # every target doc scores above parity, no out-of-domain doc does:
    # their vocabularies are disjoint, so the ratio signal is maximal
    assert got["tgt"]["n_above_parity"] == 10
    assert got["web"]["n_above_parity"] == 0
    assert got["tgt"]["score_fp_sum"] > got["web"]["score_fp_sum"]


def test_dsir_importance_partitioning_invariant(spark, sf_dir):
    from cassandra_cql_streaming_db_migrator_spark.operators.corpus import (
        dsir_importance,
    )

    docs = load_table(spark, sf_dir, "documents")
    tgt = F.col("source").isin("src0", "src1")
    one = dsir_importance(docs.repartition(1), tgt).collect()
    many = dsir_importance(docs.repartition(13), tgt).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


# ----------------------------------------------------------- diversity


def test_char_diversity_hand_computed(spark):
    from cassandra_cql_streaming_db_migrator_spark.operators.textops import (
        char_diversity_stats,
    )

    df = spark.createDataFrame(
        [
            (1, "aaaa", "s1"),          # zero diversity
            (2, "abcd", "s2"),          # maximal: all chars distinct
            (3, "x y x y", "s3"),       # TTR 2/4
        ],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in char_diversity_stats(df).collect()}
    assert got["s1"]["simpson_fp_sum"] == 0
    assert got["s2"]["simpson_fp_sum"] == 1_000_000  # (16-4)*1e6/(4*3)
    assert got["s1"]["ttr_fp_sum"] == 1_000_000      # 1 distinct / 1 token
    assert got["s3"]["ttr_fp_sum"] == 500_000        # 2 distinct / 4 tokens


# ----------------------------------------------------------------- CMS


def _bigram_stream(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    bigrams = F.zip_with(
        F.slice(words, 1, F.size(words) - 1),
        F.slice(words, 2, F.size(words) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return docs.select(F.explode(bigrams).alias("bigram"))


def test_cms_one_sided_error_and_wide_sketch_exact(spark, sf_dir):
    from cassandra_cql_streaming_db_migrator_spark.operators.sketches import (
        cms_heavy_hitters,
    )

    stream = _bigram_stream(spark, sf_dir)
    narrow = cms_heavy_hitters(stream, "bigram", width=64, k=30).collect()
    assert len(narrow) == 30
    # CMS error is one-sided: estimates never undercount
    assert all(r["cms_n"] >= r["exact_n"] for r in narrow)
    assert all(r["overestimate"] == r["cms_n"] - r["exact_n"] for r in narrow)
    # a wide sketch on this key space is collision-free -> exact
    wide = cms_heavy_hitters(stream, "bigram", width=65536, k=30).collect()
    assert all(r["overestimate"] == 0 for r in wide)


def test_cms_partitioning_invariant(spark, sf_dir):
    from cassandra_cql_streaming_db_migrator_spark.operators.sketches import (
        cms_heavy_hitters,
    )

    stream = _bigram_stream(spark, sf_dir)
    one = cms_heavy_hitters(stream.repartition(1), "bigram", k=20).collect()
    many = cms_heavy_hitters(stream.repartition(17), "bigram", k=20).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


# ------------------------------------------------------------ TPC-H Q7/Q15


def test_q7_only_allowed_nation_pairs(spark, sf_dir):
    rows = q7_nation_volume(spark, sf_dir).collect()
    assert rows, "fixture should produce bilateral volume"
    allowed = {("NATION_3", "NATION_7"), ("NATION_7", "NATION_3")}
    for r in rows:
        assert (r["supp_nation"], r["cust_nation"]) in allowed
        assert r["n_items"] > 0 and r["revenue"] > 0


def test_q15_returns_all_ties_at_max(spark, sf_dir):
    rows = q15_top_supplier(spark, sf_dir).collect()
    assert rows
    top = rows[0]["total_revenue"]
    assert all(r["total_revenue"] == top for r in rows)
    # the winner really is the max over the same revenue view
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    best = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0
            ).alias("approx")
        )
        .orderBy(F.col("approx").desc())
        .first()
    )
    assert abs(best["approx"] - top) < 1.0
