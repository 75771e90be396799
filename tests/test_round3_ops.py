"""Round-3 second-session operators: k-NN join, table profile, PMI
collocations, co-occurrence pairs, and the TPC-H Q5/Q18 query shapes."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cassandra_cql_streaming_db_migrator_spark.operators.events import cooccurrence_pairs
from cassandra_cql_streaming_db_migrator_spark.operators.profile import table_profile
from cassandra_cql_streaming_db_migrator_spark.operators.similarity import knn_join
from cassandra_cql_streaming_db_migrator_spark.operators.textops import bigram_pmi_topk
from cassandra_cql_streaming_db_migrator_spark.sources.parquet import load_table


# --------------------------------------------------------------------- knn


def _brute_force_knn(spark, corpus_rows, query_rows, k):
    """Driver-side reference: exact cosine, same total order."""
    out = {}
    for qid, qv in query_rows:
        scored = []
        qn = math.sqrt(sum(x * x for x in qv))
        for cid, cv in corpus_rows:
            dot = 0.0
            for a, b in zip(qv, cv):
                dot += a * b
            cn = math.sqrt(sum(x * x for x in cv))
            scored.append((cid, dot / (cn * qn)))
        scored.sort(key=lambda t: (-t[1], t[0]))
        out[qid] = scored[:k]
    return out


def test_knn_join_matches_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(120).cache()
    queries = emb.filter(F.col("vec_id") % 40 == 0)
    corpus = emb.filter(F.col("vec_id") % 40 != 0)
    got = {
        (r["query_id"], r["rn"]): (r["neighbor_id"], r["cosine"])
        for r in knn_join(corpus, queries, k=4).collect()
    }
    c_rows = [(r["vec_id"], list(r["embedding"])) for r in corpus.collect()]
    q_rows = [(r["vec_id"], list(r["embedding"])) for r in queries.collect()]
    want = _brute_force_knn(spark, c_rows, q_rows, 4)
    assert len(got) == len(q_rows) * 4
    for qid, neighbors in want.items():
        for rank, (cid, cos) in enumerate(neighbors, start=1):
            gcid, gcos = got[(qid, rank)]
            assert gcid == cid, (qid, rank)
            assert gcos == pytest.approx(cos, abs=1e-12)


def test_knn_join_small_corpus_and_empty_queries(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    # corpus smaller than k: every corpus row appears, ranked
    tiny = emb.filter(F.col("vec_id") < 3)
    queries = emb.filter(F.col("vec_id") == 10)
    rows = knn_join(tiny, queries, k=5).collect()
    assert len(rows) == 3
    assert sorted(r["rn"] for r in rows) == [1, 2, 3]
    # empty query side -> empty result with the right schema
    empty = knn_join(tiny, emb.filter(F.col("vec_id") < 0), k=5)
    assert empty.count() == 0
    assert empty.columns == ["query_id", "neighbor_id", "cosine", "rn"]


def test_knn_join_chunked_queries_bit_identical(spark, sf_dir):
    """The broadcast contract's fallback is code, not prose (VERDICT r03
    ask #5): query_chunk_rows splits the query set, each chunk scores the
    corpus separately, and the unioned candidates must produce a
    BIT-identical result to the unchunked path — chunks partition the
    query ids, so the per-query window never mixes chunks.  Chunk sizes
    cover uneven tails (7 over 12 queries) and the 1-row degenerate."""
    emb = load_table(spark, sf_dir, "embeddings").limit(150)
    queries = emb.filter(F.col("vec_id") % 12 == 0)  # 12 queries
    corpus = emb.filter(F.col("vec_id") % 12 != 0)
    base = sorted(map(tuple, knn_join(corpus, queries, k=4).collect()))
    for chunk in (7, 1):
        chunked = sorted(
            map(
                tuple,
                knn_join(
                    corpus, queries, k=4, query_chunk_rows=chunk
                ).collect(),
            )
        )
        assert chunked == base, chunk


def test_knn_join_batch_partial_topk_is_exact(spark, sf_dir):
    """Result is invariant to corpus partitioning (batch-local top-k with
    tie guard must not depend on how rows are batched)."""
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    corpus = emb.filter(F.col("vec_id") % 50 != 0)
    one = sorted(map(tuple, knn_join(corpus.repartition(1), queries, k=3).collect()))
    many = sorted(map(tuple, knn_join(corpus.repartition(17), queries, k=3).collect()))
    assert one == many


# ----------------------------------------------------------------- profile


def test_table_profile_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 2.5),
            (2, "b", None),
            (2, None, 1.0),
            (None, "a", 4.0),
        ],
        "k bigint, s string, v double",
    )
    rows = {r["col_name"]: r for r in table_profile(
        df, [("k", "num"), ("s", "str"), ("v", "num")]
    ).collect()}
    assert rows["k"]["n_rows"] == 4
    assert rows["k"]["n_nulls"] == 1
    assert rows["k"]["n_distinct"] == 2
    assert rows["k"]["num_min"] == 1.0 and rows["k"]["num_max"] == 2.0
    assert rows["k"]["str_min"] is None
    assert rows["s"]["n_nulls"] == 1
    assert rows["s"]["n_distinct"] == 2
    assert rows["s"]["str_min"] == "a" and rows["s"]["str_max"] == "b"
    assert rows["s"]["num_min"] is None
    assert rows["v"]["n_nulls"] == 1
    assert rows["v"]["num_min"] == 1.0 and rows["v"]["num_max"] == 4.0


def test_table_profile_timestamp_epoch(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    prof = {r["col_name"]: r for r in table_profile(
        orders, [("o_orderdate", "ts")]
    ).collect()}
    lo = prof["o_orderdate"]["num_min"]
    hi = prof["o_orderdate"]["num_max"]
    # the fixture generator spans 1995..2001; epoch seconds, UTC session
    assert lo == 788918400.0  # 1995-01-01T00:00:00Z
    assert hi > lo


# --------------------------------------------------------------------- pmi


def test_bigram_pmi_exact_lift(spark):
    # corpus: "a b" x4 docs, "a c" x1 -> unigrams a:5 b:4 c:1, bigrams N=5
    docs = spark.createDataFrame(
        [("a b",)] * 4 + [("a c",)], "text string"
    )
    rows = {r["bigram"]: r for r in
            bigram_pmi_topk(docs, min_count=1, k=10).collect()}
    ab = rows["a b"]
    assert (ab["n_xy"], ab["n_x"], ab["n_y"], ab["n_total"]) == (4, 5, 4, 5)
    assert ab["lift_fp"] == 1000 * 5 * 4 // (5 * 4)  # 1000 == lift 1.0
    ac = rows["a c"]
    assert ac["lift_fp"] == 1000 * 5 * 1 // (5 * 1)


def test_bigram_pmi_min_count_filter(spark):
    docs = spark.createDataFrame([("a b",)] * 4 + [("a c",)], "text string")
    names = [r["bigram"] for r in
             bigram_pmi_topk(docs, min_count=2, k=10).collect()]
    assert names == ["a b"]


# ------------------------------------------------------------ cooccurrence


def test_cooccurrence_pairs_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "x"), (1, "y"), (1, "y"),      # user 1: {x, y}
            (2, "x"), (2, "z"),                # user 2: {x, z}
            (3, "x"), (3, "y"), (3, "z"),      # user 3: {x, y, z}
        ],
        "user_id bigint, event_type string",
    )
    rows = {(r["item_a"], r["item_b"]): r for r in
            cooccurrence_pairs(df, k=10).collect()}
    assert rows[("x", "y")]["n_both"] == 2
    assert rows[("x", "z")]["n_both"] == 2
    assert rows[("y", "z")]["n_both"] == 1
    xy = rows[("x", "y")]
    assert (xy["n_a"], xy["n_b"]) == (3, 2)
    assert xy["containment_fp"] == 1000000 * 2 // 2  # fully contained in y


# ------------------------------------------------------------------- tpch


def test_q5_q18_shapes(spark, sf_dir):
    from cassandra_cql_streaming_db_migrator_spark.queries.relational import (
        q18_top_buyers,
        q5_region_revenue,
    )

    q5 = q5_region_revenue(spark, sf_dir)
    assert q5.columns == ["r_name", "n_name", "revenue", "n_items"]
    rows5 = q5.collect()
    assert len(rows5) > 0
    assert all(r["revenue"] > 0 for r in rows5)

    q18 = q18_top_buyers(spark, sf_dir)
    rows18 = q18.collect()
    assert 0 < len(rows18) <= 100
    assert all(r["sum_qty"] > 250 for r in rows18)
    # descending by sum_qty with orderkey tiebreak
    keys = [(-r["sum_qty"], r["o_orderkey"]) for r in rows18]
    assert keys == sorted(keys)


# -------------------------------------------------------------- ann recall


def test_ann_recall_bounds_and_hits(spark, sf_dir):
    from cassandra_cql_streaming_db_migrator_spark.operators.similarity import (
        ann_recall,
        knn_join,
        lsh_ann_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    corpus = emb.filter(F.col("vec_id") % 100 != 0)
    rows = ann_recall(corpus, queries, k=5, n_bits=6).collect()
    assert len(rows) == queries.count()
    for r in rows:
        assert r["n_exact"] == 5
        assert 0 <= r["n_hits"] <= min(r["n_ann"], 5)
        assert r["recall_fp"] == 1000000 * r["n_hits"] // r["n_exact"]
    # cross-check one query against the single-query LSH path
    q0 = queries.orderBy("vec_id").limit(1)
    qid = q0.collect()[0]["vec_id"]
    ann_ids = {
        r["vec_id"] for r in lsh_ann_topk(corpus, q0, k=5, n_bits=6).collect()
    }
    exact_ids = {
        r["neighbor_id"]
        for r in knn_join(corpus, q0, k=5).filter(F.col("query_id") == qid).collect()
    }
    got = next(r for r in rows if r["query_id"] == qid)
    assert got["n_hits"] == len(ann_ids & exact_ids)
    assert got["n_ann"] == len(ann_ids)


# ------------------------------------------------------- salted join query


def test_join_salted_matches_plain(spark, sf_dir):
    from cassandra_cql_streaming_db_migrator_spark.queries.relational import join_salted

    got = sorted(map(tuple, join_salted(spark, sf_dir).collect()))
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    plain = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    plain_counts = {r["c_mktsegment"]: r["n_orders"] for r in plain.collect()}
    assert {t[0]: t[1] for t in got} == plain_counts


# ------------------------------------------------------------ head coverage


def test_vocab_head_coverage_exact(spark):
    from cassandra_cql_streaming_db_migrator_spark.operators.textops import (
        vocab_head_coverage,
    )

    # tokens: a x6, b x3, c x2, d x1 -> total 12
    docs = spark.createDataFrame(
        [("a a a b b c",), ("a a a b c d",)], "text string"
    )
    rows = {r["k"]: r for r in
            vocab_head_coverage(docs, ks=(1, 2, 3)).collect()}
    assert rows[1]["covered_tokens"] == 6
    assert rows[2]["covered_tokens"] == 9
    assert rows[3]["covered_tokens"] == 11
    assert all(r["total_tokens"] == 12 for r in rows.values())
    assert rows[1]["coverage_fp"] == 1000000 * 6 // 12
    # monotone non-decreasing coverage
    assert rows[1]["coverage_fp"] <= rows[2]["coverage_fp"] <= rows[3]["coverage_fp"]
    # k beyond the vocabulary (4 words) reports FULL coverage, not a
    # missing row
    wide = {r["k"]: r for r in
            vocab_head_coverage(docs, ks=(1, 100)).collect()}
    assert wide[100]["covered_tokens"] == 12
    assert wide[100]["coverage_fp"] == 1000000


# -------------------------------------------------------------- cdc latest


def test_latest_by_key_upsert_semantics(spark):
    from cassandra_cql_streaming_db_migrator_spark.operators.temporal import (
        latest_by_key,
    )

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10, "a", 1.0),
            (1, "2024-01-02 00:00:00", 11, "b", 2.0),
            (1, "2024-01-02 00:00:00", 12, "c", 3.0),  # same ts, higher tiebreak
            (2, "2024-01-05 00:00:00", 20, "z", 9.0),
        ],
        "user_id bigint, ts string, event_id bigint, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = {r["user_id"]: r for r in latest_by_key(
        df, "user_id", "ts", "event_id", ["event_type", "value"]
    ).collect()}
    assert rows[1]["n_versions"] == 3
    assert rows[1]["last_event_type"] == "c"  # tiebreak wins within equal ts
    assert rows[1]["last_value"] == 3.0
    assert rows[2]["n_versions"] == 1 and rows[2]["last_event_type"] == "z"


def test_latest_by_key_partitioning_invariant(spark, sf_dir):
    from cassandra_cql_streaming_db_migrator_spark.operators.temporal import (
        latest_by_key,
    )

    events = load_table(spark, sf_dir, "events")
    a = sorted(map(tuple, latest_by_key(
        events.repartition(1), "user_id", "ts", "event_id", ["event_type"]
    ).collect()))
    b = sorted(map(tuple, latest_by_key(
        events.repartition(32), "user_id", "ts", "event_id", ["event_type"]
    ).collect()))
    assert a == b


def test_latest_by_key_null_frontier_matches_oracle(spark, tmp_path):
    """A CDC feed setting a column to NULL is the last write and must win —
    on BOTH engines (DuckDB arg_max skips NULL args; the oracle wraps the
    value in a struct to align with Spark max_by)."""
    import duckdb

    from cassandra_cql_streaming_db_migrator_spark.operators.temporal import (
        latest_by_key,
        latest_by_key_sql,
    )

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10, "a", 1.0),
            (1, "2024-01-02 00:00:00", 11, None, None),  # last write: NULLs
            (2, "2024-01-05 00:00:00", 20, "z", 9.0),
        ],
        "user_id bigint, ts string, event_id bigint, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["user_id"]: r for r in latest_by_key(
        df, "user_id", "ts", "event_id", ["event_type", "value"]
    ).collect()}
    assert got[1]["last_event_type"] is None and got[1]["last_value"] is None

    pq = str(tmp_path / "feed.parquet")
    df.write.mode("overwrite").parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events_null AS SELECT * FROM '{pq}/*.parquet'")
    sql = latest_by_key_sql(
        "events_null", "user_id", "ts", "event_id", ["event_type", "value"]
    )
    oracle = {r[0]: r for r in con.execute(sql).fetchall()}
    assert oracle[1][3] is None and oracle[1][4] is None
    assert oracle[2][3] == "z"


def test_table_profile_empty_table_emits_zero_rows(spark):
    df = spark.createDataFrame([], "k bigint, s string")
    rows = {r["col_name"]: r for r in table_profile(
        df, [("k", "num"), ("s", "str")]
    ).collect()}
    assert set(rows) == {"k", "s"}
    for r in rows.values():
        assert (r["n_rows"], r["n_nulls"], r["n_distinct"]) == (0, 0, 0)
        assert r["num_min"] is None and r["str_max"] is None


def test_ohlc_null_frontier_matches_oracle(spark, tmp_path):
    """Same arg_max NULL-skip class as latest_by_key: an OHLC bucket whose
    last (or first) observation is NULL must report a NULL close/open on
    both engines."""
    import duckdb

    from cassandra_cql_streaming_db_migrator_spark.operators.timeseries import (
        ohlc_downsample,
        ohlc_downsample_sql,
    )

    df = spark.createDataFrame(
        [
            ("k", "2024-01-01 00:00:00", 1, None),     # open is NULL
            ("k", "2024-01-01 01:00:00", 2, 5.0),
            ("k", "2024-01-01 02:00:00", 3, None),     # close is NULL
        ],
        "event_type string, ts string, event_id bigint, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = ohlc_downsample(
        df, "event_type", "ts", "value", "event_id", bucket_seconds=86400
    ).collect()[0]
    assert got["open"] is None and got["close"] is None
    assert got["high"] == 5.0 and got["low"] == 5.0

    pq = str(tmp_path / "ohlc.parquet")
    df.write.mode("overwrite").parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW feed AS SELECT * FROM '{pq}/*.parquet'")
    sql = ohlc_downsample_sql(
        "feed", "event_type", "ts", "value", "event_id", bucket_seconds=86400
    )
    o = con.execute(sql).fetchall()[0]
    # columns: key, bucket_id, n_events, open, high, low, close
    assert o[3] is None and o[6] is None
    assert o[4] == 5.0 and o[5] == 5.0


# ----------------------------------------------- NULL / NaN parity guards


def test_ord_key_null_ts_skipped_on_both_engines(spark, tmp_path):
    """A NULL event time must be skipped by frontier election on BOTH
    engines (Spark format_string would otherwise render the string 'null'
    while DuckDB printf propagates NULL into arg_max's skip)."""
    import duckdb

    from cassandra_cql_streaming_db_migrator_spark.operators.temporal import (
        latest_by_key,
        latest_by_key_sql,
    )

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10, "a", 1.0),
            (1, None, 99, "b", 2.0),          # NULL ts: never the frontier
            (2, None, 20, "z", 9.0),          # all-NULL key: NULL frontier
        ],
        "user_id bigint, ts string, event_id bigint, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["user_id"]: r for r in latest_by_key(
        df, "user_id", "ts", "event_id", ["event_type", "value"]
    ).collect()}
    assert got[1]["last_event_type"] == "a"   # NULL-ts row did not win
    assert got[1]["n_versions"] == 2          # but still counted
    assert got[2]["last_event_type"] is None

    pq = str(tmp_path / "nullts.parquet")
    df.write.mode("overwrite").parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW feed2 AS SELECT * FROM '{pq}/*.parquet'")
    sql = latest_by_key_sql("feed2", "user_id", "ts", "event_id",
                            ["event_type", "value"])
    oracle = {r[0]: r for r in con.execute(sql).fetchall()}
    assert oracle[1][3] == "a" and oracle[1][1] == 2
    assert oracle[2][3] is None


def test_cooccurrence_null_key_and_item_excluded(spark, tmp_path):
    import duckdb

    from cassandra_cql_streaming_db_migrator_spark.operators.events import (
        cooccurrence_pairs,
        cooccurrence_pairs_sql,
    )

    df = spark.createDataFrame(
        [
            (None, "x"), (None, "y"),   # NULL basket: excluded
            (2, "x"), (2, "y"),
            (3, "x"), (3, None),        # NULL item: excluded
        ],
        "user_id bigint, event_type string",
    )
    rows = {(r["item_a"], r["item_b"]): r for r in
            cooccurrence_pairs(df, k=10).collect()}
    assert rows[("x", "y")]["n_both"] == 1
    assert rows[("x", "y")]["n_a"] == 2  # users 2 and 3 reach x

    pq = str(tmp_path / "nullco.parquet")
    df.write.mode("overwrite").parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW feed3 AS SELECT * FROM '{pq}/*.parquet'")
    o = con.execute(cooccurrence_pairs_sql("feed3", k=10)).fetchall()
    orows = {(r[0], r[1]): r for r in o}
    assert orows[("x", "y")][2] == 1 and orows[("x", "y")][3] == 2


def test_table_profile_negative_zero_parity(spark, tmp_path):
    import duckdb

    from cassandra_cql_streaming_db_migrator_spark.operators.profile import (
        table_profile,
        table_profile_sql,
    )

    df = spark.createDataFrame([(-0.0,), (0.0,), (1.5,)], "v double")
    got = table_profile(df, [("v", "num")]).collect()[0]
    assert str(got["num_min"]) == "0.0"  # normalized, not '-0.0'

    pq = str(tmp_path / "zeros.parquet")
    df.write.mode("overwrite").parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW feed4 AS SELECT * FROM '{pq}/*.parquet'")
    o = con.execute(table_profile_sql("feed4", [("v", "num")])).fetchall()[0]
    assert str(o[4]) == "0.0"            # oracle +0.0-normalized too
    assert got["n_distinct"] == o[3]     # -0.0 and 0.0 collapse identically


def test_knn_join_zero_norm_excluded_and_invariant(spark):
    """A zero-norm corpus vector (cosine undefined -> NaN) is excluded by
    contract, identically under any partitioning.  (NaN cannot ride
    through: the Arrow pandas bridge nulls it, so inclusion semantics
    would be partitioning-dependent.)"""
    rows = [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.9, 0.1]),
            (3, [0.5, 0.5]), (4, [0.1, 0.9])]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    queries = emb.filter(F.col("vec_id") == 0)
    corpus = emb.filter(F.col("vec_id") != 0)
    one = sorted(map(tuple, knn_join(corpus.repartition(1), queries, k=2).collect()))
    many = sorted(map(tuple, knn_join(corpus.repartition(8), queries, k=2).collect()))
    assert one == many
    got = knn_join(corpus, queries, k=2).collect()
    assert {r["neighbor_id"] for r in got} == {2, 3}  # zero-norm vec 1 absent
    assert all(r["cosine"] is not None for r in got)


def test_winsorize_unsampled_group_kept_unclipped(spark, tmp_path):
    """A group with no rows in the hash sample must survive UNCLIPPED
    (bounds +/-inf, zero clip counts), not vanish — on both engines."""
    import duckdb

    from cassandra_cql_streaming_db_migrator_spark.operators.sketches import (
        winsorized_stats,
        winsorized_stats_sql,
    )

    # group 'big' has many ids (some will hash into the 10% sample);
    # group 'tiny' has one id chosen freely — with rate=1e-9 NOTHING
    # samples, so every group exercises the unclipped path; with rate=1.0
    # everything samples. Use rate tiny to force the left-join default.
    rows = [("big", float(i), i) for i in range(20)] + [("tiny", 5.0, 99)]
    df = spark.createDataFrame(rows, "g string, value double, id bigint")
    got = {r["g"]: r for r in winsorized_stats(
        df, "g", "value", "id", rate=1e-9
    ).collect()}
    assert set(got) == {"big", "tiny"}
    assert got["tiny"]["n"] == 1
    assert got["tiny"]["n_clipped_low"] == 0 and got["tiny"]["n_clipped_high"] == 0
    assert got["tiny"]["winsorized_sum"] == 5.0
    assert got["big"]["winsorized_sum"] == sum(range(20))

    pq = str(tmp_path / "wins.parquet")
    df.write.mode("overwrite").parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW feed5 AS SELECT * FROM '{pq}/*.parquet'")
    o = {r[0]: r for r in con.execute(
        winsorized_stats_sql("feed5", "g", "value", "id", rate=1e-9)
    ).fetchall()}
    assert set(o) == {"big", "tiny"}
    assert o["tiny"][1] == 1 and o["tiny"][4] == 5.0


def test_ivf_pq_prunes_to_probe_cells_and_ranks_by_adc(spark, sf_dir):
    """The composed path's two contracts: (a) every result sits in one of
    the query's n_probe nearest coarse cells (the pruning really
    happened), (b) the ranking equals a brute-force ADC computation over
    the probed subset (the LUT scoring is exact for the trained codes)."""
    import math

    from cassandra_cql_streaming_db_migrator_spark.operators.clustering import (
        ivf_pq_ann,
        pq_train_assign,
    )
    from cassandra_cql_streaming_db_migrator_spark.sources.parquet import (
        load_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    m, sub_dim, n_cells, n_probe = 4, 16, 8, 2
    got = ivf_pq_ann(
        emb, query_id=0, topk=10, n_cells=n_cells, n_probe=n_probe
    ).collect()
    assert len(got) == 10

    rows = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.collect()
        if r["embedding"] is not None and len(r["embedding"]) >= m * sub_dim
    }
    cents = {cid: rows[cid] for cid in range(n_cells)}
    qv = rows[0]

    def sub_sq(a, b, s):
        acc = 0.0
        for i in range(s * sub_dim, (s + 1) * sub_dim):
            acc = acc + (a[i] - b[i]) * (a[i] - b[i])
        return acc

    def dist(a, b):
        d = sub_sq(a, b, 0)
        for s in range(1, m):
            d = d + sub_sq(a, b, s)
        return d

    probe = sorted((dist(qv, cv), cid) for cid, cv in cents.items())[:n_probe]
    probe_ids = {cid for _, cid in probe}
    assert {int(r["cell"]) for r in got} <= probe_ids

    # brute-force ADC over the probed subset using the trained codes
    frame, books = pq_train_assign(emb)
    codes = {
        int(r["vec_id"]): [int(r[f"__cid{s}"]) for s in range(m)]
        for r in frame.collect()
    }
    luts = []
    for s in range(m):
        q = qv[s * sub_dim:(s + 1) * sub_dim]
        luts.append([
            sum((a - b) * (a - b) for a, b in zip(q, c)) for c in books[s]
        ])
    member = {
        vid: min(
            ((dist(v, cv), cid) for cid, cv in cents.items())
        )[1]
        for vid, v in rows.items()
    }
    cand = [
        (sum(luts[s][codes[vid][s]] for s in range(m)), vid)
        for vid in rows
        if member[vid] in probe_ids
    ]
    want = sorted(cand)[:10]
    got_pairs = [(float(r["adc_dist"]), int(r["vec_id"])) for r in got]
    assert [v for _, v in got_pairs] == [v for _, v in want]
    for (gd, _), (wd, _) in zip(got_pairs, want):
        assert math.isclose(gd, wd, rel_tol=0, abs_tol=1e-9)
