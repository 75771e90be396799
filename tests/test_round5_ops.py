"""Round-5 operator unit tests: bitmap audience algebra, HLL registers,
portable checksums, distributed selection, attribution edge cases."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F


def test_bitmap_overlap_matches_set_definition(spark):
    from cassandra_cql_streaming_db_migrator_spark.operators.sketches import (
        bitmap_audience_overlap,
    )

    rows = []
    # a: {1..80}, b: {41..120}, c: {200}; duplicates on purpose
    rows += [("a", u) for u in range(1, 81)] * 2
    rows += [("b", u) for u in range(41, 121)]
    rows += [("c", 200)]
    rows += [("a", None), (None, 5), ("a", -3)]  # filtered
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    got = {
        (r["type_a"], r["type_b"]): (
            r["n_a"], r["n_b"], r["n_both"], r["jaccard_ppm"]
        )
        for r in bitmap_audience_overlap(df).collect()
    }
    # overlap {41..80} = 40; union 120; c shares nothing -> absent
    assert got == {("a", "b"): (80, 80, 40, 1_000_000 * 40 // 120)}


def test_bitmap_words_cross_word_boundaries(spark):
    from cassandra_cql_streaming_db_migrator_spark.operators.sketches import (
        bitmap_audience_overlap,
    )

    # keys straddling the 64-bit word boundary (63, 64) and a high word
    df = spark.createDataFrame(
        [("x", 63), ("x", 64), ("x", 10_000), ("y", 63), ("y", 64)],
        "event_type string, user_id long",
    )
    [r] = bitmap_audience_overlap(df).collect()
    assert (r["n_a"], r["n_b"], r["n_both"]) == (3, 2, 2)


def test_hll_estimate_within_expected_error(spark):
    from cassandra_cql_streaming_db_migrator_spark.operators.sketches import (
        hll_register_sketch,
    )

    n = 20_000
    df = spark.createDataFrame([Row(k=i * 7) for i in range(n)])
    [r] = hll_register_sketch(df, "k").collect()
    assert r["exact_distinct"] == n
    est = r["est_distinct_x1e6"] / 1e6
    # raw HLL with m=512: std error ~ 1.04/sqrt(512) ~ 4.6%; allow 4 sigma
    assert abs(est - n) / n < 0.2
    assert r["n_registers_hit"] <= 512


def test_hll_merge_property(spark):
    """The register table is mergeable: sketch(A union B) == register-wise
    max of sketch(A), sketch(B) -> identical estimate."""
    from cassandra_cql_streaming_db_migrator_spark.operators.sketches import (
        hll_register_sketch,
    )

    a = spark.createDataFrame([Row(k=i) for i in range(0, 3000)])
    b = spark.createDataFrame([Row(k=i) for i in range(1500, 5000)])
    u = a.unionByName(b)
    [ru] = hll_register_sketch(u, "k").collect()
    # recompute union estimate from the two subsketches' merged registers
    from cassandra_cql_streaming_db_migrator_spark.operators.sketches import (
        HLL_ALPHA_PPM,
        HLL_POWB,
        HLL_P_BITS,
        HLL_RHO_EMPTY,
        kmv_hash,
    )

    m = 1 << HLL_P_BITS

    def regs(df):
        base = df.select(kmv_hash("k").alias("h")).select(
            F.expr(f"h % {m}").alias("reg"), F.expr(f"h DIV {m}").alias("suf")
        )
        rho = (
            F.when(F.col("suf") == 0, F.lit(HLL_RHO_EMPTY))
            .otherwise(F.expr("bit_count((suf & -suf) - 1) + 1"))
        )
        return {
            r["reg"]: r["M"]
            for r in base.select("reg", rho.alias("rho"))
            .groupBy("reg")
            .agg(F.max("rho").alias("M"))
            .collect()
        }

    ra, rb = regs(a), regs(b)
    merged = {k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)}
    pow_full = 1 << HLL_POWB
    s = sum(pow_full >> v for v in merged.values()) + (
        m - len(merged)
    ) * pow_full
    est = HLL_ALPHA_PPM * m * m * pow_full // s
    assert est == ru["est_distinct_x1e6"]


def test_table_checksum_order_and_partition_invariant(spark):
    from cassandra_cql_streaming_db_migrator_spark.operators.profile import (
        table_checksum,
    )

    spec = [("int", "a"), ("str", "b"), ("cents", "c")]
    rows = [Row(a=i, b=f"s{i}", c=i * 1.01) for i in range(500)]
    df1 = spark.createDataFrame(rows).repartition(13)
    df2 = spark.createDataFrame(list(reversed(rows))).repartition(3)
    [r1] = table_checksum(df1, "t", spec).collect()
    [r2] = table_checksum(df2, "t", spec).collect()
    assert (r1["n_rows"], r1["checksum"]) == (r2["n_rows"], r2["checksum"])


def test_table_checksum_detects_single_cell_drift(spark):
    from cassandra_cql_streaming_db_migrator_spark.operators.profile import (
        table_checksum,
    )

    spec = [("int", "a"), ("str", "b")]
    rows = [Row(a=i, b=f"s{i}") for i in range(100)]
    drifted = [Row(a=i, b=("XX" if i == 57 else f"s{i}")) for i in range(100)]
    [r1] = table_checksum(spark.createDataFrame(rows), "t", spec).collect()
    [r2] = table_checksum(spark.createDataFrame(drifted), "t", spec).collect()
    assert r1["checksum"] != r2["checksum"]
    assert r1["n_rows"] == r2["n_rows"]


def test_exact_median_odd_even(spark, tmp_path):
    """distributed-selection median == sorted-middle definition for odd
    and even row counts (via a tiny parquet fixture dir)."""
    import os

    from cassandra_cql_streaming_db_migrator_spark.queries.analytics import (
        exact_median,
    )

    for n in (7, 8):
        d = str(tmp_path / f"sf{n}")
        os.makedirs(d, exist_ok=True)
        vals = [(i + 1, 1, float(10 * (i + 1))) for i in range(n)]
        spark.createDataFrame(
            vals, "l_orderkey long, l_linenumber long, l_extendedprice double"
        ).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
        [r] = exact_median(spark, d).collect()
        cents = sorted(int(v * 100 + 0.5) for _, _, v in vals)
        if n % 2:
            want = 2 * cents[n // 2]
        else:
            want = cents[n // 2 - 1] + cents[n // 2]
        assert (r["n_rows"], r["median_cents_x2"]) == (n, want)


def test_last_touch_attribution_no_prior_touch(spark):
    from cassandra_cql_streaming_db_migrator_spark.operators.events import (
        last_touch_attribution,
    )
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: purchase BEFORE any touch -> 'none'; later purchase
        # after click -> 'click'
        (1, t0, "purchase", 10.0, 1),
        (1, t0 + dt.timedelta(minutes=1), "click", 0.0, 2),
        (1, t0 + dt.timedelta(minutes=2), "purchase", 20.0, 3),
        # user 2: same-timestamp tie broken by event_id (view id=4 is
        # earlier than purchase id=5 -> view credited)
        (2, t0, "view", 0.0, 4),
        (2, t0, "purchase", 5.0, 5),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, "
        "value double, event_id long"
    )
    got = {
        r["attributed_type"]: (r["n_conversions"], r["revenue_cents"])
        for r in last_touch_attribution(
            df, ["click", "view", "signup"]
        ).collect()
    }
    assert got == {
        "none": (1, 1000),
        "click": (1, 2000),
        "view": (1, 500),
    }


def test_activity_streaks_islands(spark):
    from cassandra_cql_streaming_db_migrator_spark.operators.events import (
        activity_streaks,
    )
    import datetime as dt

    def ts(day, h=0):
        return dt.datetime(2024, 1, day, h)

    rows = (
        # user 1: days 1,2,3 then 5 -> longest 3
        [(1, ts(1)), (1, ts(2)), (1, ts(3)), (1, ts(5)), (1, ts(2, 5))]
        # user 2: day 10 only -> longest 1
        + [(2, ts(10))]
        # user 3: 1,2 and 7,8,9,10 -> longest 4
        + [(3, ts(1)), (3, ts(2)), (3, ts(7)), (3, ts(8)), (3, ts(9)),
           (3, ts(10))]
    )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["streak_days"]: r["n_users"]
        for r in activity_streaks(df).collect()
    }
    assert got == {3: 1, 1: 1, 4: 1}


def test_knn_graph_reciprocal_flags(spark):
    """Mutual-kNN marking on a constructed geometry: a tight pair is
    mutually top-1; a distant point picks one of them without being
    picked back at rank<=k when k=1."""
    from cassandra_cql_streaming_db_migrator_spark.operators.similarity import (
        block_knn_edges,
    )

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.999, 0.01], 0),   # near-duplicate of 0
        (2, [0.5, 0.86], 0),     # far from both
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cell long"
    )
    edges = block_knn_edges(df, k=1, block_col="cell")
    got = {(r["vec_id"], r["nbr_id"]) for r in edges.collect()}
    # 0<->1 mutual; 2 -> 1 (or 0) one-directional
    assert (0, 1) in got and (1, 0) in got
    assert len(got) == 3


def test_image_tile_stats_sums_match_full_image(spark):
    """Patch sums over the 4x4 grid must add up to the full-image pixel
    sum from the real decoder."""
    from cassandra_cql_streaming_db_migrator_spark.operators.multimodal import (
        attach_media_payload,
        image_tile_stats,
    )

    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    tiles = image_tile_stats(attach_media_payload(docs), tile=4).collect()
    assert len(tiles) == 16
    text = "the quick brown fox jumps over the lazy dog"
    raw = text.encode()
    units = (raw * (256 // len(raw) + 1))[:256]
    assert sum(r["tile_sum"] for r in tiles) == sum(units)
    assert max(r["tile_max"] for r in tiles) == max(units)
    assert min(r["tile_min"] for r in tiles) == min(units)


def test_ema_prices_hand_computed(spark, tmp_path):
    """EMA weights 2^(15-j) over most-recent-first orders, exact integer."""
    import datetime as dt
    import os

    from cassandra_cql_streaming_db_migrator_spark.queries.analytics import (
        ema_prices,
    )

    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    rows = [
        # custkey 1: three orders, newest 30.00, then 20.00, then 10.00
        (1, 1, 10.00, dt.datetime(2024, 1, 1)),
        (2, 1, 20.00, dt.datetime(2024, 1, 2)),
        (3, 1, 30.00, dt.datetime(2024, 1, 3)),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp",
    ).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
    [r] = ema_prices(spark, d).collect()
    w = [1 << 15, 1 << 14, 1 << 13]
    cents = [3000, 2000, 1000]  # most recent first
    want = 1_000_000 * sum(c * x for c, x in zip(cents, w)) // sum(w)
    assert (r["n_used"], r["ema_ppm"]) == (3, want)


class TestStarCC:
    def _star(self, spark, edges):
        from cassandra_cql_streaming_db_migrator_spark.operators.dedup import (
            connected_components_star,
        )

        df = spark.createDataFrame(edges, "doc_id_1 long, doc_id_2 long")
        return {
            (r["doc_id"]): (r["component_id"], r["comp_size"])
            for r in connected_components_star(
                df, "doc_id_1", "doc_id_2"
            ).collect()
        }

    def test_long_path_graph(self, spark):
        """A 200-node path: min-label propagation needs ~200 rounds; the
        star algorithm converges in O(log n) — within max_iter=25."""
        got = self._star(spark, [(i, i + 1) for i in range(200)])
        assert got == {i: (0, 201) for i in range(201)}

    def test_hub_and_islands(self, spark):
        edges = [(100, i) for i in range(90, 100)]  # star rooted at 90
        edges += [(7, 8), (8, 9)]  # path component min 7
        edges += [(55, 54)]  # pair
        got = self._star(spark, edges)
        assert {k for k, v in got.items() if v[0] == 90} == set(range(90, 101))
        assert {k for k, v in got.items() if v[0] == 7} == {7, 8, 9}
        assert got[55] == (54, 2)

    def test_matches_min_label_cc_on_fixture_pairs(self, spark, sf_dir):
        from cassandra_cql_streaming_db_migrator_spark.operators.dedup import (
            connected_components,
            connected_components_star,
            fuzzy_dedup_pairs,
        )
        from cassandra_cql_streaming_db_migrator_spark.sources.parquet import (
            load_table,
        )

        docs = load_table(spark, sf_dir, "documents")
        pairs = fuzzy_dedup_pairs(docs, "text", "doc_id").select(
            "doc_id_1", "doc_id_2"
        ).persist()
        a = sorted(
            map(
                tuple,
                connected_components(pairs, "doc_id_1", "doc_id_2").collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                connected_components_star(
                    pairs, "doc_id_1", "doc_id_2"
                ).collect(),
            )
        )
        assert a == b
        assert a  # non-vacuous


def test_table_checksum_null_shift_and_separator_injection(spark):
    """The two concat_ws ambiguity classes (review finding): a value
    shifting across a NULL column, and a '|' injected into a string
    column, must both change the fingerprint."""
    from cassandra_cql_streaming_db_migrator_spark.operators.profile import (
        table_checksum,
    )

    spec = [("int", "a"), ("str", "b"), ("str", "c")]

    def cks(rows):
        df = spark.createDataFrame(rows, "a long, b string, c string")
        return table_checksum(df, "t", spec).collect()[0]["checksum"]

    # NULL shift: (b=NULL, c='x') vs (b='x', c=NULL)
    assert cks([(1, None, "x")]) != cks([(1, "x", None)])
    # separator injection: ('a|b', 'c') vs ('a', 'b|c')
    assert cks([(1, "a|b", "c")]) != cks([(1, "a", "b|c")])
