"""Round-3 fourth-session operators: TPC-H decorrelation shapes,
systematic weighted sampling, embedding scatter matrix."""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

import numpy as np
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_cql_streaming_db_migrator_spark.operators.clustering import (
    embedding_scatter,
)


class TestEmbeddingScatter:
    def _make(self, spark, n=120, d=8, seed=5):
        rng = np.random.default_rng(seed)
        vecs = (rng.standard_normal((n, d)) * 0.3).astype(np.float32)
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
        return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), vecs

    def test_matches_numpy_exact_integers(self, spark):
        df, vecs = self._make(spark)
        got = {
            (r["i"], r["j"]): (r["n"], r["sx"], r["sy"], r["sxy"], r["scatter"])
            for r in embedding_scatter(df, n_dims=8, quant=1000).collect()
        }
        q = np.floor(vecs.astype(np.float64) * 1000 + 0.5).astype(np.int64)
        n = q.shape[0]
        s = q.sum(axis=0)
        g = q.T @ q
        assert len(got) == 8 * 9 // 2
        for (i, j), (gn, sx, sy, sxy, sc) in got.items():
            assert gn == n
            assert sx == s[i] and sy == s[j]
            assert sxy == g[i, j]
            assert sc == n * g[i, j] - s[i] * s[j]

    def test_single_shuffle_no_explode(self, spark):
        df, _ = self._make(spark)
        plan_buf = io.StringIO()
        with redirect_stdout(plan_buf):
            embedding_scatter(df, n_dims=8).explain("formatted")
        plan = plan_buf.getvalue()
        # one exchange (the 1-row aggregate state); the only Generate is
        # the stack() long-format pivot AFTER the aggregate (it runs on
        # the single result row, never on the data) — so it must appear
        # below the final HashAggregate, and the source is scanned once
        assert len(re.findall(r"\n\(\d+\) Exchange", plan)) == 1
        assert len(re.findall(r"\n\(\d+\) Scan", plan)) == 1
        gen_id = int(re.search(r"Generate \((\d+)\)", plan).group(1))
        agg_ids = [int(m) for m in re.findall(r"HashAggregate \((\d+)\)", plan)]
        assert agg_ids and gen_id > max(agg_ids)


class TestFuzzyKeyJoin:
    def test_all_edit_classes_and_false_positive_rejection(self, spark):
        from cassandra_cql_streaming_db_migrator_spark.operators.joins import (
            fuzzy_key_join,
        )

        left = spark.createDataFrame(
            [(1, "kettle"), (2, "ketle"), (3, "kettles"), (4, "kattle"),
             (5, "ab"), (6, "xyz")],
            "lid long, lkey string",
        )
        right = spark.createDataFrame(
            [(10, "kettle"), (20, "ba"), (30, "zzz")],
            "rid long, rkey string",
        )
        got = {
            (r["lid"], r["rid"])
            for r in fuzzy_key_join(left, right, "lkey", "rkey").collect()
        }
        # exact, deletion, insertion, substitution all match "kettle";
        # "ab"/"ba" share the deletion "a"+"b" neighborhoods but are 2
        # edits apart -> must be rejected; "xyz"/"zzz" never collide
        assert got == {(1, 10), (2, 10), (3, 10), (4, 10)}

    def test_complete_vs_brute_force(self, spark):
        import itertools

        from cassandra_cql_streaming_db_migrator_spark.operators.joins import (
            fuzzy_key_join,
        )

        def lev(a, b):
            d = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                prev, d[0] = d[0], i
                for j, cb in enumerate(b, 1):
                    prev, d[j] = d[j], min(
                        d[j] + 1, d[j - 1] + 1, prev + (ca != cb)
                    )
            return d[len(b)]

        # adversarial small alphabet -> dense near-collisions
        words = ["".join(w) for w in itertools.product("abc", repeat=3)]
        left = spark.createDataFrame(
            [(i, w) for i, w in enumerate(words)], "lid long, lkey string"
        )
        right = spark.createDataFrame(
            [(i, w) for i, w in enumerate(words)], "rid long, rkey string"
        )
        got = {
            (r["lid"], r["rid"])
            for r in fuzzy_key_join(left, right, "lkey", "rkey").collect()
        }
        want = {
            (i, j)
            for i, a in enumerate(words)
            for j, b in enumerate(words)
            if lev(a, b) <= 1
        }
        assert got == want

    def test_duplicate_input_rows_keep_join_multiplicity(self, spark):
        # ADVICE r03: the cross-block distinct must dedupe only the
        # variant dimension — genuinely duplicate input rows multiply
        # like a true join (2 left copies x 3 right copies = 6 pairs).
        from cassandra_cql_streaming_db_migrator_spark.operators.joins import (
            fuzzy_key_join,
        )

        left = spark.createDataFrame(
            [("kettle",), ("kettle",), ("ketle",)], "lkey string"
        )
        right = spark.createDataFrame(
            [("kettle",), ("kettle",), ("kettle",), ("ba",)], "rkey string"
        )
        rows = [
            (r["lkey"], r["rkey"])
            for r in fuzzy_key_join(left, right, "lkey", "rkey").collect()
        ]
        assert rows.count(("kettle", "kettle")) == 6
        assert rows.count(("ketle", "kettle")) == 3
        assert len(rows) == 9


class TestTriangleStats:
    def test_known_graph(self, spark):
        from cassandra_cql_streaming_db_migrator_spark.operators.graph import (
            triangle_stats,
        )

        # K4 on {1,2,3,4} (4 triangles, every node in 3) + pendant 5 + an
        # isolated edge 6-7 (triangle-free nodes must appear with 0)
        edges = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (6, 7)],
            "u long, v long",
        )
        got = {
            r["node"]: (r["degree"], r["n_triangles"])
            for r in triangle_stats(edges).collect()
        }
        assert got == {
            1: (3, 3), 2: (3, 3), 3: (3, 3), 4: (4, 3),
            5: (1, 0), 6: (1, 0), 7: (1, 0),
        }

    def test_cooccurrence_edges_canonical_distinct(self, spark):
        from cassandra_cql_streaming_db_migrator_spark.operators.graph import (
            cooccurrence_edges,
        )

        df = spark.createDataFrame(
            [(1, 10), (1, 20), (1, 20), (1, 30), (2, 10), (2, 20)],
            "g long, item long",
        )
        got = {
            (r["u"], r["v"])
            for r in cooccurrence_edges(df, "g", "item").collect()
        }
        # duplicates within a group collapse; the pair present in both
        # groups appears once; all pairs canonical u < v
        assert got == {(10, 20), (10, 30), (20, 30)}


class TestImagePhash:
    def test_avg_hash_known_pattern(self):
        from cassandra_cql_streaming_db_migrator_spark.operators.multimodal import (
            avg_hash_64,
            make_pgm,
        )

        # top half black, bottom half white: blocks 0..31 below the mean,
        # 32..63 above -> lo = 0, hi = 2^32 - 1
        px = bytes([0] * 128 + [200] * 128)
        hi, lo = avg_hash_64(make_pgm(px, 16, 16))
        assert (hi, lo) == (2**32 - 1, 0)
        # uniform image: no block is strictly above the mean -> all zero
        assert avg_hash_64(make_pgm(bytes([7] * 256), 16, 16)) == (0, 0)

    def test_avg_hash_rejects_non_square_and_garbage(self):
        from cassandra_cql_streaming_db_migrator_spark.operators.multimodal import (
            avg_hash_64,
            make_pgm,
        )

        assert avg_hash_64(make_pgm(bytes(32), 8, 4)) is None
        assert avg_hash_64(b"RIFFnotanimage") is None

    def test_hamming_pairs_complete_vs_brute(self, spark):
        import random

        from cassandra_cql_streaming_db_migrator_spark.operators.multimodal import (
            hamming_near_pairs,
        )

        rng = random.Random(11)
        hashes = [rng.getrandbits(64) for _ in range(150)]
        # plant near-duplicates: flip 0..3 random bits of earlier entries
        for k in range(30):
            base = hashes[k]
            for b in rng.sample(range(64), rng.randint(0, 3)):
                base ^= 1 << b
            hashes.append(base)
        rows = [(i, h >> 32, h & 0xFFFFFFFF) for i, h in enumerate(hashes)]
        df = spark.createDataFrame(rows, "doc_id long, hash_hi long, hash_lo long")
        got = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in hamming_near_pairs(df, max_dist=3).collect()
        }
        want = {
            (i, j, bin(hashes[i] ^ hashes[j]).count("1"))
            for i in range(len(hashes))
            for j in range(i + 1, len(hashes))
            if bin(hashes[i] ^ hashes[j]).count("1") <= 3
        }
        assert got == want


class TestPeakConcurrency:
    def test_known_intervals_and_midnight_span(self, spark):
        from datetime import datetime

        from cassandra_cql_streaming_db_migrator_spark.operators.events import (
            peak_concurrency,
        )

        D = datetime
        rows = [
            # three overlapping in the 10:00 hour on Jan 1 (peak 3)
            (D(2024, 1, 1, 10, 0), D(2024, 1, 1, 11, 0)),
            (D(2024, 1, 1, 10, 30), D(2024, 1, 1, 12, 0)),
            (D(2024, 1, 1, 10, 45), D(2024, 1, 1, 10, 50)),
            # end-exclusive: starts exactly when the first ends -> with
            # delta-desc ordering it overlaps the second (still <= 3)
            (D(2024, 1, 1, 11, 0), D(2024, 1, 1, 11, 5)),
            # spans midnight: counts on Jan 2 as well (peak 1 there)
            (D(2024, 1, 1, 23, 30), D(2024, 1, 2, 0, 30)),
        ]
        df = spark.createDataFrame(
            rows, "session_start timestamp, session_end timestamp"
        )
        got = {
            r["day"].strftime("%m-%d"): r["peak"]
            for r in peak_concurrency(df).collect()
        }
        assert got == {"01-01": 3, "01-02": 1}

    def test_boundary_touch_counts_as_overlap(self, spark):
        from datetime import datetime

        from cassandra_cql_streaming_db_migrator_spark.operators.events import (
            peak_concurrency,
        )

        D = datetime
        # B starts at the exact instant A ends: +1 sorts before -1, so the
        # sweep sees both open for one instant -> peak 2
        df = spark.createDataFrame(
            [
                (D(2024, 3, 5, 9, 0), D(2024, 3, 5, 10, 0)),
                (D(2024, 3, 5, 10, 0), D(2024, 3, 5, 11, 0)),
            ],
            "session_start timestamp, session_end timestamp",
        )
        got = {r["day"].day: r["peak"] for r in peak_concurrency(df).collect()}
        assert got == {5: 2}

    def test_empty_and_inverted_intervals_dropped(self, spark):
        # ADVICE r03: end <= start used to throw "Illegal sequence
        # boundaries" on raw interval inputs; end-exclusive semantics make
        # such intervals empty, so they contribute nothing.
        from datetime import datetime

        from cassandra_cql_streaming_db_migrator_spark.operators.events import (
            peak_concurrency,
        )

        D = datetime
        df = spark.createDataFrame(
            [
                (D(2024, 3, 5, 9, 0), D(2024, 3, 5, 10, 0)),
                (D(2024, 3, 5, 9, 30), D(2024, 3, 5, 9, 30)),  # empty
                (D(2024, 3, 5, 9, 30), D(2024, 3, 4, 9, 0)),  # inverted
            ],
            "session_start timestamp, session_end timestamp",
        )
        got = {r["day"].day: r["peak"] for r in peak_concurrency(df).collect()}
        assert got == {5: 1}


class TestJaccardJoin:
    def test_complete_vs_brute_force(self, spark):
        import random

        from cassandra_cql_streaming_db_migrator_spark.operators.dedup import (
            jaccard_join,
        )

        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(50)]
        rows = []
        for i in range(120):
            size = rng.randint(3, 20)
            rows.append((i, sorted(rng.sample(vocab, size))))
        # plant near-duplicates with one token swapped / dropped
        for k in range(25):
            base = list(rows[k][1])
            if len(base) > 4:
                base.pop(rng.randrange(len(base)))
            rows.append((1000 + k, base))
        df = spark.createDataFrame(rows, "sid long, toks array<string>")
        got = {
            (r["id_a"], r["id_b"]): (r["n_inter"], r["n_union"], r["jac_fp"])
            for r in jaccard_join(df, "sid", "toks", 3, 5).collect()
        }
        sets = {i: frozenset(t) for i, t in rows}
        want = {}
        for a in sets:
            for b in sets:
                if a >= b:
                    continue
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if union and 5 * inter >= 3 * union:
                    want[(a, b)] = (inter, union, 1_000_000 * inter // union)
        assert got == want
        assert len(want) >= 25  # the planted near-dups all qualify

    def test_identical_and_empty_sets(self, spark):
        from cassandra_cql_streaming_db_migrator_spark.operators.dedup import (
            jaccard_join,
        )

        df = spark.createDataFrame(
            [(1, ["a", "b"]), (2, ["a", "b"]), (3, []), (4, ["z"])],
            "sid long, toks array<string>",
        )
        got = {
            (r["id_a"], r["id_b"]): r["jac_fp"]
            for r in jaccard_join(df, "sid", "toks").collect()
        }
        # identical pair at exactly 1.0; empty set excluded; singleton alone
        assert got == {(1, 2): 1_000_000}


def _ref_bpe(word_counts, n_merges, min_count=2):
    """Independent pure-Python BPE (Sennrich-style) for pinning."""
    words = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for rank in range(n_merges):
        pairs = {}
        for syms, n in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        if cnt < min_count:
            break
        merges.append((rank, l, r, cnt))
        new = {}
        for syms, n in words.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new[tuple(res)] = new.get(tuple(res), 0) + n
        words = new
    return merges


class TestBpeTrain:
    def test_matches_reference_on_classic_corpus(self, spark):
        from cassandra_cql_streaming_db_migrator_spark.operators.bpe import (
            bpe_train,
        )

        census = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        df = spark.createDataFrame(list(census.items()), "word string, n long")
        got = bpe_train(df, n_merges=8)
        assert got == _ref_bpe(census, 8)
        # the classic first merges: 'es' (9), then 'est' (9)
        assert got[0][1:3] == ("e", "s") and got[1][1:3] == ("es", "t")

    def test_matches_reference_on_fixture_corpus(self, spark):
        import duckdb

        from cassandra_cql_streaming_db_migrator_spark.operators.bpe import (
            bpe_train,
            word_census,
        )
        from cassandra_cql_streaming_db_migrator_spark.sources.parquet import (
            load_table,
        )

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        got = bpe_train(word_census(docs), n_merges=12)
        ref_counts = dict(
            duckdb.sql(
                "SELECT word, count(*) FROM (SELECT unnest(string_split(text, ' ')) AS word "
                "FROM '/root/testdata/sf0.001/documents.parquet') w "
                "WHERE word <> '' GROUP BY word"
            ).fetchall()
        )
        assert got == _ref_bpe(ref_counts, 12)
        assert len(got) == 12

    def test_encode_census_compresses(self, spark):
        from cassandra_cql_streaming_db_migrator_spark.operators.bpe import (
            bpe_encode_census,
            bpe_train,
        )

        census = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        df = spark.createDataFrame(list(census.items()), "word string, n long")
        merges = bpe_train(df, n_merges=8)
        enc = {
            r["word"]: (list(r["tokens"]), r["n_tokens"])
            for r in bpe_encode_census(df, merges).collect()
        }
        # every word round-trips (concat of tokens == word) and compresses
        for w, (toks, nt) in enc.items():
            assert "".join(toks) == w
            assert nt == len(toks) <= len(w)
        assert enc["newest"][1] < len("newest")  # actual compression

    def test_distributed_path_equals_local_path(self, spark):
        from cassandra_cql_streaming_db_migrator_spark.operators.bpe import (
            bpe_train,
        )

        census = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "wide": 1}
        df = spark.createDataFrame(list(census.items()), "word string, n long")
        local = bpe_train(df, n_merges=6)  # census below threshold
        dist = bpe_train(df, n_merges=6, local_threshold=0)  # force rounds
        assert local == dist == _ref_bpe(census, 6)


class TestProductQuantization:
    def test_matches_independent_numpy_lloyd(self, spark):
        import numpy as np

        from cassandra_cql_streaming_db_migrator_spark.operators.clustering import (
            pq_code_census,
        )

        rng = np.random.default_rng(3)
        vecs = (rng.standard_normal((90, 8)) * 0.4).astype(np.float32)
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {
            r["code"]: (r["n_vecs"], r["err"])
            for r in pq_code_census(
                df, m=2, k=3, sub_dim=4, iterations=2
            ).collect()
        }

        # independent reference with the engine's exact rules: seed = first
        # k vectors by id, sequential-fold distances, argmin ties -> lowest
        # cid, quantized-integer means
        def lloyd(x, k, iters):
            cents = [x[i].astype(np.float64) for i in range(k)]
            for _ in range(iters):
                d = np.array(
                    [[sum((row - c) ** 2) for c in cents] for row in x.astype(np.float64)]
                )
                cid = d.argmin(axis=1)
                for c in range(k):
                    sel = x[cid == c].astype(np.float64)
                    if len(sel):
                        q = np.floor(sel * 1e10 + 0.5).sum(axis=0)
                        cents[c] = q / len(sel) / 1e10
            d = np.array(
                [[sum((row - c) ** 2) for c in cents] for row in x.astype(np.float64)]
            )
            return d.argmin(axis=1), d.min(axis=1)

        c0, e0 = lloyd(vecs[:, :4], 3, 2)
        c1, e1 = lloyd(vecs[:, 4:], 3, 2)
        codes = c0 + 3 * c1
        want = {}
        for code in set(codes):
            sel = codes == code
            tot = e0[sel] + e1[sel]
            err = round(float(np.floor(tot * 1e6 + 0.5).sum() / 1e6), 4)
            want[int(code)] = (int(sel.sum()), err)
        assert got == want

    def test_census_conserves_vectors(self, spark):
        import numpy as np

        from cassandra_cql_streaming_db_migrator_spark.operators.clustering import (
            pq_code_census,
        )

        rng = np.random.default_rng(9)
        vecs = (rng.standard_normal((64, 64)) * 0.3).astype(np.float32)
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = pq_code_census(df).collect()
        assert sum(r["n_vecs"] for r in out) == 64
        assert all(0 <= r["code"] < 4**4 for r in out)

    def test_adc_topk_matches_numpy_reference(self, spark):
        import numpy as np

        from cassandra_cql_streaming_db_migrator_spark.operators.clustering import (
            pq_ann_topk,
        )

        rng = np.random.default_rng(4)
        vecs = (rng.standard_normal((80, 8)) * 0.4).astype(np.float32)
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = [
            (r["vec_id"], r["adc_dist"])
            for r in pq_ann_topk(
                df, query_id=5, topk=8, m=2, k=3, sub_dim=4, iterations=2
            ).collect()
        ]

        def lloyd(x, k, iters):
            cents = [x[i].astype(np.float64) for i in range(k)]
            for _ in range(iters):
                d = np.array(
                    [[sum((row - c) ** 2) for c in cents] for row in x.astype(np.float64)]
                )
                cid = d.argmin(axis=1)
                for c in range(k):
                    sel = x[cid == c].astype(np.float64)
                    if len(sel):
                        cents[c] = np.floor(sel * 1e10 + 0.5).sum(axis=0) / len(sel) / 1e10
            d = np.array(
                [[sum((row - c) ** 2) for c in cents] for row in x.astype(np.float64)]
            )
            return d.argmin(axis=1), cents

        c0, cent0 = lloyd(vecs[:, :4], 3, 2)
        c1, cent1 = lloyd(vecs[:, 4:], 3, 2)
        q = vecs[5].astype(np.float64)
        lut0 = [sum((q[:4] - c) ** 2) for c in cent0]
        lut1 = [sum((q[4:] - c) ** 2) for c in cent1]
        dists = [(lut0[c0[i]] + lut1[c1[i]], i) for i in range(80)]
        want = [(i, d) for d, i in sorted(dists)[:8]]
        assert [i for i, _ in got] == [i for i, _ in want]
        for (gi, gd), (wi, wd) in zip(got, want):
            assert abs(gd - wd) < 1e-12


class TestSkyline2d:
    @staticmethod
    def _brute(points):
        out = {}
        for a in points:
            dominated = any(
                b[0] <= a[0] and b[1] >= a[1] and b != a
                for b in points
            )
            if not dominated:
                out[a] = out.get(a, 0) + 1
        return {(q, p): n for (p, q), n in out.items()}

    def test_matches_brute_force_with_ties_and_duplicates(self, spark):
        import random

        from cassandra_cql_streaming_db_migrator_spark.operators.windows import (
            skyline_2d,
        )

        rng = random.Random(13)
        pts = [(rng.randint(1, 40) * 1.0, rng.randint(1, 40)) for _ in range(300)]
        pts += pts[:10]  # coincident duplicates must all survive
        df = spark.createDataFrame(
            [(p, q) for p, q in pts], "price double, qty long"
        ).repartition(7)  # local frontiers merge across partitions
        got = {
            (r["qty"], r["price"]): r["n_points"]
            for r in skyline_2d(df, "price", "qty").collect()
        }
        assert got == self._brute(pts)

    def test_single_dominant_point(self, spark):
        from cassandra_cql_streaming_db_migrator_spark.operators.windows import (
            skyline_2d,
        )

        df = spark.createDataFrame(
            [(1.0, 100), (2.0, 99), (3.0, 100), (1.0, 50)],
            "price double, qty long",
        )
        got = {
            (r["qty"], r["price"]): r["n_points"]
            for r in skyline_2d(df, "price", "qty").collect()
        }
        assert got == {(100, 1.0): 1}


class TestExpectations:
    def test_each_rule_kind_counts_injected_violations(self, spark):
        from cassandra_cql_streaming_db_migrator_spark.plans.expectations import (
            Rule,
            check_expectations,
        )

        fact = spark.createDataFrame(
            [(1, 10, 5.0, "A"), (2, 10, -1.0, "B"), (2, None, 99.0, "C"),
             (3, 30, 2.0, "A"), (3, 30, 3.0, None)],
            "pk long, fk long, v double, cat string",
        )
        dim = spark.createDataFrame([(10,), (20,)], "dk long")
        rules = [
            Rule("pk_unique", "fact", "unique", {"cols": ["pk"]}),
            Rule("fk_not_null", "fact", "not_null", {"col": "fk"}),
            Rule("fk_exists", "fact", "foreign_key",
                 {"col": "fk", "ref_table": "dim", "ref_col": "dk"}),
            Rule("v_in_0_10", "fact", "in_range",
                 {"col": "v", "lo": 0.0, "hi": 10.0}),
            Rule("cat_allowed", "fact", "accepted_values",
                 {"col": "cat", "values": ["A", "B"]}),
            Rule("ten_rows_min", "fact", "min_rows", {"n": 10}),
            Rule("one_row_min", "fact", "min_rows", {"n": 1}),
        ]
        got = {
            r["rule"]: r["n_violations"]
            for r in check_expectations({"fact": fact, "dim": dim}, rules).collect()
        }
        assert got == {
            "pk_unique": 2,        # pk 2 twice, pk 3 twice -> 2 excess rows
            "fk_not_null": 1,      # one NULL fk
            "fk_exists": 2,        # fk=30 twice (NULL fk not an FK violation)
            "v_in_0_10": 2,        # -1.0 and 99.0
            "cat_allowed": 1,      # 'C' (NULL not a value violation)
            "ten_rows_min": 5,     # 10 - 5 rows
            "one_row_min": 0,
        }


class TestEntityResolutionPieces:
    def test_extra_on_blocking_restricts_candidates(self, spark):
        from cassandra_cql_streaming_db_migrator_spark.operators.joins import (
            fuzzy_key_join,
        )

        left = spark.createDataFrame(
            [(1, "abcd", "US"), (2, "abcd", "DE")],
            "lid long, lkey string, nat string",
        )
        right = spark.createDataFrame(
            [(10, "abce", "US"), (20, "abce", "DE")],
            "rid long, rkey string, nat string",
        )
        got = {
            (r["lid"], r["rid"])
            for r in fuzzy_key_join(
                left, right, "lkey", "rkey", extra_on=["nat"]
            ).collect()
        }
        # without nat folding this would be all four cross pairs
        assert got == {(1, 10), (2, 20)}


class TestKmvSetOps:
    def test_exact_under_k_and_estimator_over_k(self, spark):
        from cassandra_cql_streaming_db_migrator_spark.operators.sketches import (
            kmv_set_estimate,
        )

        # A = {0..5}, B = {3..9}: small sets -> exact short-circuit
        rows = [("a", i) for i in range(6)] + [("b", i) for i in range(3, 10)]
        df = spark.createDataFrame(rows, "lbl string, key long")
        r = kmv_set_estimate(df, "lbl", "key", "a", "b", k=64).collect()[0]
        assert (r["exact_a"], r["exact_b"]) == (6, 7)
        assert r["exact_union"] == 10 and r["exact_inter"] == 3
        assert r["union_est"] == 10.0 and r["inter_est"] == 3.0

        # larger sets with k=8 -> the estimator path; estimates must be
        # positive, finite, and within a loose factor of truth
        rows = [("a", i) for i in range(500)] + [
            ("b", i) for i in range(250, 750)
        ]
        df = spark.createDataFrame(rows, "lbl string, key long")
        r = kmv_set_estimate(df, "lbl", "key", "a", "b", k=8).collect()[0]
        assert r["exact_union"] == 750 and r["exact_inter"] == 250
        assert 150 < r["union_est"] < 4000
        assert 0 <= r["inter_est"] < 4000
