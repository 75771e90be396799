"""Randomized differential tests for the round-6 operators: many seeded
random cases per Spark job, each compared against a direct pure-Python
reference (Spark-free, loop-based, obviously correct)."""

from __future__ import annotations

import math
import random

from pyspark.sql import Row


def _ref_span_removal(texts, span_len):
    """Brute-force ExactSubstr removal: window multiset with multiplicity,
    >=2-occurrence spans, coverage union, surviving words."""
    windows = []  # (doc, pos, span-string)
    for d, t in texts.items():
        ws = t.split(" ")
        for i in range(len(ws) - span_len + 1):
            windows.append((d, i, " ".join(ws[i : i + span_len])))
    occ: dict[str, int] = {}
    for _, _, s in windows:
        occ[s] = occ.get(s, 0) + 1
    dup = {s for s, n in occ.items() if n >= 2}
    out = {}
    for d, t in texts.items():
        ws = t.split(" ")
        covered = [False] * len(ws)
        for dd, i, s in windows:
            if dd == d and s in dup:
                for j in range(i, i + span_len):
                    covered[j] = True
        kept = [w for w, c in zip(ws, covered) if not c]
        n_rm = sum(covered)
        out[d] = (
            len(ws),
            n_rm,
            1_000_000 * n_rm // len(ws),
            " ".join(kept),
        )
    return out


def test_span_removal_matches_reference_random_corpora(spark):
    rng = random.Random(13)
    vocab = ["a", "b", "c", "d", "e"]
    texts = {
        d: " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 25)))
        for d in range(80)
    }
    from cassandra_cql_streaming_db_migrator_spark.operators.corpus import (
        dup_span_removal,
    )

    df = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in texts.items()])
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["n_removed_words"],
            r["removed_ppm"],
            r["cleaned_text"],
        )
        for r in dup_span_removal(df, span_len=3).collect()
    }
    assert got == _ref_span_removal(texts, 3)


def _fold_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def _ref_mmr(vectors, qid, k, k_cand, lam):
    """Independent greedy MMR over the exact top-k_cand candidates."""
    q = vectors[qid]
    rel = {
        i: _fold_dot(v, q) / (math.sqrt(_fold_dot(v, v)) * math.sqrt(_fold_dot(q, q)))
        for i, v in vectors.items()
    }
    cand = sorted(vectors, key=lambda i: (-rel[i], i))[:k_cand]
    chosen: list[int] = []
    out = []
    for rank in range(1, k + 1):
        best = None
        for i in cand:
            if i in chosen:
                continue
            if chosen:
                sims = [
                    _fold_dot(vectors[i], vectors[s])
                    / (
                        math.sqrt(_fold_dot(vectors[i], vectors[i]))
                        * math.sqrt(_fold_dot(vectors[s], vectors[s]))
                    )
                    for s in chosen
                ]
                score = lam * rel[i] - (1 - lam) * max(sims)
            else:
                score = lam * rel[i]
            key = (-score, i)
            if best is None or key < best[0]:
                best = (key, i, score)
        _, bid, bscore = best
        out.append((rank, bid, rel[bid], bscore))
        chosen.append(bid)
    return out


def test_mmr_matches_reference_random_vectors(spark):
    rng = random.Random(29)
    vectors = {
        i: [float(rng.randrange(-8, 9)) or 1.0 for _ in range(6)]
        for i in range(40)
    }
    from cassandra_cql_streaming_db_migrator_spark.operators.similarity import (
        mmr_rerank,
    )

    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in vectors.items()]
    )
    query = df.where("vec_id = 3")
    got = [
        (r["rank"], r["vec_id"], r["relevance"], r["mmr_score"])
        for r in mmr_rerank(
            df, query, k=5, k_candidates=12, lam=0.75
        ).collect()
    ]
    assert got == _ref_mmr(vectors, 3, 5, 12, 0.75)


def test_grouped_hll_exact_control_counts_keys(spark):
    """ADVICE r05 fix pinned: the grouped control is countDistinct over
    KEYS (the ungrouped variant's meaning), not over hashes."""
    rng = random.Random(41)
    rows, expected = [], {}
    for g in range(12):
        keys = [rng.randrange(0, 500) for _ in range(rng.randrange(1, 300))]
        expected[f"g{g}"] = len(set(keys))
        rows.extend(Row(grp=f"g{g}", key=k) for k in keys)
    from cassandra_cql_streaming_db_migrator_spark.operators.sketches import (
        hll_register_sketch_grouped,
    )

    df = spark.createDataFrame(rows)
    got = {
        r["grp"]: r["exact_distinct"]
        for r in hll_register_sketch_grouped(df, "grp", "key").collect()
    }
    assert got == expected


def test_bpe_encode_random_corpus_roundtrip(spark):
    """Random-corpus train+encode: decoding (token string concat) must
    reproduce each text modulo spaces, and every id must be in-vocab."""
    rng = random.Random(53)
    vocab = "abcd"
    texts = {
        d: " ".join(
            "".join(rng.choice(vocab) for _ in range(rng.randrange(1, 7)))
            for _ in range(rng.randrange(1, 15))
        )
        for d in range(50)
    }
    from cassandra_cql_streaming_db_migrator_spark.operators.bpe import (
        _bpe_train_local,
        base_char_vocab,
        bpe_encode_docs,
    )

    census: dict[str, int] = {}
    for t in texts.values():
        for w in t.split(" "):
            census[w] = census.get(w, 0) + 1
    merges = _bpe_train_local(list(census.items()), n_merges=10, min_count=2)
    df = spark.createDataFrame([Row(doc_id=d, text=t) for d, t in texts.items()])
    base = base_char_vocab(df)
    id2tok = {i: c for i, c in enumerate(base)}
    for rank, l, r, _ in sorted(merges):
        id2tok[len(base) + rank] = l + r
    for r in bpe_encode_docs(df, merges, base).collect():
        ids = list(r["token_ids"])
        assert all(t in id2tok for t in ids)
        assert "".join(id2tok[t] for t in ids) == texts[r["doc_id"]].replace(" ", "")
        assert r["n_tokens"] == len(ids)


def test_histogram_quantiles_matches_reference(spark):
    """Random values vs a direct reference: bin by exact cents, cumulative
    counts, lower-nearest-rank bin per percentile."""
    rng = random.Random(67)
    vals = [round(rng.uniform(0, 5000), 2) for _ in range(4000)]
    bin_cents = 12_800
    from cassandra_cql_streaming_db_migrator_spark.operators.sketches import (
        histogram_quantiles,
    )

    df = spark.createDataFrame([Row(v=float(x)) for x in vals])
    got = {
        r["pct"]: (r["bin_id"], r["bin_lo_cents"], r["bin_hi_cents"], r["cum_count"])
        for r in histogram_quantiles(df, "v").collect()
    }

    bins: dict[int, int] = {}
    for x in vals:
        b = int(math.floor(x * 100 + 0.5)) // bin_cents
        bins[b] = bins.get(b, 0) + 1
    n = len(vals)
    cum = {}
    acc = 0
    for b in sorted(bins):
        acc += bins[b]
        cum[b] = acc
    expected = {}
    for p in (50, 90, 99):
        target = (n * p + 99) // 100
        b = min(bb for bb in cum if cum[bb] >= target)
        expected[p] = (b, b * bin_cents, (b + 1) * bin_cents, cum[b])
    assert got == expected
    # every quantile bin must actually CONTAIN the exact order statistic
    svals = sorted(int(math.floor(x * 100 + 0.5)) for x in vals)
    for p, (b, lo, hi, _) in expected.items():
        exact = svals[(n * p + 99) // 100 - 1]
        assert lo <= exact < hi
