"""BPE APPLY-path battery (VERDICT r05 ask #4): the distributed document
encoder pinned against an independent reference implementation, plus the
vocab/fingerprint contracts the pinned oracle freezes."""

from __future__ import annotations

import pytest

from cassandra_cql_streaming_db_migrator_spark.operators.bpe import (
    ENCODE_FP_MOD,
    _ENCODE_FP_BASE,
    base_char_vocab,
    bpe_encode_docs,
    bpe_train,
    word_census,
)


def _ref_encode_word(word, merges_by_rank):
    """Independent greedy encoder: repeatedly apply the LOWEST-rank merge
    present anywhere in the word (pair-priority formulation) — a different
    control flow from the operator's rank-ordered full passes, but the two
    are equivalent for BPE because applying merge k never creates a pair
    of rank < k (ranks are learned in order, each from the previous
    tokenization): by induction, when rank k is considered, no lower rank
    can reappear, so 'scan ranks in order' and 'always take the lowest
    present' produce identical tokenizations."""
    syms = list(word)
    while True:
        best_rank, best_pair = None, None
        for a, b in zip(syms, syms[1:]):
            rk = merges_by_rank.get((a, b))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank, best_pair = rk, (a, b)
        if best_pair is None:
            return syms
        l, r = best_pair
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out


@pytest.fixture(scope="module")
def trained(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = bpe_train(word_census(docs), n_merges=20)
    vocab = base_char_vocab(docs)
    return docs, merges, vocab


def test_encoder_matches_independent_reference(spark, trained):
    docs, merges, vocab = trained
    vmap = {c: i for i, c in enumerate(vocab)}
    n_base = len(vocab)
    for rank, l, r, _ in sorted(merges):
        vmap[l + r] = n_base + rank
    merges_by_rank = {(l, r): rank for rank, l, r, _ in merges}

    got = {
        r["doc_id"]: r
        for r in bpe_encode_docs(docs, merges, vocab).collect()
    }
    sample = docs.orderBy("doc_id").limit(60).collect()
    assert len(sample) == 60
    for row in sample:
        ids = []
        for w in row["text"].split(" "):
            if w:
                ids.extend(vmap[s] for s in _ref_encode_word(w, merges_by_rank))
        g = got[row["doc_id"]]
        assert list(g["token_ids"]) == ids, row["doc_id"]
        assert g["n_tokens"] == len(ids)
        assert g["n_words"] == sum(1 for w in row["text"].split(" ") if w)
        fp = 0
        for t in ids:
            fp = (fp * _ENCODE_FP_BASE + t + 1) % ENCODE_FP_MOD
        assert g["ids_fp"] == fp


def test_encoding_roundtrip_detokenizes(spark, trained):
    """Decoding = concatenating token strings per word: token ids map back
    to strings whose per-word concatenation is the original word (BPE
    merges never cross word boundaries)."""
    docs, merges, vocab = trained
    id2tok = {i: c for i, c in enumerate(vocab)}
    n_base = len(vocab)
    for rank, l, r, _ in sorted(merges):
        id2tok[n_base + rank] = l + r
    enc = {
        r["doc_id"]: list(r["token_ids"])
        for r in bpe_encode_docs(docs, merges, vocab).limit(40).collect()
    }
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.select("doc_id", "text").collect()
    }
    for doc_id, ids in enc.items():
        decoded = "".join(id2tok[t] for t in ids)
        assert decoded == texts[doc_id].replace(" ", "")


def test_vocab_is_deterministic_and_covers_merges(spark, trained):
    docs, merges, vocab = trained
    assert vocab == sorted(set(vocab))
    assert vocab == base_char_vocab(docs)  # stable across runs
    base = set(vocab)
    known = set(base)
    for rank, l, r, _ in sorted(merges):
        # every merge builds from already-known symbols (train invariant)
        assert l in known and r in known
        known.add(l + r)


def test_encode_handles_degenerate_texts(spark):
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="aa aa bb"),
            Row(doc_id=2, text=""),         # one empty word -> zero tokens
            Row(doc_id=3, text="a  a"),     # double space -> empty word skipped
            Row(doc_id=4, text=None),       # NULL text -> NULL row
        ]
    )
    merges = [(0, "a", "a", 2)]
    out = {
        r["doc_id"]: r
        for r in bpe_encode_docs(docs, merges, ["a", "b"]).collect()
    }
    assert list(out[1]["token_ids"]) == [2, 2, 1, 1]
    assert out[1]["n_words"] == 3 and out[1]["n_tokens"] == 4
    assert list(out[2]["token_ids"]) == [] and out[2]["n_words"] == 0
    assert out[2]["ids_fp"] == 0
    assert list(out[3]["token_ids"]) == [0, 0] and out[3]["n_words"] == 2
    assert out[4]["token_ids"] is None and out[4]["ids_fp"] is None


def _ref_train(census: dict[str, int], n_merges: int, min_count: int = 2):
    """Independent trainer (VERDICT r11 ask #6): the published BPE
    procedure implemented from scratch over a plain-Python word census —
    per round, count adjacent symbol pairs with word multiplicities
    (overlapping occurrences each count), take the max-count pair with
    (left, right) lexicographic tiebreak, merge it greedily
    leftmost-non-overlapping in every word, stop below ``min_count``.
    Shares no code with the engine's local or distributed trainer."""
    seqs: dict[tuple, int] = {}
    for w, n in census.items():
        if w:
            k = tuple(w)
            seqs[k] = seqs.get(k, 0) + n
    merges = []
    for rank in range(n_merges):
        counts: dict[tuple, int] = {}
        for syms, n in seqs.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        (l, r), cnt = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if cnt < min_count:
            break
        merges.append((rank, l, r, cnt))
        new: dict[tuple, int] = {}
        for syms, n in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new[k] = new.get(k, 0) + n
        seqs = new
    return merges


def test_full_fixture_engine_equals_reference_equals_pin(spark, sf_dir):
    """The r11 verdict's pinned-oracle epistemics closed (ask #6):
    engine == independent reference == pin, asserted on the FULL
    fixture for all three pinned reports — the merge table
    (bpe_merges), the length-bucket encode census (bpe_encode), and the
    per-language fertility census (tokenizer_fertility).  The pin in
    queries/llm.py remains the driver-visible DuckDB oracle; this test
    is the independent derivation that proves the pin is not
    self-certifying."""
    from collections import Counter

    from cassandra_cql_streaming_db_migrator_spark.operators.bpe import (
        ENCODE_FP_MOD,
        _ENCODE_FP_BASE,
    )
    from cassandra_cql_streaming_db_migrator_spark.queries.llm import (
        _BPE_ENCODE_PINNED,
        _BPE_PINNED,
        _TOKENIZER_FERTILITY_PINNED,
        bpe_encode,
        tokenizer_fertility,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "lang")
        .collect()
    )
    texts = {r["doc_id"]: r["text"] for r in rows if r["text"] is not None}
    langs = {r["doc_id"]: r["lang"] for r in rows if r["text"] is not None}
    sz = sum(len(t) for t in texts.values())

    # --- independent training from the raw text
    census = Counter(w for t in texts.values() for w in t.split(" ") if w)
    ref_merges = _ref_train(dict(census), 20)

    # engine == reference (trainer)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    eng_merges = bpe_train(word_census(docs), n_merges=20)
    assert eng_merges == ref_merges

    # reference == pin (merge table) — the driver fixtures are keyed by
    # corpus size; a non-driver fixture has no pin rows to compare
    pin_merges = [(rk, l, r, pc) for s, rk, l, r, pc in _BPE_PINNED if s == sz]
    assert pin_merges, f"no _BPE_PINNED rows for corpus size {sz}"
    assert ref_merges == pin_merges

    # --- independent encoding of EVERY document
    vocab = sorted({c for t in texts.values() for c in t})
    assert vocab == base_char_vocab(docs)
    vmap = {c: i for i, c in enumerate(vocab)}
    for rank, l, r, _ in ref_merges:
        vmap[l + r] = len(vocab) + rank
    by_rank = {(l, r): rank for rank, l, r, _ in ref_merges}

    buckets: dict[int, list[int]] = {}
    fert: dict[str, list[int]] = {}
    for doc_id, t in texts.items():
        words = [w for w in t.split(" ") if w]
        ids = []
        for w in words:
            ids.extend(vmap[s] for s in _ref_encode_word(w, by_rank))
        fp = 0
        for tok in ids:
            fp = (fp * _ENCODE_FP_BASE + tok + 1) % ENCODE_FP_MOD
        for acc, key in ((buckets, len(words) // 20), (fert, langs[doc_id])):
            st = acc.setdefault(key, [0, 0, 0, 0])
            st[0] += 1
            st[1] += len(words)
            st[2] += len(ids)
            st[3] = (st[3] + fp) % ENCODE_FP_MOD

    ref_census = sorted(
        (b, st[0], st[1], st[2], st[3]) for b, st in buckets.items()
    )
    eng_census = sorted(
        (r["len_bucket"], r["n_docs"], r["n_words"], r["n_tokens"], r["fp_sum"])
        for r in bpe_encode(spark, sf_dir).collect()
    )
    pin_census = sorted(
        (b, d, w, t, fp) for s, b, d, w, t, fp in _BPE_ENCODE_PINNED if s == sz
    )
    assert eng_census == ref_census
    assert pin_census == ref_census

    ref_fert = sorted(
        (lg, st[0], st[1], st[2], 1_000_000 * st[2] // st[1], st[3])
        for lg, st in fert.items()
    )
    eng_fert = sorted(
        (r["lang"], r["n_docs"], r["n_words"], r["n_tokens"],
         r["fertility_x1e6"], r["fp_sum"])
        for r in tokenizer_fertility(spark, sf_dir).collect()
    )
    pin_fert = sorted(
        (lg, d, w, t, fe, fp)
        for s, lg, d, w, t, fe, fp in _TOKENIZER_FERTILITY_PINNED
        if s == sz
    )
    assert eng_fert == ref_fert
    assert pin_fert == ref_fert
