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
