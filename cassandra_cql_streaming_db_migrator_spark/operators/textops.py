"""Text analysis operators (SURVEY §7.2.6): token counting, quality
scoring, language-ID heuristics, n-gram Jaccard, document fingerprints.

All built-in-function compositions (split/regexp/HOFs) — JVM-side,
codegen'd, scale-free per row.  Jaccard pair generation uses explicit
blocking so pair counts stay bounded; the unblocked variant does not exist
on purpose (O(n^2) at 100 TB is not an operator, it is an outage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import poly_hash

# BPE-ish pre-tokenizer: letter runs, digit runs, single non-space symbols.
BPE_TOKEN_PATTERN = "[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\\s]"


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality/stat features (whitespace tokens)."""
    tokens = F.split(F.col(text_col), " ")
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars_measured"),
        F.size(tokens).alias("n_tokens"),
        F.size(F.array_distinct(tokens)).alias("n_unique_tokens"),
        F.round(
            F.size(F.array_distinct(tokens)).cast("double") / F.size(tokens), 6
        ).alias("unique_ratio"),
    )


def bpe_token_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN))


def stopword_ratio(text_col: Column, stopwords: list[str]) -> Column:
    """Fraction of whitespace tokens that are stopwords — the language-ID /
    quality heuristic primitive."""
    tokens = F.split(text_col, " ")
    hits = F.size(F.filter(tokens, lambda t: t.isin(*stopwords)))
    return F.round(hits.cast("double") / F.size(tokens), 6)


EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]


def lang_id_heuristic(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-density language guess (n-gram-free variant suited to the
    whitespace-tokenized fixtures; real corpora would add char n-gram
    profiles per language)."""
    ratio = stopword_ratio(F.col(text_col), EN_STOPWORDS)
    return df.select(
        F.col(id_col),
        ratio.alias("en_stop_ratio"),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("other")).alias("lang_guess"),
    )


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct character n-gram set."""
    cnt = F.greatest(F.length(text) - F.lit(n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), cnt), lambda i: F.substring(text, i, n))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    block_cols: list[str],
    threshold: float,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs within the same block.
    jaccard = |A ∩ B| / |A ∪ B| over distinct *hashed* n-gram sets.

    Engineering for the pair explosion (the expensive part):
      * grams are hashed to int64 before the join — array_intersect over
        longs is several times cheaper than over strings, and the oracle
        applies the same hash so semantics stay exactly comparable;
      * the gram arrays are materialized through the block-join shuffle
        (computed once per doc, not once per pair);
      * size prefilter: jaccard <= min(|A|,|B|)/max(|A|,|B|), so pairs
        whose size ratio is below the threshold skip the intersect
        entirely — an implication of the threshold, not a semantic change.
    """
    grams = F.array_distinct(
        F.transform(char_ngrams(F.col(text_col), n), lambda g: poly_hash(g))
    )
    base = df.select(*block_cols, F.col(id_col), grams.alias("__grams"))
    a = base.select(
        *block_cols,
        F.col(id_col).alias("id_1"),
        F.col("__grams").alias("g1"),
        F.size("__grams").alias("s1"),
    )
    b = base.select(
        *block_cols,
        F.col(id_col).alias("id_2"),
        F.col("__grams").alias("g2"),
        F.size("__grams").alias("s2"),
    )
    joined = (
        a.join(b, on=block_cols)
        .filter(F.col("id_1") < F.col("id_2"))
        .filter(
            F.least("s1", "s2").cast("double") / F.greatest("s1", "s2") >= F.lit(threshold)
        )
    )
    inter = F.size(F.array_intersect("g1", "g2"))
    union = F.col("s1") + F.col("s2") - inter
    scored = joined.select(
        F.col("id_1").alias(f"{id_col}_1"),
        F.col("id_2").alias(f"{id_col}_2"),
        (inter.cast("double") / union).alias("jaccard"),
    )
    return scored.filter(F.col("jaccard") >= F.lit(threshold))


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic whole-document polynomial fingerprint (mod 1e9+7)."""
    return df.select(F.col(id_col), poly_hash(F.col(text_col)).alias("fingerprint"))
