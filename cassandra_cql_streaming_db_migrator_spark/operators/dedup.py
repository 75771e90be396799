"""Deduplication operators — exact, MinHash+LSH, SimHash (SURVEY §7.2.6).

Beyond the reference's surface: the north-star LLM-data-pipeline ops
(BASELINE.json:6).  All three run entirely in Catalyst higher-order
functions (no Python in the hot path) using the cross-engine hash
primitives from functions.hashing.

Scale design (100 TB of documents):
  * exact dedup — hash-groupBy on the content: one shuffle keyed by text;
    at scale, group by a 256-bit digest instead of the raw text so the
    shuffle carries 32 bytes/row, not the document.
  * MinHash LSH — per-row signature (narrow, codegen'd), explode to
    (band, band_signature) buckets, self-join within buckets.  Candidate
    generation cost is O(sum of bucket^2) not O(n^2); a pathological bucket
    (thousands of identical docs) is a skew key — AQE skew-join handles
    moderate cases, and the band signature includes the band index so
    buckets from different bands never merge.
  * SimHash — one 53-bit fingerprint per doc; near-dup candidates share
    fingerprint prefixes (block on a prefix, compare hamming distance
    within block).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import MINHASH_P, MINHASH_PERMS, SIMHASH_MOD, poly_hash


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep the smallest id per distinct content value; report group size.
    Deterministic winner (min id), unlike dropDuplicates (first-seen)."""
    return df.groupBy(content_col).agg(
        F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dups")
    )


def shingle_hashes(text: Column, shingle_len: int = 5) -> Column:
    """Distinct character-shingle hash set as array<long>."""
    n = F.greatest(F.length(text) - F.lit(shingle_len - 1), F.lit(1))
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.substring(text, i, shingle_len),
        )
    )
    return F.transform(shingles, lambda s: poly_hash(s))


def minhash_signature(hashes: Column) -> list[Column]:
    """16 minhash values: min over the shingle-hash set of (a*h+b) mod p,
    one frozen (a,b) per signature slot."""
    def perm_min(a: int, b: int):
        return lambda acc, h: F.least(acc, (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P))

    return [
        F.aggregate(hashes, F.lit(MINHASH_P).cast("long"), perm_min(a, b))
        for a, b in MINHASH_PERMS
    ]


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_len: int = 5,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    Output: (id_1, id_2, est_jaccard) where the pair shared >= 1 LSH band
    and est_jaccard = fraction of equal signature slots.  id_1 < id_2.
    """
    n_perms = len(MINHASH_PERMS)
    rows_per_band = n_perms // bands
    sigs = minhash_signature(shingle_hashes(F.col(text_col), shingle_len))
    signed = df.select(F.col(id_col), F.array(*sigs).alias("sig"))

    band_sigs = [
        F.concat_ws(
            "-", *[F.col("sig")[j].cast("string") for j in range(b * rows_per_band, (b + 1) * rows_per_band)]
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    exploded = (
        signed.select(id_col, "sig", F.posexplode(F.array(*band_sigs)).alias("band_idx", "band_sig"))
    )
    left = exploded.select(
        F.col(id_col).alias("id_1"), F.col("sig").alias("sig_1"), "band_idx", "band_sig"
    )
    right = exploded.select(
        F.col(id_col).alias("id_2"), F.col("sig").alias("sig_2"), "band_idx", "band_sig"
    )
    pairs = (
        left.join(right, on=["band_idx", "band_sig"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2", "sig_1", "sig_2")
        .dropDuplicates(["id_1", "id_2"])
    )
    matches = F.size(F.filter(F.zip_with("sig_1", "sig_2", lambda x, y: x == y), lambda v: v))
    return pairs.select(
        F.col("id_1").alias(f"{id_col}_1"),
        F.col("id_2").alias(f"{id_col}_2"),
        (matches / F.lit(float(n_perms))).alias("est_jaccard"),
    )


def simhash_column(text: Column, token_sep: str = " ") -> Column:
    """53-bit SimHash over whitespace tokens: bit k is set iff the sum of
    +-1 votes from token-hash bit k is positive.  Pure integer arithmetic
    (div/mod instead of shifts — Spark's shift functions take only literal
    shift amounts, and div-by-power-of-two is engine-portable)."""
    token_hash = poly_hash  # fold mod SIMHASH_MOD below

    tokens = F.split(text, token_sep)
    hashes = F.transform(
        tokens,
        lambda t: F.aggregate(
            F.filter(F.split(t, ""), lambda x: x != F.lit("")),
            F.lit(0).cast("long"),
            lambda acc, ch: (acc * F.lit(31) + F.ascii(ch)) % F.lit(SIMHASH_MOD),
        ),
    )
    hh = hashes

    def bit_vote(k: Column) -> Column:
        pow2k = F.pow(F.lit(2.0), k.cast("double")).cast("long")
        return F.aggregate(
            hh,
            F.lit(0).cast("long"),
            lambda a, h: a
            + F.when(((h.cast("long") / pow2k).cast("long")) % 2 == 1, F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(52)),
        F.lit(0).cast("long"),
        lambda acc, k: acc
        + F.when(bit_vote(k) > 0, F.pow(F.lit(2.0), k.cast("double")).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )
