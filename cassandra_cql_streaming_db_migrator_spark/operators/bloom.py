"""Bloom-filter semi-join: the runtime-filter pattern, as an explicit
operator.

At 100 TB the expensive part of ``fact SEMI JOIN dim`` is shuffling the
fact side.  When dim's keys fit a bloom filter (16 KB covers ~10^4 keys at
~1% FP; size scales linearly), the filter broadcasts to every fact task
and prunes non-matching rows BEFORE the shuffle — the same idea as Spark's
AQE runtime bloom filters, but explicit, deterministic, and applicable
when the planner would not inject one (e.g. the dim side is a computed
subset).  False positives pass the bloom but are removed by the exact
semi-join that follows, so the RESULT is exactly the semi-join — the bloom
only changes how many rows reach the shuffle.  Catalyst keeps the bloom
test + filter inside whole-stage codegen (array literal + bit arithmetic,
no UDF).

The bitmap is BUILT executor-side: each dim key expands to its n_hashes
(word_idx, bit) positions as Catalyst columns, a ``groupBy(word_idx).
agg(bit_or(bit))`` folds them into at most m_bits/64 int64 words with
map-side partial aggregation, and the driver collects only that fixed-size
word array — never the keys.  A 10^8-key dim side therefore costs one
small shuffle of pre-aggregated words, not a driver serialization.  The
hash family (MINHASH_PERMS, int64-wrap, double pmod) is identical to the
probe expression, so the bitmap is bit-equal to the driver-side reference
builder (``build_bloom``, kept for tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import MINHASH_P, MINHASH_PERMS


def _wrap64(x: int) -> int:
    """Python's arbitrary-precision product wrapped to signed int64 — the
    value Spark's non-ANSI long arithmetic produces."""
    return ((x + (1 << 63)) % (1 << 64)) - (1 << 63)


def _positions(key: int, m_bits: int, n_hashes: int) -> list[int]:
    # mirror the Column expression exactly: int64-wrapped product, then
    # POSITIVE modulo twice (Python % with a positive modulus is already
    # pmod) — sign- and wrap-consistent for EVERY int64 key, not just the
    # small non-negative ones
    return [
        (_wrap64(a * key + b) % MINHASH_P) % m_bits
        for a, b in MINHASH_PERMS[:n_hashes]
    ]


def build_bloom(
    keys: list[int], m_bits: int = 65_536, n_hashes: int = 3
) -> list[int]:
    """Reference bitmap builder (driver-side, for tests and tiny key lists):
    int64 words, m_bits/64 of them.  Production path is
    :func:`build_bloom_distributed`."""
    words = [0] * (m_bits // 64)
    for k in keys:
        for p in _positions(int(k), m_bits, n_hashes):
            words[p // 64] |= 1 << (p % 64)
    # int64 literals are signed: wrap bit-63 words to two's complement
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def build_bloom_distributed(
    dim: DataFrame, dim_key: str, m_bits: int = 65_536, n_hashes: int = 3
) -> list[int]:
    """Executor-side bitmap build: bit positions as columns, OR-folded by
    ``groupBy(word_idx).agg(bit_or)``.  The driver receives at most
    m_bits/64 (word_idx, word) rows — fixed size, independent of |dim|.

    No ``distinct()`` on the keys first: bit_or is idempotent, so duplicate
    keys cost only map-side partial-agg work, and skipping the dedup saves
    a full shuffle of the key set.  Bit 63 wraps to a negative int64 via
    shiftleft's two's-complement, matching ``build_bloom``'s manual wrap.
    """
    key = F.col(dim_key).cast("long")
    probes = []
    for a, b in MINHASH_PERMS[:n_hashes]:
        # same expression as the bloom_test probe: int64-wrapped product
        # (non-ANSI long arithmetic), then pmod twice
        p = F.pmod(
            F.pmod(F.lit(a) * key + F.lit(b), F.lit(MINHASH_P)), F.lit(m_bits)
        )
        probes.append(
            F.struct(
                (p / 64).cast("int").alias("w"), (p % 64).cast("int").alias("b")
            )
        )
    # metadata-scale: distinct (word, bit) probe rows of the dim side
    rows = (
        dim.where(F.col(dim_key).isNotNull())
        .select(F.explode(F.array(*probes)).alias("pb"))
        .select(
            F.col("pb.w").alias("w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.col("pb.b")
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["w"]] = r["word"]
    return words


def bloom_test(col: Column, words: list[int], m_bits: int, n_hashes: int) -> Column:
    """Membership test as a pure Catalyst expression over the broadcast
    bitmap literal: AND over n_hashes bit probes."""
    # ONE array literal (constant-folded), NOT F.array(*lits): CreateArray
    # re-materializes the 1024-element array per probe per row — measured
    # 4.3s -> 1.8s on the sf0.1 bloom_join.  The cast forces LONG elements:
    # small Python ints would infer IntegerType, and getbit on INT words
    # rejects positions >= 32
    arr = F.lit(words).cast("array<long>")
    test = F.lit(True)
    for a, b in MINHASH_PERMS[:n_hashes]:
        # pmod, not %: Spark's % keeps the dividend's sign, so a negative
        # key (or an int64-wrapped product) would probe a negative index
        p = F.pmod(
            F.pmod(F.lit(a) * col.cast("long") + F.lit(b), F.lit(MINHASH_P)),
            F.lit(m_bits),
        )
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        # getbit reads two's-complement bit positions, so bit 63 of a
        # negative word tests correctly; it also takes a COLUMN position
        # (shiftright's numBits must be a Python literal)
        test = test & (F.call_function("getbit", word, (p % 64).cast("int")) == 1)
    return test


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 65_536,
    n_hashes: int = 3,
) -> DataFrame:
    """``fact SEMI JOIN dim`` with a bloom pre-filter on the fact side.
    Result rows are exactly the semi-join's; the bloom prunes fact rows
    before any shuffle/broadcast machinery sees them.  NULL dim keys never
    join (SQL equality), so the build drops them."""
    words = build_bloom_distributed(dim, dim_key, m_bits, n_hashes)
    pruned = fact.where(bloom_test(F.col(fact_key), words, m_bits, n_hashes))
    return pruned.join(
        dim.select(F.col(dim_key).alias("__bk")).distinct(),
        pruned[fact_key] == F.col("__bk"),
        "left_semi",
    )
