"""Deterministic, cross-engine hash primitives.

Dedup/similarity operators need hashes that are (a) computable inside
Catalyst higher-order functions — JVM-side, codegen'd, no Python in the hot
path — and (b) reproducible bit-for-bit by the ANSI-SQL oracle.  Engine
built-ins (Spark ``hash``/``xxhash64``, DuckDB ``hash``) disagree across
engines, so we use explicit polynomial folds in 64-bit integer arithmetic,
with moduli chosen so every intermediate product fits in int64:

  * poly string hash: h = (31*h + codepoint) mod 1e9+7      (h < 2^30,
    31*h + c < 2^35 — safe)
  * minhash permutations: (a*h + b) mod (2^31-1)            (a,b < 2^31,
    a*h < 2^62 — safe)
  * simhash token hash: fold mod 2^53-111 (prime < 2^53;
    31*h < 2^58 — safe), giving SIMHASH_BITS=53 usable sign bits.

The same constants feed the Spark column builders here and the generated
oracle SQL in queries/llm.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

POLY_MOD = 1_000_000_007
MINHASH_P = 2_147_483_647  # 2^31 - 1 (prime)
SIMHASH_MOD = 9_007_199_254_740_881  # prime < 2^53
SIMHASH_BITS = 53

# 16 fixed (a, b) permutation parameters for minhash, below 2^31.
# Arbitrary but frozen: changing them changes every signature.
MINHASH_PERMS: list[tuple[int, int]] = [
    (1103515245, 12345),
    (1229782938, 2749),
    (1588635695, 98765),
    (784588716, 1013904223),
    (1474702475, 57),
    (654188429, 8191),
    (190851285, 131071),
    (1864557167, 524287),
    (997595211, 6700417),
    (1747396915, 65537),
    (1249508407, 4097),
    (1868519101, 257),
    (361962549, 16769023),
    (2027382137, 33550336),
    (847288503, 2147483629),
    (1565789251, 7919),
]


def poly_hash(col: Column, mod: int = POLY_MOD) -> Column:
    """Polynomial string hash h = fold(31*h + codepoint) mod ``mod`` as a
    Catalyst expression (aggregate over the char array — codegen'd)."""
    chars = F.filter(F.split(col, ""), lambda x: x != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(31) + F.ascii(ch)) % F.lit(mod),
    )


def poly_hash_sql(expr: str, mod: int = POLY_MOD) -> str:
    """The identical fold as DuckDB SQL (list_reduce has no init parameter in
    DuckDB 1.0 -> prepend the zero seed)."""
    return (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(a, b) -> (a * 31 + b) % {mod})"
    )
