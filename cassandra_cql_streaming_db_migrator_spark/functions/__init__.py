from .hashing import (
    MINHASH_PERMS,
    POLY_MOD,
    SIMHASH_BITS,
    SIMHASH_MOD,
    poly_hash,
    poly_hash_sql,
)

__all__ = [
    "MINHASH_PERMS",
    "POLY_MOD",
    "SIMHASH_BITS",
    "SIMHASH_MOD",
    "poly_hash",
    "poly_hash_sql",
]
