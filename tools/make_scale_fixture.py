"""Deterministic sf1 fixture: tile the driver's sf0.1 tables 10x with
key-space shifts — the scale-probe input for SCALE_NOTES.md (VERDICT r04
ask #7).

The driver's generator is not shipped, so sf1 is a SELF-SIMILAR upscale of
sf0.1 (seed-free, reproducible byte-for-byte):

  * every key column shifts by ``replica * (max_key + 1)`` — replicas are
    disjoint in id space, matching TPC-H's convention that parts,
    suppliers, customers, and orders ALL scale with SF (so the co-purchase
    graph grows in nodes at constant density — edges x10, not density
    x10);
  * ``documents.text`` is transformed per replica r > 0 by a LETTER
    ROTATION (Caesar shift of a-z/A-Z by r, round-6 fix): a
    deterministic character bijection preserves within-replica near-dup
    structure EXACTLY (every within-replica similarity, char- or
    word-level, is isomorphic to replica 0) while sharing no cross-
    replica character shingles or (letter-bearing) word n-grams — so
    duplicate-FAMILY sizes stay constant as the corpus grows, at EVERY
    granularity the dedup family measures.  The previous per-word ``~r``
    suffix failed this contract twice: cross-replica CHAR n-grams stayed
    ~90% shared (the suffix only broke word equality), and worse, the
    suffix itself MANUFACTURED within-replica similarity — every word in
    replica r ending ``~r`` floods unrelated docs' char-3-gram sets with
    shared boundary grams, pushing 21.5M doc pairs past an exact 0.7
    Jaccard verify (measured) where the base corpus has 261.  Rotation
    adds zero shared structure;
  * ``customer.c_name`` is left UNCHANGED across replicas: name diversity
    does not grow with population, so entity-resolution block occupancy
    genuinely grows 10x — the honest stress for FastSS blocking;
  * ``embeddings`` vectors are copied unchanged (id-shifted): the ANN
    corpus grows 10x with the same geometry.

Output: /tmp/spark_graft_sf1/*.parquet (outside the repo; regenerate on
demand — this script is the fixture's reproducibility contract).

Usage: python tools/make_scale_fixture.py [src_dir] [dst_dir] [replicas]
"""

from __future__ import annotations

import os
import sys

import duckdb

REPLICAS = 10
SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sf1"

# (table, [key columns to shift], extra per-replica SQL transform)
SHIFTS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# Key DOMAINS: every column referring to the same entity shifts by the SAME
# span, computed as max over ALL columns in the domain (ADVICE r05:
# per-table/per-column spans misalign foreign keys whenever the referencing
# table's max differs from the referenced table's — replica>0 cross-table
# joins silently lose matches).  The max-over-domain choice both aligns FKs
# and guarantees replica id-spaces stay disjoint even if a referencing
# column carried values above the referenced table's max.
DOMAINS: dict[str, str] = {
    "c_custkey": "custkey",
    "o_custkey": "custkey",
    "s_suppkey": "suppkey",
    "l_suppkey": "suppkey",
    "p_partkey": "partkey",
    "l_partkey": "partkey",
    "o_orderkey": "orderkey",
    "l_orderkey": "orderkey",
    "event_id": "event_id",
    "user_id": "user_id",
    "doc_id": "doc_id",
    "vec_id": "vec_id",
}


def domain_spans(con, src: str) -> dict[str, int]:
    spans: dict[str, int] = {}
    for table, keys in SHIFTS.items():
        path = f"{src}/{table}.parquet"
        if not os.path.exists(path):
            continue
        for k in keys:
            mx = con.execute(
                f"SELECT max({k}) + 1 FROM read_parquet('{path}')"
            ).fetchone()[0]
            d = DOMAINS[k]
            spans[d] = max(spans.get(d, 0), int(mx))
    return spans


def build(src: str = SRC, dst: str = DST, replicas: int = REPLICAS) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    by_domain = domain_spans(con, src)
    for table, keys in SHIFTS.items():
        path = f"{src}/{table}.parquet"
        if not os.path.exists(path):
            continue
        con.execute(
            f"CREATE OR REPLACE VIEW src AS SELECT * FROM read_parquet('{path}')"
        )
        if not keys:  # fixed dimensions: one copy
            con.execute(
                f"COPY (SELECT * FROM src) TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
            )
            continue
        spans = {k: by_domain[DOMAINS[k]] for k in keys}
        cols = [r[0] for r in con.execute("DESCRIBE src").fetchall()]
        selects = []
        for r in range(replicas):
            proj = []
            for c in cols:
                if c in spans:
                    proj.append(f"{c} + {r * spans[c]} AS {c}")
                elif table == "documents" and c == "text" and r > 0:
                    # per-replica letter rotation: a character bijection —
                    # within-replica similarity exactly preserved, zero
                    # cross-replica shingle/word sharing, zero added
                    # structure (see module docstring)
                    lower = "abcdefghijklmnopqrstuvwxyz"
                    upper = lower.upper()
                    k = r % 26
                    rot_l = lower[k:] + lower[:k]
                    rot_u = upper[k:] + upper[:k]
                    proj.append(
                        f"translate(text, '{lower}{upper}', "
                        f"'{rot_l}{rot_u}') AS text"
                    )
                else:
                    proj.append(c)
            selects.append("SELECT " + ", ".join(proj) + " FROM src")
        union = "\nUNION ALL\n".join(selects)
        con.execute(
            f"COPY ({union}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    build(
        sys.argv[1] if len(sys.argv) > 1 else SRC,
        sys.argv[2] if len(sys.argv) > 2 else DST,
        int(sys.argv[3]) if len(sys.argv) > 3 else REPLICAS,
    )
