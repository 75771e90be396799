#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every registry query on Spark and its oracle on DuckDB over the same
parquet fixtures, then compares row count, schema, and order-insensitive
values (columns sorted by name, rows sorted) — strictly: exact equality, so
anything passing here passes any reasonable hashing scheme.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

from cassandra_cql_streaming_db_migrator_spark.queries import all_queries
from cassandra_cql_streaming_db_migrator_spark.session import build_session
from cassandra_cql_streaming_db_migrator_spark.sources.parquet import TABLES


def canon(v):
    # STRICT on purpose: no Decimal.normalize() — the driver's hasher sees
    # raw representations, so trailing-zero/scale differences must FAIL here
    # too (round-1 lesson: normalize() masked 12 driver hash_match failures).
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (list, tuple)):
        return ("l", tuple(canon(x) for x in v))
    return (type(v).__name__, str(v))


def rowset(rows):
    return sorted(tuple(canon(v) for v in row) for row in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = build_session(app_name="check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, q in all_queries().items():
        if only and name not in only:
            continue
        try:
            sdf = q.fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = [[row[c] for c in scols] for row in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if q.oracle is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows, no oracle)")
            continue
        try:
            cur = con.execute(q.oracle)
            ocols_raw = [d[0] for d in cur.description]
            orows_raw = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
        ocols = [ocols_raw[i] for i in order]
        orows = [[r[i] for i in order] for r in orows_raw]

        if scols != ocols:
            failures.append(name)
            print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}")
            continue
        if len(srows) != len(orows):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            continue
        s, o = rowset(srows), rowset(orows)
        if s != o:
            failures.append(name)
            bad = next(i for i in range(len(s)) if s[i] != o[i])
            print(f"FAIL {name}: values differ; first diff at sorted row {bad}:")
            print(f"  spark : {s[bad]}")
            print(f"  oracle: {o[bad]}")
            continue
        print(f"PASS {name} ({len(srows)} rows)")

    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall queries pass")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
