#!/usr/bin/env python
"""Capture ``explain("formatted")`` text for registry queries.

Usage: python tools/capture_plans.py <out_dir> <suffix> <query> [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` for each query — the judge-facing
before/after plan evidence for the optimization rounds (guide §7.2).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_cql_streaming_db_migrator_spark.queries import all_queries
from cassandra_cql_streaming_db_migrator_spark.session import build_session


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="capture_plans")
    qs = all_queries()
    jvm = spark.sparkContext._jvm
    for name in names:
        df = qs[name].fn(spark, sf_dir)
        txt = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {name}_{suffix}.txt ({len(txt)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
