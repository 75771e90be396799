#!/usr/bin/env python
"""Benchmark runner (driver contract).

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE SHORT
JSON line: {"metric": ..., "value": total_sec, "unit": "sec", "sf": ...,
"n_queries": N, "queries": {worst-5 name: sec}, "migrate_rows_per_sec": R,
...}.  The full per-query map (min over reps + spread across reps) is
written to ``bench_detail.json`` next to this file — the round driver
captures only a ~2 KB stdout tail, so the printed line must stay small.

Each query is forced end-to-end with a noop-format write (full plan
execution, no collect-to-driver), timed wall-clock.  A warmup query runs
first so JVM/codegen startup is not billed to the first entry, and each
query is timed over ``$SPARK_GRAFT_BENCH_REPS`` (default 2) runs taking
the minimum — first executions pay one-time JIT/codegen compilation that
is process state, not query cost (standard steady-state methodology).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cassandra_cql_streaming_db_migrator_spark.queries import all_queries
from cassandra_cql_streaming_db_migrator_spark.session import build_session


def run_query_to_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = build_session(app_name="bench")

    queries = {n: q for n, q in all_queries().items() if q.bench}
    # Focused runs (TPC-H spread measurement, per-family tuning):
    # SPARK_GRAFT_BENCH_FILTER is an re.search pattern over query names.
    flt = os.environ.get("SPARK_GRAFT_BENCH_FILTER")
    if flt:
        queries = {n: q for n, q in queries.items() if re.search(flt, n)}

    # warmup: JVM, codegen, parquet footer caches — and the Python worker
    # pool (Arrow-kernel queries pay a one-time per-executor interpreter +
    # numpy import cost that is process startup, not query work)
    run_query_to_noop(all_queries()["scan_project"].fn(spark, sf_dir))
    from cassandra_cql_streaming_db_migrator_spark.operators.dedup import (
        simhash_fingerprints,
    )
    from cassandra_cql_streaming_db_migrator_spark.sources.parquet import load_table

    # repartition to the full task parallelism so EVERY python worker
    # spawns and imports numpy during warmup — a limit() collapses to one
    # partition and warms ONE of 32 workers, leaving the first timed
    # Arrow-kernel query to pay 31 worker spawns; under host scheduling
    # jitter that cold-pool cost measured 4-25 s of pure noise on the
    # minhash family (round-11 adjudication of the r10 bench regression)
    run_query_to_noop(
        simhash_fingerprints(
            load_table(spark, sf_dir, "documents")
            .limit(3200)
            .repartition(spark.sparkContext.defaultParallelism)
        )
    )

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name, q in queries.items():
        rep_times: list[float] = []
        for _ in range(reps):
            # queries that persist() shared intermediates would otherwise
            # hand rep 2 a warm CacheManager hit (and leak entries across
            # the run) — every rep measures a cold plan
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            run_query_to_noop(df)
            rep_times.append(time.perf_counter() - t0)
        timings[name] = round(min(rep_times), 3)
        spreads[name] = round(max(rep_times) - min(rep_times), 3)

    # Migrate-throughput gate (BASELINE.md: sustained migration throughput
    # must exceed 1e5 rows/s): a REAL scan -> filter chain -> computed
    # column -> upsert-to-parquet migration of lineitem, timed end to end
    # including the sink write, reported as rows/s so the >= 1e5 bar is
    # machine-checked from BENCH_r{N} every round.
    import shutil
    import tempfile

    from cassandra_cql_streaming_db_migrator_spark.queries.reference import (
        migrate_pipeline,
    )
    from cassandra_cql_streaming_db_migrator_spark.sinks.sinks import upsert_parquet

    migrate_dir = tempfile.mkdtemp(prefix="bench_migrate_")
    try:
        best_rate = 0.0
        rows = None
        for _ in range(reps):
            target = os.path.join(migrate_dir, "lineitem_v2.parquet")
            shutil.rmtree(target, ignore_errors=True)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            plan = migrate_pipeline(spark, sf_dir)
            upsert_parquet(plan, target, ["l_orderkey", "l_linenumber"])
            elapsed = time.perf_counter() - t0
            if rows is None:
                rows = spark.read.parquet(target).count()
            best_rate = max(best_rate, rows / elapsed)
    finally:
        shutil.rmtree(migrate_dir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    worst = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])

    # Full per-query data goes to a sidecar file: the round driver captures
    # only a ~2 KB stdout tail, and round 2's single ever-growing JSON line
    # outgrew it (BENCH_r02.json "parsed": null).  The printed line stays
    # short and stable-size; bench_detail.json carries the whole map.
    detail = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "reps": reps,
        "queries": timings,
        "spread": spreads,
        "migrate_rows_per_sec": round(best_rate),
        "migrate_rows": rows,
    }
    # focused runs must not clobber the round artifact
    detail_name = "bench_detail_focused.json" if flt else "bench_detail.json"
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), detail_name
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "queries": worst,  # worst 5 only; full map in bench_detail.json
                "max_spread_sec": max(spreads.values()) if spreads else 0.0,
                "migrate_rows_per_sec": round(best_rate),
                "migrate_gate_1e5_rows_per_sec": best_rate >= 1e5,
                "detail": detail_name,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
