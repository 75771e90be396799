#!/usr/bin/env python
"""Per-query time attribution (optimization guide §1: measure first).

Runs one or more registry queries to the noop sink with Spark event
logging enabled, then attributes wall-clock to:

  * per-job task time (executor compute) vs
  * driver gaps between jobs (planning, collects, py4j, AQE re-planning)

Usage: python tools/profile_query.py <query> [query ...]
       SPARK_GRAFT_SF_DIR picks the fixture (default sf0.1).

Prints per query: total wall, n_jobs, sum of job wall, driver-gap wall,
and the 5 longest jobs with their stage names.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_cql_streaming_db_migrator_spark.queries import all_queries
from cassandra_cql_streaming_db_migrator_spark.session import build_session


def parse_events(log_dir: str) -> list[dict]:
    evs = []
    paths = []
    for root, _dirs, files in os.walk(log_dir):
        for name in files:
            if "appstatus" in name:
                continue
            paths.append(os.path.join(root, name))
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    e = json.loads(line)
                except ValueError:
                    continue
                if e.get("Event") in (
                    "SparkListenerJobStart",
                    "SparkListenerJobEnd",
                ):
                    evs.append(e)
    return evs


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    ev_dir = tempfile.mkdtemp(prefix="spark_events_")
    spark = build_session(
        app_name="profile_query",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": ev_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    qs = all_queries()
    # warmup (JVM + python pool) so query 1 is not billed startup
    qs["scan_project"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    from cassandra_cql_streaming_db_migrator_spark.operators.dedup import (
        simhash_fingerprints,
    )
    from cassandra_cql_streaming_db_migrator_spark.sources.parquet import load_table

    simhash_fingerprints(
        load_table(spark, sf_dir, "documents")
        .limit(3200)
        .repartition(spark.sparkContext.defaultParallelism)
    ).write.format("noop").mode("overwrite").save()

    results = {}
    for name in names:
        spark.catalog.clearCache()
        marker = f"__profile_{name}__"
        spark.sparkContext.setJobDescription(marker)
        t0 = time.perf_counter()
        df = qs[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        results[name] = (marker, t0, wall)

    spark.stop()
    evs = parse_events(ev_dir)
    starts = {}
    jobs = []  # (job_id, desc, t_start, t_end)
    for e in evs:
        if e["Event"] == "SparkListenerJobStart":
            desc = e.get("Properties", {}).get("spark.job.description", "")
            starts[e["Job ID"]] = (desc, e["Submission Time"])
        else:
            d = starts.get(e["Job ID"])
            if d:
                jobs.append((e["Job ID"], d[0], d[1], e["Completion Time"]))

    for name, (marker, _t0, wall) in results.items():
        mine = sorted(
            [j for j in jobs if j[1] == marker], key=lambda j: j[2]
        )
        njobs = len(mine)
        job_wall = sum((j[3] - j[2]) / 1000.0 for j in mine)
        span = (
            (mine[-1][3] - mine[0][2]) / 1000.0 if mine else 0.0
        )
        gaps = span - job_wall  # driver time between jobs inside the span
        outside = wall - span  # plan build before job 1 + finish after last
        top = sorted(mine, key=lambda j: j[2] - j[3])[:5]
        print(
            f"\n=== {name}: wall {wall:.2f}s  jobs {njobs}  "
            f"job-wall {job_wall:.2f}s  inter-job gaps {gaps:.2f}s  "
            f"outside-jobs {outside:.2f}s"
        )
        for j in top:
            print(f"    job {j[0]}: {(j[3] - j[2]) / 1000.0:.2f}s")

    shutil.rmtree(ev_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
