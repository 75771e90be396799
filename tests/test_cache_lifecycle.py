"""Cache-lifecycle gate (VERDICT r05 weak #1): no data-scale cached copy
may outlive its query.

Package code never calls ``persist()``/``cache()`` (a CacheManager entry
has no release path from a lazy operator library); multi-consumer frames
go through ``operators.caching.materialized`` — localCheckpoint-backed
blocks the ContextCleaner frees once the query result is unreachable.
These tests pin both halves: the CacheManager stays empty after the
heaviest multi-materialization queries run end-to-end, and checkpoint
blocks actually drain once references drop.
"""

from __future__ import annotations

import gc
import os
import re
import time

from cassandra_cql_streaming_db_migrator_spark.queries import all_queries

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "cassandra_cql_streaming_db_migrator_spark",
)


def test_no_persist_in_package_source():
    """The source-level ban plan_audit also enforces: zero .persist()/
    .cache() call sites in package code (comments don't count)."""
    pat = re.compile(r"\.(persist|cache)\(")
    hits = []
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if fn.endswith(".py"):
                path = os.path.join(root, fn)
                for lineno, line in enumerate(open(path), 1):
                    if pat.search(line.split("#", 1)[0]):
                        hits.append(f"{path}:{lineno}")
    assert hits == []


def test_collect_discipline_audit_green():
    """VERDICT r11 ask #7: every .collect() site in package code is (a)
    the bounded primitive itself, (b) structurally .limit()-bounded in
    its own chain, or (c) carries a metadata-scale accounting comment —
    enforced by plan_audit, asserted green here."""
    import sys

    sys.path.insert(0, os.path.dirname(PKG))
    from tools.plan_audit import collect_discipline_audit

    assert collect_discipline_audit() == 0


def test_collect_discipline_audit_is_a_real_tripwire(tmp_path):
    """The audit must actually FLAG an unaccounted collect — run it over
    a scratch package tree containing one naked .collect() and assert
    only it is caught (the negative control that keeps the gate
    honest)."""
    import sys

    sys.path.insert(0, os.path.dirname(PKG))
    from tools.plan_audit import collect_discipline_audit

    fake_pkg = tmp_path / "cassandra_cql_streaming_db_migrator_spark"
    (fake_pkg / "operators").mkdir(parents=True)
    (fake_pkg / "bad.py").write_text("rows = df.select('x').collect()\n")
    (fake_pkg / "ok_limit.py").write_text(
        "rows = df.limit(5).collect()\n"
    )
    (fake_pkg / "ok_marked.py").write_text(
        "# metadata-scale: n_cells rows\nrows = census.collect()\n"
    )
    (fake_pkg / "operators" / "driverside.py").write_text(
        "rows = df.collect()\n"  # the primitive itself is exempt
    )
    assert collect_discipline_audit(str(fake_pkg)) == 1


def _resident_rdd_blocks(spark):
    """RDDs currently holding storage blocks (cached or checkpointed)."""
    return list(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def _drain(spark, timeout_s: float = 15.0) -> int:
    """GC both sides and wait for the ContextCleaner to release blocks."""
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        infos = _resident_rdd_blocks(spark)
        if not infos:
            return 0
        time.sleep(0.3)
    return len(_resident_rdd_blocks(spark))


def test_rfm_segments_leaves_no_resident_cache(spark, sf_dir):
    """rfm_segments chains THREE distributed_ntile passes — the round-5
    weak held three full cached copies of the customer frame resident
    forever.  Now: CacheManager empty during and after the run, and every
    checkpoint block drained once the result is unreachable."""
    # start clean: earlier session-scoped tests may have left blocks
    spark.catalog.clearCache()
    assert _drain(spark) == 0
    df = all_queries()["rfm_segments"].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    # no CacheManager entries anywhere in the plan (persist ban, runtime half)
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
    del df
    assert _drain(spark) == 0, "checkpoint blocks outlived the query"


def test_chained_selection_queries_drain(spark, sf_dir):
    """A session running several distributed-selection queries back to
    back — the VERDICT r05 scenario — accumulates nothing: after each
    query's result is dropped, storage drains to zero."""
    spark.catalog.clearCache()
    assert _drain(spark) == 0
    for name in ("exact_median", "revenue_deciles", "exact_quantiles"):
        df = all_queries()[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        del df
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
    assert _drain(spark) == 0
