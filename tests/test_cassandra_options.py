"""Connector option wiring (sources.cassandra) — the recorded option
matrix for both read and write paths (VERDICT r03 ask #9): every
DBDefinition / CassandraConnectionAdapter field the reference honors
(DBDefinition.java:10-15, CassandraConnectionAdapter.java:43-63,184-234)
maps to a connector option or is an explicit, documented no-op.  Unit-
testable without a cluster; the load/save paths need the connector JAR
and raise ConnectorUnavailable in this image."""

from __future__ import annotations

import pytest

from cassandra_cql_streaming_db_migrator_spark.sources.cassandra import (
    ConnectorUnavailable,
    connection_options,
    load_cql_table,
    read_options,
    write_options,
)

# A DBDefinition exercising EVERY field the reference adapter honors —
# reference spellings (contactNodes as the comma-separated host:port
# string of migration-config.example.yaml:12).
FULL_DB = {
    "contactNodes": "c1.example:9042, c2.example:9042",
    "contactNodesDatacenterName": "dc1",
    "keyspaceName": "ks",
    "username": "u",
    "password": "p",
    "throughputMBPerSec": 10,
    "defaultPageSize": 3000,          # CCA:52 -> CONTINUOUS_PAGING_PAGE_SIZE
    "requestTimeout": 10000,          # CCA:55 -> REQUEST_TIMEOUT
    "reconnectionDelays": 500,        # CCA:49 -> RECONNECTION_BASE_DELAY
    # fields the reference honors with NO connector analog (documented
    # no-ops, must never leak into the option map):
    "continousPagingTimeoutFirstPage": 20000,   # CCA:57,:196-197
    "continousPagingTimeoutOtherPages": 5000,   # CCA:59,:198-199
    "applicationName": "migrator",              # CCA:238-240
    "name": "source-session",                   # CCA:231 SESSION_NAME
}

EXPECTED_CONNECTION = {
    "spark.cassandra.connection.host": "c1.example,c2.example",
    "spark.cassandra.connection.port": "9042",
    "spark.cassandra.connection.localDC": "dc1",
    "spark.cassandra.auth.username": "u",
    "spark.cassandra.auth.password": "p",
    "spark.cassandra.output.throughputMBPerSec": "10",
    "spark.cassandra.input.fetch.sizeInRows": "3000",
    "spark.cassandra.read.timeoutMS": "10000",
    "spark.cassandra.connection.reconnectionDelayMS.min": "500",
    # session-level LOCAL_ONE on both request paths (CCA:222-223); the
    # reference's per-statement CL ONE override (DMP:397) is a catalogued
    # bug we do not replicate (SURVEY §7.4)
    "spark.cassandra.input.consistency.level": "LOCAL_ONE",
    "spark.cassandra.output.consistency.level": "LOCAL_ONE",
}


def test_full_dbdefinition_matrix():
    """EXACT equality: every honored field lands on its recorded option,
    and the no-op fields (continuous-paging timeouts, session/application
    name) produce nothing — any new key appearing here must be added to
    the recorded matrix deliberately."""
    assert connection_options(FULL_DB) == EXPECTED_CONNECTION


def test_read_path_matrix():
    opts = read_options(FULL_DB, "events", ttl_probe_column="payload")
    assert opts == {
        "keyspace": "ks",
        "table": "events",
        "ttl.payload": "row_ttl_value",  # S3 TTL probe projection
        **EXPECTED_CONNECTION,
    }


def test_write_path_matrix():
    opts = write_options(
        FULL_DB, "events_v2", if_not_exists=True, ttl_column="ttl_s"
    )
    assert opts == {
        "keyspace": "ks",
        "table": "events_v2",
        "ifNotExists": "true",  # K2 LWT insert
        "ttl": "ttl_s",         # K4 per-write TTL
        **EXPECTED_CONNECTION,
    }


def test_contact_nodes_variants():
    # list form + explicit port override
    opts = connection_options(
        {"contactPoints": ["h1", "h2"], "port": 9043, "localDatacenter": "dcX"}
    )
    assert opts["spark.cassandra.connection.host"] == "h1,h2"
    assert opts["spark.cassandra.connection.port"] == "9043"
    assert opts["spark.cassandra.connection.localDC"] == "dcX"
    # mixed per-node ports stay embedded (connector >= 3.0 accepts them)
    opts = connection_options({"contactNodes": "h1:9042,h2:9142"})
    assert opts["spark.cassandra.connection.host"] == "h1:9042,h2:9142"
    assert "spark.cassandra.connection.port" not in opts
    # portless string form
    opts = connection_options({"contactNodes": "h1, h2"})
    assert opts["spark.cassandra.connection.host"] == "h1,h2"
    assert "spark.cassandra.connection.port" not in opts


def test_consistency_override():
    opts = connection_options({"consistencyLevel": "LOCAL_QUORUM"})
    assert opts["spark.cassandra.input.consistency.level"] == "LOCAL_QUORUM"
    assert opts["spark.cassandra.output.consistency.level"] == "LOCAL_QUORUM"


def test_missing_connector_raises_clear_error(spark):
    with pytest.raises(ConnectorUnavailable, match="spark-cassandra-connector"):
        load_cql_table(spark, {"keyspaceName": "ks"}, "t")
