"""Connector option wiring (sources.cassandra) — unit-testable without a
cluster; the load/save paths need the connector JAR and raise
ConnectorUnavailable in this image."""

from __future__ import annotations

import pytest

from cassandra_cql_streaming_db_migrator_spark.sources.cassandra import (
    ConnectorUnavailable,
    connection_options,
    load_cql_table,
)


def test_dbdefinition_fields_map_to_connector_options():
    opts = connection_options(
        {
            "contactPoints": ["c1.example", "c2.example"],
            "port": 9042,
            "localDatacenter": "dc1",
            "username": "u",
            "password": "p",
            "keyspaceName": "ks",
            "throughputMBPerSec": 10,
        }
    )
    assert opts["spark.cassandra.connection.host"] == "c1.example,c2.example"
    assert opts["spark.cassandra.connection.port"] == "9042"
    assert opts["spark.cassandra.connection.localDC"] == "dc1"
    assert opts["spark.cassandra.auth.username"] == "u"
    assert opts["spark.cassandra.auth.password"] == "p"
    assert opts["spark.cassandra.output.throughputMBPerSec"] == "10"


def test_missing_connector_raises_clear_error(spark):
    with pytest.raises(ConnectorUnavailable, match="spark-cassandra-connector"):
        load_cql_table(spark, {"keyspaceName": "ks"}, "t")
