"""Cassandra/Scylla connectivity via the spark-cassandra-connector.

The reference opens two CqlSession connections from DBDefinition config
(contact points, port, credentials, keyspace; DBDefinition.java:14,
CassandraConnectionAdapter.java:184-234).  The Spark-native equivalent is
the DataSource V2 ``org.apache.spark.sql.cassandra`` format: the connector
handles paging (S1), token-range input splits, key-column predicate
pushdown (S4), writes-as-upserts (K1), ``ttl(col)``/``writetime(col)``
projections (S3/K4) and counter writes (K3).

The connector JAR is not present in this (self-contained test) image —
BASELINE.json marks native CQL handling as peripheral and the parquet
fixtures as the correctness surface — so every entry point raises a clear
ConnectorUnavailable error if the format cannot be loaded.  The option
wiring below is the production path and is unit-testable without a cluster.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

CASSANDRA_FORMAT = "org.apache.spark.sql.cassandra"


class ConnectorUnavailable(RuntimeError):
    pass


def _looks_like_missing_connector(e: Exception) -> bool:
    """Only the signatures a missing DataSource registration actually
    produces — a broad 'data source' substring would relabel genuine
    connector errors (option validation, missing tables) as a classpath
    problem and send the operator down the wrong debugging path."""
    msg = str(e)
    return (
        "ClassNotFound" in msg
        or "DATA_SOURCE_NOT_FOUND" in msg
        or "Failed to find the data source" in msg
        or "Failed to find data source" in msg
    )



def connection_options(db: dict[str, Any]) -> dict[str, str]:
    """Map the reference's DBDefinition fields onto connector options.

    Accepted keys (reference names): contactPoints, port, localDatacenter,
    username, password, keyspaceName.
    """
    opts: dict[str, str] = {}
    # contactNodes is the reference's spelling (DBDefinition /
    # migration-config.example.yaml:12); host:port strings keep their port
    pts = db.get("contactPoints") or db.get("contactNodes")
    if pts:
        opts["spark.cassandra.connection.host"] = (
            ",".join(pts) if isinstance(pts, (list, tuple)) else str(pts)
        )
    if db.get("contactNodesDatacenterName") and not db.get("localDatacenter"):
        opts["spark.cassandra.connection.localDC"] = str(db["contactNodesDatacenterName"])
    if db.get("port"):
        opts["spark.cassandra.connection.port"] = str(db["port"])
    if db.get("localDatacenter"):
        opts["spark.cassandra.connection.localDC"] = str(db["localDatacenter"])
    if db.get("username"):
        opts["spark.cassandra.auth.username"] = str(db["username"])
    if db.get("password"):
        opts["spark.cassandra.auth.password"] = str(db["password"])
    # reference throttling knobs (TMD:87-91) -> connector rate limits
    if db.get("throughputMBPerSec"):
        opts["spark.cassandra.output.throughputMBPerSec"] = str(db["throughputMBPerSec"])
    return opts


def table_reader(
    spark: SparkSession, db: dict[str, Any], table: str, ttl_probe_column: str | None = None
) -> DataFrameReader:
    """Configured reader for one CQL table; ``load()`` may raise
    ConnectorUnavailable in environments without the connector JAR.
    ``ttl_probe_column`` requests the S3 TTL projection: the connector
    exposes ``ttl(col)`` as a queryable column."""
    reader = (
        spark.read.format(CASSANDRA_FORMAT)
        .option("keyspace", db.get("keyspaceName", ""))
        .option("table", table)
    )
    for k, v in connection_options(db).items():
        reader = reader.option(k, v)
    if ttl_probe_column:
        reader = reader.option("ttl." + ttl_probe_column, "row_ttl_value")
    return reader


def load_cql_table(
    spark: SparkSession, db: dict[str, Any], table: str, ttl_probe_column: str | None = None
) -> DataFrame:
    try:
        return table_reader(spark, db, table, ttl_probe_column).load()
    except Exception as e:  # ClassNotFound / DataSource not found
        if _looks_like_missing_connector(e):
            raise ConnectorUnavailable(
                "spark-cassandra-connector is not on the classpath; add "
                "com.datastax.spark:spark-cassandra-connector to spark.jars.packages"
            ) from e
        raise


def write_cql_table(
    df: DataFrame,
    db: dict[str, Any],
    table: str,
    if_not_exists: bool = False,
    ttl_column: str | None = None,
) -> None:
    """K1/K2/K4 write path: connector appends are Cassandra upserts; LWT
    inserts and per-row TTL map to writer options."""
    writer = (
        df.write.format(CASSANDRA_FORMAT)
        .mode("append")
        .option("keyspace", db.get("keyspaceName", ""))
        .option("table", table)
    )
    for k, v in connection_options(db).items():
        writer = writer.option(k, v)
    if if_not_exists:
        writer = writer.option("ifNotExists", "true")
    if ttl_column:
        writer = writer.option("ttl", ttl_column)
    try:
        writer.save()
    except Exception as e:
        if _looks_like_missing_connector(e):
            raise ConnectorUnavailable(
                "spark-cassandra-connector is not on the classpath"
            ) from e
        raise
