"""Cassandra/Scylla connectivity via the spark-cassandra-connector.

The reference opens two CqlSession connections from DBDefinition config
(contact nodes, datacenter, keyspace; DBDefinition.java:10-15) tuned by
CassandraConnectionAdapter fields (page size, request/paging timeouts,
reconnection delay, consistency, session/application name;
CassandraConnectionAdapter.java:43-63,184-234).  The Spark-native
equivalent is the DataSource V2 ``org.apache.spark.sql.cassandra`` format:
the connector handles paging (S1), token-range input splits, key-column
predicate pushdown (S4), writes-as-upserts (K1), ``ttl(col)``/
``writetime(col)`` projections (S3/K4) and counter writes (K3).

Field-by-field mapping (the contract matrix pinned by
tests/test_cassandra_options.py):

  DBDefinition.contactNodes ("h1:9042, h2:9042", DBD:10-11)
      -> connection.host (+ connection.port when every node agrees on one)
  DBDefinition.contactNodesDatacenterName (DBD:12)  -> connection.localDC
  DBDefinition.keyspaceName (DBD:14)                -> reader/writer keyspace
  CCA.defaultPageSize (=3000, CCA:52, CONTINUOUS_PAGING_PAGE_SIZE at :225)
      -> input.fetch.sizeInRows (rows per driver request — same knob)
  CCA.requestTimeout (=10000 ms, CCA:55, REQUEST_TIMEOUT at :195)
      -> read.timeoutMS
  CCA.reconnectionDelays (CCA:49, RECONNECTION_BASE_DELAY at :226-228)
      -> connection.reconnectionDelayMS.min
  CCA REQUEST_CONSISTENCY / REQUEST_SERIAL_CONSISTENCY = LOCAL_ONE
      (CCA:222-223) -> input.consistency.level AND output.consistency.level
      = LOCAL_ONE.  (The reference's row writer then hardcodes CL ONE per
      statement, DefaultMigratorPlugin:397, overriding its own session
      default — a catalogued reference bug, SURVEY §7.4; we honor the
      session-level intent.)
  CCA.continousPagingTimeoutFirstPage/OtherPages (CCA:57-59,:196-199)
      -> no connector analog (DSE continuous-paging driver options; the
      connector's fetch is governed by read.timeoutMS).  Recorded as an
      explicit no-op in the matrix test.
  CCA session name / applicationName (CCA:43,:231,:238-240)
      -> no connector option (the connector manages its own CqlSession
      pool and names); explicit no-op in the matrix test.

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


def _parse_contact_nodes(pts: Any) -> tuple[str, str | None]:
    """The reference's contactNodes spelling is a comma-separated string of
    ``host:port`` entries with optional whitespace (DBDefinition.java:8-10);
    lists are accepted too.  Returns (host_csv, port) where port is set
    only when every node names the same one (the connector takes ONE port;
    mixed ports stay embedded in connection.host, which connector >= 3.0
    accepts)."""
    entries = (
        [str(p) for p in pts]
        if isinstance(pts, (list, tuple))
        else [p.strip() for p in str(pts).split(",")]
    )
    entries = [e for e in (x.strip() for x in entries) if e]
    ports = {e.rsplit(":", 1)[1] for e in entries if ":" in e}
    if len(ports) == 1 and all(":" in e for e in entries):
        return ",".join(e.rsplit(":", 1)[0] for e in entries), ports.pop()
    return ",".join(entries), None


def connection_options(db: dict[str, Any]) -> dict[str, str]:
    """Map the reference's DBDefinition + adapter fields onto connector
    options (full matrix in the module docstring)."""
    opts: dict[str, str] = {}
    pts = db.get("contactPoints") or db.get("contactNodes")
    if pts:
        host, port = _parse_contact_nodes(pts)
        opts["spark.cassandra.connection.host"] = host
        if port and not db.get("port"):
            opts["spark.cassandra.connection.port"] = port
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
    # CassandraConnectionAdapter session tuning (CCA:49-59,:195-228)
    if db.get("defaultPageSize"):
        opts["spark.cassandra.input.fetch.sizeInRows"] = str(db["defaultPageSize"])
    if db.get("requestTimeout"):
        opts["spark.cassandra.read.timeoutMS"] = str(db["requestTimeout"])
    if db.get("reconnectionDelays") is not None and int(db["reconnectionDelays"]) >= 0:
        opts["spark.cassandra.connection.reconnectionDelayMS.min"] = str(
            db["reconnectionDelays"]
        )
    # session-level LOCAL_ONE on both paths (CCA:222-223); overridable
    if db.get("consistencyLevel", "LOCAL_ONE"):
        cl = str(db.get("consistencyLevel", "LOCAL_ONE"))
        opts["spark.cassandra.input.consistency.level"] = cl
        opts["spark.cassandra.output.consistency.level"] = cl
    return opts


def read_options(
    db: dict[str, Any], table: str, ttl_probe_column: str | None = None
) -> dict[str, str]:
    """The complete option map the read path configures — the testable
    contract behind ``table_reader``.  ``ttl_probe_column`` requests the
    S3 TTL projection: the connector exposes ``ttl(col)`` as a queryable
    column (DefaultMigratorPlugin:197-200's arbitrary-first-non-PK probe
    becomes an explicit caller choice here)."""
    opts = {
        "keyspace": db.get("keyspaceName", ""),
        "table": table,
        **connection_options(db),
    }
    if ttl_probe_column:
        opts["ttl." + ttl_probe_column] = "row_ttl_value"
    return opts


def write_options(
    db: dict[str, Any],
    table: str,
    if_not_exists: bool = False,
    ttl_column: str | None = None,
) -> dict[str, str]:
    """The complete option map the write path configures — the testable
    contract behind ``write_cql_table``.  Connector appends are Cassandra
    upserts (K1); ``ifNotExists`` maps the LWT insert (K2); ``ttl`` the
    per-write TTL (K4)."""
    opts = {
        "keyspace": db.get("keyspaceName", ""),
        "table": table,
        **connection_options(db),
    }
    if if_not_exists:
        opts["ifNotExists"] = "true"
    if ttl_column:
        opts["ttl"] = ttl_column
    return opts


def table_reader(
    spark: SparkSession, db: dict[str, Any], table: str, ttl_probe_column: str | None = None
) -> DataFrameReader:
    """Configured reader for one CQL table; ``load()`` may raise
    ConnectorUnavailable in environments without the connector JAR."""
    reader = spark.read.format(CASSANDRA_FORMAT)
    for k, v in read_options(db, table, ttl_probe_column).items():
        reader = reader.option(k, v)
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
    writer = df.write.format(CASSANDRA_FORMAT).mode("append")
    for k, v in write_options(db, table, if_not_exists, ttl_column).items():
        writer = writer.option(k, v)
    try:
        writer.save()
    except Exception as e:
        if _looks_like_missing_connector(e):
            raise ConnectorUnavailable(
                "spark-cassandra-connector is not on the classpath"
            ) from e
        raise
