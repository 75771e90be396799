"""Parquet fixture source.

The reference's source is a paged CQL table scan with explicit projection
(DefaultMigratorPlugin.java:180-220) and runtime schema discovery
(MigrateTableTask.java:415-428).  In Spark the scan is a parquet (or
connector) read: paging == input-split partitioning, projection == Catalyst
column pruning, schema discovery == the file footer / connector metadata.
Nothing imperative is needed — we just expose the tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Primary-key metadata for the fixture tables.  The reference discovers PK
# columns from cluster metadata (CassandraSchemaUtil.java:112-138); parquet
# has no PK concept, so the engine carries it as table-spec metadata — it
# drives upsert identity, anti-join keys, and dedup.
KEY_COLUMNS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table.

    The ``events`` table is written with parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects (PARQUET_TYPE_ILLEGAL).  We read nanos
    as long (legacy conf) and truncate to microsecond timestamps — the same
    truncation DuckDB applies when it reads TIMESTAMP_NS, so engine and
    oracle agree.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    for field_name, dtype in df.dtypes:
        if field_name == "ts" and dtype == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for the SQL surface)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def spread_input(df: DataFrame, key) -> DataFrame:
    """Conditional post-scan spread — guide §2.5 "input skew: one huge
    unsplittable file".  The fixture tables are single-row-group parquet
    files, so every scan is ONE unsplittable task no matter the core
    count; a scan-stage aggregate (partial aggregation runs inside the
    scan task) is then serial.  When the scan yields fewer splits than
    the scheduler's width, hash-repartition on a deterministic
    high-cardinality key (never ``rand()`` — SPARK-38388) so per-row work
    downstream parallelizes; at scale the input has >= cores splits and
    this is the identity.  Only worth applying where the scan-stage
    compute dominates (measured per query); an exchange is never free."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par, F.col(key) if isinstance(key, str) else key)
    return df
