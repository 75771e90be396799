"""cassandra_cql_streaming_db_migrator_spark — a PySpark-native analytics/migration engine.

A brand-new engine with the query and data-processing capabilities of the
reference config-driven CQL table migrator (see /root/repo/SURVEY.md), built
Spark-first: pipelines are declared as DataFrame lineages and optimized by
Catalyst, not hand-scheduled row loops.

Layout:
    session      SparkSession factory (local / cluster profiles)
    sources      parquet fixture reader + (gated) Cassandra connector reader
    plans        pipeline spec (YAML -> dataclass), schema validation, MVEL
                 expression translation
    operators    the operator library (filters, projections, computed columns,
                 limits, anti-join, counter merge, TTL arithmetic, joins,
                 aggregates, windows, set ops, dedup, similarity, text ops)
    sinks        upsert-merge / append / noop(simulate) / quarantine sinks
    streaming    Structured Streaming wrappers
    registry     named query registry backing __spark_entry__.py
"""

__version__ = "0.1.0"
