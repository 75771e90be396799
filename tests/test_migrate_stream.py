"""End-to-end streaming migration: events stream -> spec transform ->
foreachBatch upsert into a parquet target (SURVEY §2.9 T1-T5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_cql_streaming_db_migrator_spark.plans.spec import FilterDef, TableMigration
from cassandra_cql_streaming_db_migrator_spark.sources.cassandra import connection_options
from cassandra_cql_streaming_db_migrator_spark.sources.parquet import load_table
from cassandra_cql_streaming_db_migrator_spark.streaming.migrate import migrate_stream_to_parquet
from cassandra_cql_streaming_db_migrator_spark.streaming.stream import read_events_stream


def _spec(simulate: bool) -> TableMigration:
    return TableMigration(
        table_name="events",
        key_columns=["event_id"],
        filters=[FilterDef("row.value >= 0.0", language="mvel")],
        calculated_columns={"value_cents": "CAST(row.value * 100 AS BIGINT)"},
        simulate_only=simulate,
        continue_on_row_error=True,
    )


def test_streaming_migrate_upserts_target(spark, sf_dir, tmp_path):
    target = str(tmp_path / "events_v2.parquet")
    stream = read_events_stream(spark, sf_dir)
    migrate_stream_to_parquet(
        stream, _spec(simulate=False), target, checkpoint_dir=str(tmp_path / "ckpt")
    )

    got = spark.read.parquet(target)
    expect = (
        load_table(spark, sf_dir, "events")
        .filter("value >= 0.0")
        .withColumn("value_cents", F.expr("CAST(value * 100 AS BIGINT)"))
    )
    assert got.count() == expect.count()
    assert set(got.columns) == set(expect.columns)
    # spot-check one migrated row's computed column
    row = got.orderBy("event_id").first()
    src = expect.orderBy("event_id").first()
    assert row.value_cents == src.value_cents


def test_streaming_migrate_simulate_writes_nothing(spark, sf_dir, tmp_path):
    target = str(tmp_path / "nothing.parquet")
    stream = read_events_stream(spark, sf_dir)
    migrate_stream_to_parquet(
        stream, _spec(simulate=True), target, checkpoint_dir=str(tmp_path / "ckpt2")
    )
    import os

    assert not os.path.exists(target)


def test_streaming_migrate_status_line_carries_latency_quantiles(
    spark, sf_dir, tmp_path
):
    """T6+A3 end-to-end: a real streaming migration's status lines carry the
    read AND write sliding-window histogram quantiles (p50/p99), the analog
    of the reference's periodic report (MigrateTableTask.java:400-410:
    avgOfLastReadTimes / avgOfLastWriteTimes in every status print)."""
    import re
    import time

    from cassandra_cql_streaming_db_migrator_spark.metrics import StatusReporter

    rep = StatusReporter.attach(spark)
    try:
        target = str(tmp_path / "events_status.parquet")
        stream = read_events_stream(spark, sf_dir)
        migrate_stream_to_parquet(
            stream, _spec(simulate=False), target,
            checkpoint_dir=str(tmp_path / "ckpt_status"),
        )
        deadline = time.time() + 10
        while time.time() < deadline and not any(
            "rows=" in line for line in rep.lines
        ):
            time.sleep(0.2)
    finally:
        rep.detach(spark)

    progress = [line for line in rep.lines if "rows=" in line]
    assert progress, rep.lines
    # each status line embeds BOTH histograms' quantile summaries
    pat = re.compile(
        r"fetch_ms=\S+ \[n=\d+ p50=\d+ p95=\d+ p99=\d+ max=\d+\] "
        r"write_ms=\S+ \[n=\d+ p50=\d+ p95=\d+ p99=\d+ max=\d+\]"
    )
    assert all(pat.search(line) for line in progress), progress
    # and the quantiles are real observations, not placeholders
    assert rep.read_latency.quantile(0.99) is not None
    assert rep.write_latency.quantile(0.99) is not None
    assert max(rep.write_latency._obs) > 0


def test_connection_options_parity():
    """DBDefinition fields -> connector options (CCA:184-234 mapping)."""
    opts = connection_options(
        {
            "contactPoints": ["10.0.0.1", "10.0.0.2"],
            "port": 9042,
            "localDatacenter": "dc1",
            "username": "u",
            "password": "p",
            "keyspaceName": "ks",
        }
    )
    assert opts["spark.cassandra.connection.host"] == "10.0.0.1,10.0.0.2"
    assert opts["spark.cassandra.connection.port"] == "9042"
    assert opts["spark.cassandra.connection.localDC"] == "dc1"
    assert opts["spark.cassandra.auth.username"] == "u"


def test_multibatch_stream_upsert_last_batch_wins(spark, tmp_path):
    """Two ordered microbatches writing the same PK: the later batch's value
    must survive in the upsert target (K1 last-write-wins across batches)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cassandra_cql_streaming_db_migrator_spark.plans.spec import TableMigration
    from cassandra_cql_streaming_db_migrator_spark.streaming.migrate import (
        migrate_stream_to_parquet,
    )

    src = tmp_path / "src"
    src.mkdir()

    def wb(name, ks, vs, mtime):
        p = str(src / name)
        pq.write_table(pa.table({"k": ks, "v": vs}), p)
        os.utime(p, (mtime, mtime))

    wb("b1.parquet", [1, 2], ["one_v1", "two_v1"], 1_000_000_000)
    wb("b2.parquet", [2, 3], ["two_v2", "three_v1"], 1_000_000_010)

    stream = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    spec = TableMigration(
        table_name="t", key_columns=["k"], simulate_only=False,
        continue_on_row_error=True,
    )
    target = str(tmp_path / "target")
    migrate_stream_to_parquet(stream, spec, target, checkpoint_dir=str(tmp_path / "ck"))
    got = {r["k"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert got == {1: "one_v1", 2: "two_v2", 3: "three_v1"}
