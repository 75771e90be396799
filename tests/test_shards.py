"""Balanced shard export sink (sinks/shards.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_cql_streaming_db_migrator_spark.sinks.shards import (
    read_sharded,
    shard_assignment,
    write_sharded,
)
from cassandra_cql_streaming_db_migrator_spark.sources.parquet import load_table


def test_write_sharded_roundtrip_and_manifest(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "shards")
    manifest = write_sharded(docs, path, n_shards=8).collect()
    assert [r["shard"] for r in manifest] == list(range(8))
    assert sum(r["n_rows"] for r in manifest) == docs.count()
    # hash assignment is near-uniform: no shard more than 3x the mean
    mean = docs.count() / 8
    assert all(r["n_rows"] < 3 * mean for r in manifest)

    back = read_sharded(spark, path)
    assert back.count() == docs.count()
    assert sorted(r["doc_id"] for r in back.collect()) == sorted(
        r["doc_id"] for r in docs.collect()
    )


def test_shard_assignment_deterministic_and_pruned_read(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    a = docs.select("doc_id", shard_assignment(F.col("doc_id"), 8).alias("s"))
    b = docs.repartition(7).select(
        "doc_id", shard_assignment(F.col("doc_id"), 8).alias("s")
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    path = str(tmp_path / "shards2")
    write_sharded(docs, path, n_shards=4).collect()
    one = read_sharded(spark, path).where(F.col("shard") == 2)
    # partition pruning: the scan should read only the shard=2 directory
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan or "shard#" in plan
    expect = docs.select(
        shard_assignment(F.col("doc_id"), 4).alias("s")
    ).where(F.col("s") == 2)
    assert one.count() == expect.count()


def test_write_sharded_max_records_splits_files(spark, sf_dir, tmp_path):
    import glob

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "shards3")
    write_sharded(docs, path, n_shards=2, max_records_per_file=50).collect()
    files = glob.glob(f"{path}/shard=*/*.parquet")
    # 500 docs over 2 shards at <=50 rows/file -> at least 10 files
    assert len(files) >= 10
    counts = [
        spark.read.parquet(f).count() for f in files
    ]
    assert all(c <= 50 for c in counts)
