"""Z-order layout: correctness of the bit interleave and the skipping
payoff it exists for — file footers must prune range predicates on BOTH
clustered columns."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import Row
from pyspark.sql import functions as F

from cassandra_cql_streaming_db_migrator_spark.sinks.layout import (
    write_zordered,
    z_value,
)


def _ref_interleave(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_reference(spark):
    rows = [Row(a=a, b=b) for a in (0, 1, 5, 255, 40_000) for b in (0, 3, 7, 65_535)]
    out = spark.createDataFrame(rows).select(
        "a", "b", z_value(F.col("a"), F.col("b")).alias("z")
    )
    for r in out.collect():
        assert r.z == _ref_interleave(r.a, r.b)


def _overlap_fraction(files: list[str], col: str, lo: int, hi: int) -> float:
    """Fraction of files whose [min, max] footer range intersects [lo, hi]
    — the files a stats-based pruner must read."""
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mn = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        mx = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        if mx >= lo and mn <= hi:
            hit += 1
    return hit / len(files)


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    rng_rows = [
        Row(x=(i * 7919) % 1024, y=(i * 104_729) % 1024, payload=i)
        for i in range(20_000)
    ]
    df = spark.createDataFrame(rng_rows)

    naive = str(tmp_path / "naive")
    # realistic baseline: sorted by ONE dimension (perfect on x...)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(naive)
    zpath = str(tmp_path / "zorder")
    write_zordered(df, zpath, "x", "y", bits=10, n_files=16)

    naive_files = glob.glob(naive + "/*.parquet")
    z_files = glob.glob(zpath + "/*.parquet")
    assert len(z_files) >= 8

    # a 10% box on y: the x-sorted layout cannot prune it at all, the
    # z-ordered layout must skip most files
    naive_y = _overlap_fraction(naive_files, "y", 100, 200)
    z_y = _overlap_fraction(z_files, "y", 100, 200)
    assert naive_y == 1.0
    assert z_y <= 0.5
    # and z-order still prunes x (the dimension naive is perfect on)
    z_x = _overlap_fraction(z_files, "x", 100, 200)
    assert z_x <= 0.5

    # layout changes bytes, not rows: content round-trips
    assert spark.read.parquet(zpath).count() == 20_000


def test_write_sorted_global_order(spark, tmp_path):
    """Files from write_sorted hold disjoint ascending ranges and are
    internally sorted: concatenating part files in name order yields the
    globally sorted sequence."""
    import glob
    import os

    from cassandra_cql_streaming_db_migrator_spark.sinks.layout import (
        write_sorted,
    )

    df = spark.range(10_000).withColumn(
        "k", (F.col("id") * 7919) % 10_007
    )
    out = str(tmp_path / "sorted")
    write_sorted(df.select("k", "id"), out, ["k", "id"], n_files=8)

    import pandas as pd

    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert len(files) > 1
    seen = []
    prev_max = None
    for f in files:
        pdf = pd.read_parquet(f)
        ks = list(zip(pdf["k"], pdf["id"]))
        assert ks == sorted(ks)  # sorted within file
        if ks:
            if prev_max is not None:
                assert prev_max <= ks[0]  # disjoint ascending ranges
            prev_max = ks[-1]
            seen.extend(ks)
    assert seen == sorted(seen)
    assert len(seen) == 10_000
