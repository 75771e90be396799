"""Bucketed-table sink: the storage-level answer to repeated shuffles.

The reference migrates between tables whose physical layout (partition
key) the database manages (CassandraSchemaUtil.java:112-138).  Spark's
analog for analytic workloads is bucketing: ``bucketBy(n, keys)`` +
``sortBy`` writes data pre-hash-partitioned and pre-sorted on the join/agg
key.  Every later equi-join or aggregate on those keys skips its exchange
(and with sortBy, its sort) entirely — tests assert the joined plan has
ZERO Exchange operators.

At 100 TB this is the difference between shuffling the fact table once
per query and never: bucket the big tables on their PK at ingest, and
every migration anti-join, counter merge, and enrichment join on that key
becomes a zipped per-bucket merge.  Pick bucket counts so one bucket of
the biggest table fits an executor (e.g. 100 TB / 4096 buckets ~ 25 GB —
at the upper bound; 8192+ for headroom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key_columns: list[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    # One shuffle to align tasks with buckets (repartition and bucketBy use
    # the same murmur3 hash): each bucket then gets exactly one file, which
    # is what lets later scans trust the sortBy metadata and skip their
    # sort — Spark re-sorts any bucket split across files.
    aligned = df.repartition(n_buckets, *[df[c] for c in key_columns])
    writer = aligned.write.mode(mode).format(fmt).bucketBy(n_buckets, *key_columns)
    if sort:
        writer = writer.sortBy(*key_columns)
    writer.saveAsTable(table)


# Per-process memo: prefix sets this process has already swept.  A dead
# pid's tables cannot come BACK during our lifetime (pids are only freed,
# and a reused pid's new tables belong to a live process), so one sweep
# per prefix set per process is the complete safety contract — repeating
# the listTables() round trip per call measured ~0.3 s per streaming
# microbatch drain (OPTIMIZATION_r13.md, stream_cdc_mirror attribution).
_GC_SWEPT: set[tuple[str, ...]] = set()


def gc_stale_pid_tables(spark: SparkSession, prefixes: list[str]) -> int:
    """Drop pid-suffixed managed tables left by DEAD processes.

    Queries that need private managed tables in a shared warehouse
    (bucketed_join, artifact stores) name them ``<prefix>..._<pid>``:
    stable within a process (bench reps overwrite in place), private
    across concurrent processes.  The cost is that a process never drops
    its own tables — the lazy result frame may still be read after the
    query function returns — so each CALL garbage-collects instead:
    any matching table whose pid no longer exists is unreadable-by-owner
    by definition and is dropped (ADVICE r06).  Returns the drop count.
    """
    import os
    import re

    key = tuple(sorted(prefixes))
    if key in _GC_SWEPT:
        return 0
    _GC_SWEPT.add(key)
    dropped = 0
    pat = re.compile(
        r"^(?:"
        + "|".join(re.escape(p) for p in prefixes)
        + r")(?:.*_)?(\d+)$"
    )
    for t in spark.catalog.listTables():
        m = pat.match(t.name)
        if not m:
            continue
        pid = int(m.group(1))
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)  # signal 0: existence probe, sends nothing
        except ProcessLookupError:
            spark.sql(f"DROP TABLE IF EXISTS `{t.name}`")
            dropped += 1
        except PermissionError:
            pass  # pid exists under another uid — leave its tables alone
    return dropped


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back with bucketing metadata intact (spark.table preserves the
    output partitioning; a raw parquet path read would not).

    The exchange elimination is always on; to ALSO skip the per-bucket
    sort on sorted tables, set
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` — off by
    default since SPARK-28595, and only honored when every bucket is one
    file (which write_bucketed's repartition alignment guarantees)."""
    return spark.table(table)


# A managed table's location is warehouse-dir/name for the life of the
# process (drop + recreate lands on the same path), so the DESCRIBE
# round trip — one collect per call, paid twice per cdc-mirror microbatch
# — is memoized per table name.
_LOCATION_CACHE: dict[tuple[str, str], str] = {}


def table_location(spark: SparkSession, table: str) -> str:
    """Filesystem path of a managed table's data directory."""
    from urllib.parse import urlparse

    key = (spark.conf.get("spark.sql.warehouse.dir", ""), table)
    cached = _LOCATION_CACHE.get(key)
    if cached is not None:
        return cached
    # metadata-scale: DESCRIBE output (catalog rows, not data)
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED `{table}`").collect()
    loc = next(r.data_type for r in rows if r.col_name == "Location")
    parsed = urlparse(loc)
    out = parsed.path if parsed.scheme in ("", "file") else loc
    _LOCATION_CACHE[key] = out
    return out


def bucket_files(location: str) -> dict[int, list[str]]:
    """Map bucket id -> data file paths for a bucketed table directory.
    Spark encodes the bucket id in the file name (``..._00042.c000...``,
    the suffix BucketingUtils parses on read), so the mapping is pure
    directory listing — no footer reads."""
    import os
    import re

    out: dict[int, list[str]] = {}
    for f in os.listdir(location):
        m = re.match(r"part-\d+-.*_(\d{5})(?:\.|$)", f)
        if m:
            out.setdefault(int(m.group(1)), []).append(
                os.path.join(location, f)
            )
    return out
