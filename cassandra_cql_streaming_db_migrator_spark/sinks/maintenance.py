"""Table maintenance: small-file compaction.

A long-running ingest (the reference's continuous migration, our
streaming upsert sinks) accretes many small parquet files; at 100 TB the
resulting scan-task explosion and NameNode/listing pressure dominate read
cost.  ``compact_parquet_dir`` rewrites a directory into
``ceil(bytes / target)`` files.

Scale notes:
  * sizing comes from a file listing (metadata-only), never from reading
    the data twice;
  * the rewrite uses a temp-dir-then-atomic-swap (os.replace), so readers
    see the old or the new layout, never a half-written one — on object
    stores swap atomicity is the committer's job, this local
    implementation documents the contract;
  * ``coalesce`` (no shuffle) is used when REDUCING file count — the
    normal compaction direction; growing the file count (rare: splitting
    a single huge file) needs a real ``repartition`` shuffle;
  * partitioned tables should be compacted per partition directory
    (pass the partition dir as ``path``), bounding each rewrite to one
    partition's data — the same touched-partition discipline as the
    partition-scoped upsert sink.
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class CompactionStats:
    files_before: int
    files_after: int
    bytes_total: int
    compacted: bool  # False -> already within budget, nothing rewritten


def _parquet_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
    return out


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 4,
) -> CompactionStats:
    """Rewrite ``path`` into ``ceil(total_bytes / target_file_bytes)``
    parquet files if it currently has more than that (and at least
    ``min_files_to_compact`` — rewriting 2 files into 1 rarely pays)."""
    files = _parquet_files(path)
    total = sum(os.path.getsize(f) for f in files)
    want = max(1, math.ceil(total / target_file_bytes))
    if len(files) <= max(want, min_files_to_compact - 1):
        return CompactionStats(len(files), len(files), total, False)

    df = spark.read.parquet(path)
    tmp = tempfile.mkdtemp(
        prefix=".compact-", dir=os.path.dirname(os.path.abspath(path))
    )
    tmp_out = os.path.join(tmp, "data")
    # coalesce: narrow (no shuffle) since we only ever reduce file count here
    df.coalesce(want).write.mode("overwrite").parquet(tmp_out)

    old = path.rstrip(os.sep) + ".compact-old"
    os.replace(path, old)
    os.replace(tmp_out, path)
    shutil.rmtree(old)
    shutil.rmtree(tmp, ignore_errors=True)
    return CompactionStats(len(files), len(_parquet_files(path)), total, True)
