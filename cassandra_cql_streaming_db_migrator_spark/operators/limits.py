"""Limits (SURVEY §2.2 K6, §2.7 O1/O2/O5).

The reference appends ``LIMIT n`` to the read (DefaultMigratorPlugin.java:
211-214, ``maxReadRowCount``) and enforces a cumulative write cap with abort
(MigrateTableTask.java:566-569, ``maxWriteRowCount`` — racy under parallel
writes, a bug we do not replicate).  Spark: ``df.limit(n)`` before the sink —
LocalLimit is pushed into every scan task, GlobalLimit takes the first n; no
race, no overshoot.

The reference never sorts (CQL clustering order is implicit).  Our engine
exposes ORDER BY / top-k as first-class: ``top_k`` compiles to
TakeOrderedAndProject — a per-partition heap + driver merge, no global sort
shuffle, the plan you want at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def read_limit(df: DataFrame, n: int) -> DataFrame:
    """S5/O1/K6: 0 or negative means unlimited (TMD:56-65 semantics)."""
    return df if n is None or n <= 0 else df.limit(n)


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """O5: deterministic top-k.  Callers must include a tiebreaker in
    ``order`` when the leading keys admit ties, so results are stable across
    partitionings (and match the oracle)."""
    return df.orderBy(*order).limit(k)
