"""Aggregate family (SURVEY §2.6 A4).

Absent from the reference (its only aggregate is the counter merge,
operators.counter); first-class here.  Everything routes through
``groupBy().agg()`` so Tungsten's hash aggregate with map-side partial
aggregation applies — the shuffle moves partial states, not rows, which is
what makes a 100 TB groupBy feasible.

``decimal_sum`` is the cross-engine determinism primitive: double sums are
order-dependent (partitioning-dependent!), decimal sums are exact and
associative.  Any aggregate a correctness gate will hash must use it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EXACT_DECIMAL = "decimal(28,10)"


def decimal_sum(col: Column | str, alias: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(EXACT_DECIMAL)).alias(alias)


def stable_avg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Exact decimal sum -> one double division -> round: identical bits on
    any engine / any partitioning."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast(EXACT_DECIMAL)).cast("double") / F.count(F.lit(1)), scale
    ).alias(alias)


def rollup_agg(df: DataFrame, group_cols: list[str], aggs: list[Column]) -> DataFrame:
    """ROLLUP with grouping indicators (int-cast so engines agree on type);
    grouping() must live inside agg() — it is aggregate-context only."""
    marks = [F.grouping(c).cast("int").alias(f"grouping_{c}") for c in group_cols]
    return df.rollup(*group_cols).agg(*aggs, *marks)


def cube_agg(df: DataFrame, group_cols: list[str], aggs: list[Column]) -> DataFrame:
    marks = [F.grouping(c).cast("int").alias(f"grouping_{c}") for c in group_cols]
    return df.cube(*group_cols).agg(*aggs, *marks)


def grouped(df: DataFrame, group_cols: list[str], aggs: list[Column]) -> DataFrame:
    return df.groupBy(*group_cols).agg(*aggs)
