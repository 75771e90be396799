"""Window functions (SURVEY §2.7 O7) — absent from the reference, native here.

Scale notes: a window partitioned by a real key (customer, order) shuffles
once on that key and streams each partition — fine at any scale.  A window
with no partitionBy is a single-task global sort; the engine never emits one.
Top-k per group via row_number is the standard shape; Catalyst inserts a
partial per-partition limit before the shuffle when the filter is
rank <= k (WindowGroupLimit), so the shuffle carries k rows per group, not
the whole group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order: list[Column],
    k: int,
    rank_alias: str = "rn",
) -> DataFrame:
    """Deterministic iff ``order`` is total within each partition — pass a
    tiebreaker (PK) as the last sort key."""
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return df.withColumn(rank_alias, F.row_number().over(w)).filter(F.col(rank_alias) <= k)


def running_agg(
    df: DataFrame,
    partition_cols: list[str],
    order: list[Column],
    agg: Column,
    alias: str,
) -> DataFrame:
    """Running aggregate over rows unbounded-preceding..current."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, agg.over(w))


def lag_lead(
    df: DataFrame,
    partition_cols: list[str],
    order: list[Column],
    col: str,
    offsets: tuple[int, int] = (1, 1),
) -> DataFrame:
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return df.withColumn(f"{col}_lag", F.lag(col, offsets[0]).over(w)).withColumn(
        f"{col}_lead", F.lead(col, offsets[1]).over(w)
    )
