"""Join family (SURVEY §2.5 J2).

The reference has exactly one join shape — the PK left-anti of
IfNotExistFilter (operators.anti_join) — because its pipelines are
single-table.  But its calculated-column use case
(migration-config.example.yaml:97-120) is enrichment, which generalizes to
lookup joins; our engine exposes the full family.

Scale doctrine:
  * dimension tables (region/nation/...-sized) -> ``broadcast_dim_join``: no
    shuffle of the fact side at all; at 100 TB the fact table never moves.
  * fact-fact joins -> plain equi-join; AQE picks shuffled hash vs sort-merge
    and splits skewed partitions (skewJoin enabled in session.py).
  * pre-shuffling both sides on the key (``colocated``) reuses one exchange
    across several joins/aggs on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame, dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Equi-join with an explicit broadcast hint on the dimension side.
    AQE usually gets this right from size stats; the hint makes it a
    guarantee (a 100 TB fact shuffle by accident is unrecoverable)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — returns left rows with a match, never duplicates them."""
    return left.join(right, on=on, how="left_semi")


def colocated(df: DataFrame, key_columns: list[str], partitions: int | None = None) -> DataFrame:
    """Hash-partition on the join/agg key so several downstream wide ops on
    the same key share one exchange (bucketing's runtime cousin)."""
    return df.repartition(partitions, *key_columns) if partitions else df.repartition(*key_columns)
