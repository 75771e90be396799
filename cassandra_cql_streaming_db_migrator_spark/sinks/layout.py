"""Multi-dimensional file layout: Z-order clustering for data skipping.

At 100 TB the scan cost of a selective query is decided before it runs —
by which files hold which key ranges.  Range-partitioning on ONE column
gives perfect skipping on that column and none on any other;
Z-ordering (bit-interleaving two key columns into one sort key) makes
file min/max footers tight on BOTH columns at once, so parquet
row-group/file pruning works for predicates on either — the technique
behind Delta/Iceberg OPTIMIZE ZORDER, as an explicit engine operator.

``z_value`` is pure Catalyst integer arithmetic (a static sum of
per-bit terms with literal shifts — whole-stage codegen, no UDF).
Inputs must be non-negative and fit ``bits`` bits; rank- or
min-max-normalize wider/skewed domains first.

``write_zordered`` = repartitionByRange on the z-key (contiguous z-range
per file) + sortWithinPartitions (tight row groups inside the file).
One range shuffle — the same cost a single-column sorted write pays.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    result bit 2i = bit i of ``a``, bit 2i+1 = bit i of ``b``."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * i))
        )
        terms.append(
            F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * i + 1))
        )
    return reduce(add, terms)


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    n_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on Z(col_a, col_b): each output
    file covers a contiguous z-range, so its footer min/max is tight on
    BOTH columns."""
    z = z_value(F.col(col_a), F.col(col_b), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_sorted(
    df: DataFrame,
    path: str,
    order_cols: list[str],
    n_files: int = 16,
) -> None:
    """GLOBALLY sorted export (the terasort shape): repartitionByRange on
    the sort key gives each output file a disjoint, ascending key range
    (range boundaries ascend with partition id, so the lexicographic
    part-file order IS the global order), sortWithinPartitions orders
    rows inside each file.  One range exchange — a total sort at any
    scale with NO single-partition stage, where ``orderBy().write()``
    would also range-partition but this form makes the contract explicit
    and keeps the sort inside the writer task.  Consumers get perfectly
    tight parquet min/max footers on the leading key (max pruning for
    range predicates) and merge-join-ready files."""
    (
        df.repartitionByRange(n_files, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
