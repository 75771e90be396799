"""Robust (median/MAD-based) outlier statistics.

The quality-filtering primitive mean/stddev can't provide: a single
corrupt batch with 1e9-valued rows drags a z-score gate's own threshold,
while the median absolute deviation barely moves.  Training-data
pipelines use exactly this shape to quarantine pathological values
before they reach loss computations.

Plan shape (shuffles all on the group key; the per-group median and MAD
tables are one-row-per-group — metadata scale — so their join-backs are
broadcasts, not fact shuffles):

  1. exact per-group median of ``value_col`` (sort-based percentile
     aggregate — the same ``percentile`` primitive as agg_percentiles,
     proven bit-equal to DuckDB's ``quantile_cont``);
  2. facts + broadcast(median) -> absolute deviations -> per-group MAD;
  3. facts + broadcast(MAD) -> outlier census against the classic
     ``|x - med| > k * 1.4826 * MAD`` gate.

Cross-engine determinism: medians are order statistics (sort + one
interpolation) — deterministic on identical multisets; the deviation
``abs(x - med)`` and the gate comparison are per-row double arithmetic
on identical operands; counts are integers (cast to BIGINT on the oracle
side — DuckDB's ``sum(CASE ...)`` would otherwise widen to HUGEINT and
fail the driver's hash representation, the round-2 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# scale factor making MAD consistent with sigma under normality
MAD_SIGMA = 1.4826


def mad_outlier_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Per-group robust stats: n, median, MAD, and the count of values
    outside ``median ± k * 1.4826 * MAD``."""
    valid = df.where(F.col(value_col).isNotNull())
    med = valid.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("median")
    )
    dev = valid.join(F.broadcast(med), group_col).withColumn(
        "__adev", F.abs(F.col(value_col) - F.col("median"))
    )
    mad = dev.groupBy(group_col).agg(
        F.expr("percentile(__adev, 0.5)").alias("mad")
    )
    gate = F.lit(k) * F.lit(MAD_SIGMA) * F.col("mad")
    return (
        dev.join(F.broadcast(mad), group_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("median").alias("median"),
            F.first("mad").alias("mad"),
            F.sum(F.when(F.col("__adev") > gate, 1).otherwise(0)).alias(
                "n_outliers"
            ),
        )
    )


def mad_outlier_stats_sql(
    table: str, group_col: str, value_col: str, k: float = 3.0
) -> str:
    """DuckDB oracle twin.  ``quantile_cont`` == Spark ``percentile``
    (same (n-1)*q interpolation rule — proven bit-equal by
    agg_percentiles)."""
    return f"""
WITH med AS (
  SELECT {group_col}, quantile_cont({value_col}, 0.5) AS median
  FROM {table} WHERE {value_col} IS NOT NULL GROUP BY {group_col}
),
dev AS (
  SELECT t.{group_col}, med.median,
         abs(t.{value_col} - med.median) AS adev
  FROM {table} t JOIN med USING ({group_col})
  WHERE t.{value_col} IS NOT NULL
),
mad AS (
  SELECT {group_col}, quantile_cont(adev, 0.5) AS mad FROM dev
  GROUP BY {group_col}
)
SELECT dev.{group_col}, count(*) AS n,
       any_value(dev.median) AS median,
       any_value(mad.mad) AS mad,
       CAST(sum(CASE WHEN dev.adev > {k} * {MAD_SIGMA} * mad.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev JOIN mad USING ({group_col})
GROUP BY dev.{group_col}
"""
