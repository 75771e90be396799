"""Job statistics (SURVEY §2.6 A2/A3).

The reference tracks rows_read / rows_passed_filter / rows_migrated /
rows_failed per table plus latency histograms (MigrateTableTask.java:89-92,
111-151) and prints a periodic status (MTT:375-413).  Spark-native: attach
``observe()`` metrics to the lineage so counters ride the job instead of
being counted in extra passes — at 100 TB, a second ``count()`` pass is a
second full scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str = "migration") -> tuple[DataFrame, Observation]:
    """Attach a row-count observation to a DataFrame; read
    ``obs.get['rows']`` after the terminal action."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs


def conservation_stats(
    read_df: DataFrame, passed_df: DataFrame
) -> DataFrame:
    """Dry-run conservation report as data (K5/A2): one row with
    rows_read = rows_passed + rows_filtered.  Used by the oracle-checked
    ``dry_run_stats`` query; runtime pipelines use ``observed`` instead."""
    r = read_df.agg(F.count(F.lit(1)).alias("rows_read"))
    p = passed_df.agg(F.count(F.lit(1)).alias("rows_passed"))
    return r.crossJoin(p).select(
        "rows_read",
        "rows_passed",
        (F.col("rows_read") - F.col("rows_passed")).alias("rows_filtered"),
    )
