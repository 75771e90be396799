"""Scale-pattern proofs: bucketed co-located joins eliminate exchanges;
salted joins are row-identical to plain joins (SCALE_NOTES.md)."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from cassandra_cql_streaming_db_migrator_spark.operators.joins import salted_join
from cassandra_cql_streaming_db_migrator_spark.sinks.bucketing import (
    read_bucketed,
    write_bucketed,
)
from cassandra_cql_streaming_db_migrator_spark.sources.parquet import load_table


def _plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Joining two tables bucketed+sorted on the join key must not shuffle
    OR sort: the whole point of bucketing 100 TB at ingest."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "t_orders_b", ["o_orderkey"], 8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        ["o_orderkey"],
        8,
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # sorted-bucket scans advertise their ordering only behind this
        # flag since SPARK-28595 (needs the one-file-per-bucket layout
        # write_bucketed guarantees)
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        joined = read_bucketed(spark, "t_orders_b").join(
            read_bucketed(spark, "t_lineitem_b"), on="o_orderkey"
        )
        plan = _plan_of(joined)
        assert not re.search(r"\n\(\d+\) Exchange", plan), plan
        assert "SortMergeJoin" in plan
        # sortBy metadata also removes the per-bucket sort
        assert not re.search(r"\n\(\d+\) Sort\b", plan), plan
        # and the result is the plain join's result
        plain = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert joined.count() == plain
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Row-identical results on a deliberately skewed input (one hot key
    holding most rows), and the join keys include the salt."""
    events = load_table(spark, sf_dir, "events")
    skewed = events.withColumn(
        "user_id", F.when(F.col("value") < 400, F.lit(7)).otherwise(F.col("user_id"))
    ).select("user_id", "event_id", "value")
    dim = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_user_events"))

    plain = skewed.join(dim, on="user_id")
    salted = salted_join(skewed, dim, ["user_id"], salt=4)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    assert "__salt" in _plan_of(salted)


def test_salted_left_join_keeps_unmatched(spark):
    from pyspark.sql import Row

    left = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")], "k long, v string"
    )
    right = spark.createDataFrame([Row(k=1, w="x")], "k long, w string")
    out = sorted(
        (r["k"], r["w"]) for r in salted_join(left, right, ["k"], salt=3, how="left").collect()
    )
    assert out == [(1, "x"), (2, None), (3, None)]
