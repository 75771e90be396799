"""Focused tests for the round-12 optimization internals.

Covers the two operator-internal changes that are not pure expression
rewrites (those are pinned by test_sqlexpr_parity.py):

* connected_components' deferred pointer doubling — worst case for label
  propagation is a path graph (diameter = n); the shortcut must converge
  far inside max_iter and still emit component id = min member id, and it
  must agree with the star-contraction variant.
* run_to_memory's state_partitions — the drained result must equal the
  default-partition drain, and the session's shuffle-partition conf must
  be restored afterwards.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_cql_streaming_db_migrator_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)


def test_cc_converges_on_path_graph_within_log_rounds(spark):
    # a 200-node path: diameter 199 — plain min-label propagation needs
    # ~199 rounds and would blow the max_iter=50 guard; pointer doubling
    # must converge well inside it
    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    comps = connected_components(pairs, "a", "b", id_col="node")
    rows = comps.orderBy("node").collect()
    assert len(rows) == n
    assert all(r["component_id"] == 0 for r in rows)
    assert all(r["comp_size"] == n for r in rows)


def test_cc_doubling_agrees_with_star_variant(spark):
    # mixed shape: two chains + one clique + singleton pair
    edges = (
        [(i, i + 1) for i in range(0, 30)]            # chain 0..30
        + [(100 + i, 100 + i + 1) for i in range(40)]  # chain 100..140
        + [(500, 501), (500, 502), (501, 502)]         # triangle
        + [(900, 901)]
    )
    pairs = spark.createDataFrame(edges, "a long, b long")
    lhs = connected_components(pairs, "a", "b", id_col="node")
    rhs = connected_components_star(pairs, "a", "b", id_col="node")
    assert (
        lhs.orderBy("node").collect() == rhs.orderBy("node").collect()
    )


def test_run_to_memory_state_partitions_parity_and_restore(spark, sf_dir):
    from cassandra_cql_streaming_db_migrator_spark.streaming.stream import (
        read_events_stream,
        run_to_memory,
    )

    prev = spark.conf.get("spark.sql.shuffle.partitions")

    def drain(state_partitions):
        events = read_events_stream(spark, sf_dir)
        agg = events.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("s"),
        )
        out = run_to_memory(
            agg, output_mode="complete", state_partitions=state_partitions
        )
        return sorted(
            (r["event_type"], r["n"], r["s"]) for r in out.collect()
        )

    assert drain(4) == drain(None)
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
