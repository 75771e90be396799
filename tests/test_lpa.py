"""label_propagation_fixed_rounds (operators/graph.py): synchronous LPA
semantics pinned against a literal Python reference on crafted graphs."""

from __future__ import annotations

from collections import Counter

from cassandra_cql_streaming_db_migrator_spark.operators.graph import (
    label_propagation_fixed_rounds,
)


def _ref_lpa(nodes, und_edges, rounds):
    """Literal reference: synchronous rounds, most-frequent neighbor
    label, ties to smallest label, no-neighbor nodes keep theirs."""
    adj = {n: [] for n in nodes}
    for a, b in und_edges:
        adj[a].append(b)
    lab = {n: n for n in nodes}
    for _ in range(rounds):
        new = {}
        for n in nodes:
            if not adj[n]:
                new[n] = lab[n]
                continue
            cnt = Counter(lab[b] for b in adj[n])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        lab = new
    return lab


def _run(spark, nodes, directed_pairs, rounds):
    und = sorted(set(directed_pairs) | {(b, a) for a, b in directed_pairs})
    ndf = spark.createDataFrame([(n,) for n in nodes], "node long")
    edf = spark.createDataFrame(und, "a long, b long")
    got = {
        r["node"]: r["lab"]
        for r in label_propagation_fixed_rounds(
            ndf, edf, rounds=rounds
        ).collect()
    }
    assert got == _ref_lpa(nodes, und, rounds)
    return got


def test_bridge_between_triangles_stays_two_communities(spark):
    # two triangles joined by ONE bridge edge: CC merges them, LPA keeps
    # them apart — each side's internal majority (2 triangle neighbors vs
    # 1 bridge neighbor) wins every round
    nodes = [1, 2, 3, 10, 11, 12]
    pairs = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
    got = _run(spark, nodes, pairs, rounds=4)
    left = {got[1], got[2], got[3]}
    right = {got[10], got[11], got[12]}
    assert len(left) == 1 and len(right) == 1
    assert left != right


def test_isolated_node_keeps_own_label(spark):
    nodes = [1, 2, 99]
    got = _run(spark, nodes, [(1, 2)], rounds=3)
    assert got[99] == 99


def test_tie_breaks_to_smallest_label(spark):
    # node 5's neighbors 1 and 2 never change (each other's majority is a
    # tie too — everything resolves by min label); after round 1 node 5
    # must carry the smallest tied neighbor label
    nodes = [1, 2, 5]
    got = _run(spark, nodes, [(1, 5), (2, 5)], rounds=1)
    assert got[5] == 1


def test_star_collapses_to_hub_majority(spark):
    # hub 0 with leaves 1..4: round 1 sends every leaf the hub's label and
    # the hub the leaves' min; reference decides the exact fixed rounds
    nodes = [0, 1, 2, 3, 4]
    pairs = [(0, i) for i in range(1, 5)]
    _run(spark, nodes, pairs, rounds=4)
