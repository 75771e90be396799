"""serve_leg_planner (VERDICT r10 ask #7): the task-eval harness taken to
its decision — per-leg knob picks under a declared recall floor plus a
single chosen serving leg, exact brute force as the fallback."""

from __future__ import annotations

from cassandra_cql_streaming_db_migrator_spark.queries.llm import (
    _SERVE_PLANNER_FLOOR_PPM,
    serve_leg_planner,
)

SF = "/root/testdata/sf0.001"


def test_planner_decision_invariants(spark):
    rows = {r["leg"]: r for r in serve_leg_planner(spark, SF).collect()}
    assert sorted(rows) == ["exact", "graph", "ivf_pq", "lsh"]

    # exactly one chosen leg, and it must meet the floor (exact always does)
    chosen = [r for r in rows.values() if r["chosen"]]
    assert len(chosen) == 1
    assert chosen[0]["floor_met"]

    # the exact baseline is always eligible at perfect recall
    ex = rows["exact"]
    assert ex["curve_recall_ppm"] == 1_000_000 and ex["floor_met"]
    assert ex["knob"] == "none" and ex["knob_value"] == 0

    # floor_met is derived from the reported recall, per row
    for r in rows.values():
        assert r["floor_met"] == (
            r["curve_recall_ppm"] >= _SERVE_PLANNER_FLOOR_PPM
        )
        assert 0 <= r["mean_prec10_ppm"] <= 1_000_000
        assert 0 <= r["hit_rate_ppm"] <= 1_000_000
        assert r["curve_cost"] > 0 and r["n_queries"] > 0

    # the chosen leg is the cheapest floor-meeting one: no other
    # floor-meeting leg may undercut its cost
    best = chosen[0]
    for r in rows.values():
        if r["floor_met"] and r["leg"] != best["leg"]:
            assert r["curve_cost"] >= best["curve_cost"]

    # each index leg's knob names its curve axis
    assert rows["ivf_pq"]["knob"] == "n_probe"
    assert rows["lsh"]["knob"] == "n_bits"
    assert rows["graph"]["knob"] == "beam"
