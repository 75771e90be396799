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


def test_planned_serve_executes_the_chosen_leg(spark):
    """planned_serve_batch must serve with exactly the planner's chosen
    (leg, knob) and emit complete per-query rank lists."""
    from cassandra_cql_streaming_db_migrator_spark.queries.llm import (
        planned_serve_batch,
        serve_leg_planner,
    )

    chosen = next(
        r for r in serve_leg_planner(spark, SF).collect() if r["chosen"]
    )
    rows = planned_serve_batch(spark, SF).collect()
    assert rows
    assert {(r["leg"], r["knob_value"]) for r in rows} == {
        (chosen["leg"], chosen["knob_value"])
    }
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rn"])
    for q, rns in by_q.items():
        assert sorted(rns) == list(range(1, len(rns) + 1))  # no rank gaps
        assert len(rns) <= 10


def test_planned_serve_every_leg_branch_runs(spark, monkeypatch):
    """Each serve branch must execute for a forced decision — the fixture
    planner only ever exercises one leg, so the others need a forced
    choice.  The exact leg is additionally value-checked against an
    inline brute force."""
    import numpy as np

    import cassandra_cql_streaming_db_migrator_spark.queries.llm as llm
    from cassandra_cql_streaming_db_migrator_spark.sources.parquet import (
        load_table,
    )

    def force(leg, knob):
        def fake(spark_, sf_dir_):
            return spark.createDataFrame(
                [(leg, knob, True)], "leg string, knob_value int, chosen boolean"
            )
        monkeypatch.setattr(llm, "serve_leg_planner", fake)
        return llm.planned_serve_batch(spark, SF).collect()

    for leg, knob in (("graph", 2), ("ivf_pq", 2), ("lsh", 6), ("exact", 0)):
        rows = force(leg, knob)
        assert rows, (leg, knob)
        assert all(r["leg"] == leg and r["knob_value"] == knob for r in rows)

    # exact-leg value parity vs NumPy brute force (sequential fold)
    rows = force("exact", 0)
    emb = load_table(spark, SF, "embeddings")
    data = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in data])
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in data])
    def fold_cos(qv):
        acc = np.zeros(mat.shape[0]); nrm = np.zeros(mat.shape[0]); qn = 0.0
        for d in range(mat.shape[1]):
            acc = acc + mat[:, d] * qv[d]
            nrm = nrm + mat[:, d] * mat[:, d]
            qn = qn + qv[d] * qv[d]
        return acc / (np.sqrt(nrm) * np.sqrt(qn))
    got = {(r["query_id"], r["rn"]): r["vec_id"] for r in rows}
    n_expected = 0
    for qid in ids[ids < 4]:
        j = int(np.nonzero(ids == qid)[0][0])
        cos = fold_cos(mat[j])
        order = [i for i in np.lexsort((ids, -cos)) if not np.isnan(cos[i])]
        for rn, i in enumerate(order[:10], start=1):
            assert got[(qid, rn)] == ids[i]
            n_expected += 1
    assert len(got) == n_expected
