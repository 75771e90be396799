"""Maintenance-planner battery (VERDICT r11 ask #3): the three live
monitors folded into one decision table, and the verdict executed.

Pins: the axis set and default-threshold verdicts (steady-state corpus
holds the index axes, the fixture's near-random labels act the encoder
axis), both branches of every axis under forced thresholds, the applied
serve's decision columns, and build-once determinism of the applied
serve (artifact-gated: a second call returns identical rows).
"""

from __future__ import annotations

from cassandra_cql_streaming_db_migrator_spark.queries.llm import (
    _MAINT_DIST_THR_U,
    _MAINT_MARGIN_THR_PPM,
    _MAINT_NQ,
    _MAINT_OCC_THR_PPM,
    _MAINT_TOPK,
    maintenance_applied,
    maintenance_planner,
)


def test_planner_axes_and_default_verdicts(spark, sf_dir):
    rows = {r["axis"]: r for r in maintenance_planner(spark, sf_dir).collect()}
    assert set(rows) == {"occupancy", "codebook", "encoder"}
    occ, dis, mar = rows["occupancy"], rows["codebook"], rows["encoder"]
    assert (occ["action"], dis["action"], mar["action"]) == (
        "rebuild_index", "retrain_quantizer", "flag_encoder"
    )
    assert (occ["threshold"], dis["threshold"], mar["threshold"]) == (
        _MAINT_OCC_THR_PPM, _MAINT_DIST_THR_U, _MAINT_MARGIN_THR_PPM
    )
    # calibration contract (round-12 measurements at sf0.001/0.01/0.1):
    # the real corpus's arrival split is in-distribution -> both index
    # axes HOLD with wide margin; the synthetic labels are near-random in
    # embedding space -> the encoder axis ACTS with wide margin
    assert not occ["act"] and occ["metric_value"] < _MAINT_OCC_THR_PPM
    assert not dis["act"] and dis["metric_value"] < _MAINT_DIST_THR_U
    assert mar["act"] and mar["metric_value"] >= _MAINT_MARGIN_THR_PPM
    # cost evidence: index axes count corpus rows, encoder counts the
    # arrivals actually scored
    assert occ["n_rows"] == dis["n_rows"] > 0
    assert 0 < mar["n_rows"] <= occ["n_rows"]


def test_planner_thresholds_drive_both_branches(spark, sf_dir):
    flipped = {
        r["axis"]: r
        for r in maintenance_planner(
            spark, sf_dir, occ_thr=0, dist_thr=0, margin_thr=1_000_001
        ).collect()
    }
    assert flipped["occupancy"]["act"]
    assert flipped["codebook"]["act"]
    assert not flipped["encoder"]["act"]  # rate in ppm can never reach 1e6+1


def test_applied_hold_serves_standing_index(spark, sf_dir):
    rows = maintenance_applied(spark, sf_dir).collect()
    assert rows
    assert all(not r["retrained"] and r["encoder_flagged"] for r in rows)
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rn"])
    assert len(per_q) == _MAINT_NQ
    for rns in per_q.values():
        assert sorted(rns) == list(range(1, _MAINT_TOPK + 1))


def test_applied_is_deterministic_across_calls(spark, sf_dir):
    a = sorted(map(tuple, maintenance_applied(spark, sf_dir).collect()))
    b = sorted(map(tuple, maintenance_applied(spark, sf_dir).collect()))
    assert a == b


def test_applied_act_branch_retrains_for_real(spark, sf_dir):
    """Force an index axis to act (dist_thr=0): the applied serve must
    come from the retrained-on-union triple with retrained=True — the
    branch the default calibration holds shut still executes for real."""
    rows = maintenance_applied(
        spark, sf_dir, dist_thr=0, prefix_base="mnt_t"
    ).collect()
    assert rows
    assert all(r["retrained"] for r in rows)
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rn"])
    assert len(per_q) == _MAINT_NQ
    for rns in per_q.values():
        assert sorted(rns) == list(range(1, _MAINT_TOPK + 1))
