"""Temporal record linkage (operators/temporal.py): decay arithmetic and
timeline versioning, checked against hand-computed expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from spikex_spark.operators.temporal import (SCALE, decayed_pair_evidence,
                                             entity_timeline)


def test_decay_weights_exact(spark):
    rows = [
        # (id_a, id_b, day_a, day_b, agree)
        (1, 2, 100, 100, True),    # Δ=0  → full agreement evidence
        (1, 3, 100, 465, True),    # Δ=365 → agreement decayed to 0
        (1, 4, 100, 160, False),   # Δ=60  → half the disagreement penalty
        (1, 5, 100, 400, False),   # Δ=300 → penalty decayed to 0
        (1, 6, 100, 283, True),    # Δ=183 → floor(10000*183/365)=5013 off
    ]
    df = spark.createDataFrame(
        rows, ["id_a", "id_b", "day_a", "day_b", "agree"])
    out = {r["id_b"]: r for r in decayed_pair_evidence(
        df, agree_life_days=365, dis_life_days=120).collect()}

    assert out[2]["evidence_fx"] == SCALE
    assert out[3]["w_agree_fx"] == 0 and out[3]["evidence_fx"] == 0
    assert out[4]["w_dis_fx"] == SCALE // 2
    assert out[4]["evidence_fx"] == -(SCALE // 2)
    assert out[5]["evidence_fx"] == 0
    # exact integer floor, not float rounding: 10000 - 10000*183 div 365
    assert out[6]["w_agree_fx"] == SCALE - (SCALE * 183) // 365
    # decay adds no shuffle: the pair plan has no Exchange
    plan = decayed_pair_evidence(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_entity_timeline_versions(spark):
    rows = [
        # entity e1: value changes A→B→B→A in day order → 3 versions
        ("e1", 1, 10, "A"), ("e1", 2, 20, "B"),
        ("e1", 3, 30, "B"), ("e1", 4, 40, "A"),
        # entity e2: constant value → 1 version
        ("e2", 5, 5, "X"), ("e2", 6, 905, "X"),
        # e3: same-day tie broken by id (deterministic order)
        ("e3", 8, 50, "Q"), ("e3", 7, 50, "P"),
    ]
    df = spark.createDataFrame(rows, ["ent", "rid", "day", "val"])
    tl = {r["ent"]: r for r in entity_timeline(
        df, entity_col="ent", ts_day_col="day", value_col="val",
        id_col="rid").collect()}

    e1 = tl["e1"]
    assert (e1["n_records"], e1["n_versions"], e1["n_distinct_values"]) \
        == (4, 3, 2)
    assert (e1["first_seen_day"], e1["last_seen_day"],
            e1["lifespan_days"]) == (10, 40, 30)
    assert tl["e2"]["n_versions"] == 1
    assert tl["e2"]["lifespan_days"] == 900
    # tie at day 50: order is (50, rid=7 'P') then (50, rid=8 'Q') → 2
    assert tl["e3"]["n_versions"] == 2


def test_disagreement_decays_faster_than_agreement(spark):
    # the Li-et-al. asymmetry: conflicts are forgiven sooner than
    # agreements stay informative
    df = spark.createDataFrame(
        [(1, 2, 0, d, False) for d in range(0, 400, 40)],
        ["id_a", "id_b", "day_a", "day_b", "agree"])
    rows = decayed_pair_evidence(df).orderBy("delta_days").collect()
    assert all(r["w_dis_fx"] <= r["w_agree_fx"] for r in rows)
    assert all(a["w_dis_fx"] >= b["w_dis_fx"]
               for a, b in zip(rows, rows[1:]))
