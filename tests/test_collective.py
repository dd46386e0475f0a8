"""collective_rescore: relational-evidence boost over scored pairs."""
from __future__ import annotations

import pytest


def _run(spark, rows, **kw):
    from spikex_spark.operators.collective import collective_rescore

    df = spark.createDataFrame(rows, "id_a bigint, id_b bigint, score double")
    out = collective_rescore(df, **kw).collect()
    return {(r["id_a"], r["id_b"]): r for r in out}


def test_triangle_boosts_the_weak_edge(spark):
    # a-c and b-c match; a-b is a weak candidate sharing neighbor c
    rows = [(1, 2, 0.70), (1, 3, 0.90), (2, 3, 0.85)]
    got = _run(spark, rows)
    r = got[(1, 2)]
    # N(1) = {3}, N(2) = {3} -> common 1, union 1
    assert r["common_matches"] == 1 and r["union_matches"] == 1
    assert r["collective_score"] == pytest.approx(0.90)  # 0.70 + 0.2*1/1
    # the strong edges have no common third neighbor: N(1)={3}, N(3)={1,2}
    assert got[(1, 3)]["common_matches"] == 0
    assert got[(1, 3)]["union_matches"] == 3
    assert got[(1, 3)]["collective_score"] == pytest.approx(0.90)


def test_no_evidence_leaves_score_unchanged(spark):
    rows = [(1, 2, 0.50), (3, 4, 0.95)]
    got = _run(spark, rows)
    assert got[(1, 2)]["collective_score"] == pytest.approx(0.50)
    assert got[(1, 2)]["union_matches"] == 0
    # matched pair with no third parties: union = {3} u {4}, common 0
    assert got[(3, 4)]["union_matches"] == 2
    assert got[(3, 4)]["collective_score"] == pytest.approx(0.95)


def test_boost_caps_at_one(spark):
    rows = [(1, 2, 0.95), (1, 3, 0.9), (2, 3, 0.9),
            (1, 4, 0.9), (2, 4, 0.9)]
    got = _run(spark, rows)
    # N(1) = {2,3,4}, N(2) = {1,3,4}: common {3,4}=2, union 4
    r = got[(1, 2)]
    assert (r["common_matches"], r["union_matches"]) == (2, 4)
    assert r["collective_score"] == 1.0  # 0.95 + 0.2*2/4 = 1.05 -> capped


def test_round_trip_admits_under_threshold_pair(spark):
    # the collective point: rethresholding at 0.8 now links (1,2)
    rows = [(1, 2, 0.78), (1, 3, 0.92), (2, 3, 0.88), (2, 4, 0.81),
            (1, 4, 0.85)]
    got = _run(spark, rows)
    r = got[(1, 2)]
    # N(1)={3,4}, N(2)={3,4} -> common 2, union 2 -> 0.78+0.2 = 0.98
    assert r["collective_score"] == pytest.approx(0.98)
    assert r["collective_score"] >= 0.80 > r["score"]


def test_all_pairs_returned_once(spark):
    rows = [(1, 2, 0.3), (2, 3, 0.9), (1, 3, 0.9), (4, 5, 0.1)]
    got = _run(spark, rows)
    assert len(got) == 4
