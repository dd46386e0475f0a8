from __future__ import annotations

import hashlib

import pytest

from spikex_spark.operators.sketch import kmv_hashes, kmv_intersection

SCALE = 1 << 60


def _h(v: str) -> int:
    return int(hashlib.md5(v.encode()).hexdigest()[:15], 16)


def _brute(a_vals, b_vals, k):
    def sketch(vals):
        hs = sorted({_h(v) for v in vals})
        return hs[:k], (SCALE if len(hs) < k else hs[:k][-1])

    sa, ta = sketch(a_vals)
    sb, tb = sketch(b_vals)
    theta = min(ta, tb)
    common = {h for h in sa if h in set(sb) and h < theta}
    union = {h for h in set(sa) | set(sb) if h < theta}
    est_i = round(len(common) * float(SCALE) / float(theta), 4)
    est_j = round(len(common) / len(union), 6) if union else 0.0
    return (theta, len(common), len(union), est_i, est_j)


def _run(spark, a_rows, b_rows, k):
    a = spark.createDataFrame(a_rows, "grp string, v string")
    b = spark.createDataFrame(b_rows, "grp string, v string")
    ha = kmv_hashes(a, "grp", "v", k=k)
    hb = kmv_hashes(b, "grp", "v", k=k)
    return {
        r["grp"]: (r["theta_hash"], r["n_common"], r["n_union_sample"],
                   r["est_intersection"], r["est_jaccard"])
        for r in kmv_intersection(ha, hb, k=k).collect()
    }


def test_exact_regime_equals_true_intersection(spark):
    a = [("g", f"tok{i}") for i in range(20)]
    b = [("g", f"tok{i}") for i in range(10, 30)]
    got = _run(spark, a, b, k=256)
    theta, nc, nu, ei, ej = got["g"]
    assert theta == SCALE
    assert nc == 10 and nu == 30
    assert ei == 10.0  # exact when both sketches are exact
    assert ej == round(10 / 30, 6)
    assert got["g"] == _brute([v for _, v in a], [v for _, v in b], 256)


def test_estimate_regime_matches_bruteforce(spark):
    a = [("g", f"alpha{i}") for i in range(400)]
    b = [("g", f"alpha{i}") for i in range(200, 600)]
    k = 64
    got = _run(spark, a, b, k=k)
    exp = _brute([v for _, v in a], [v for _, v in b], k)
    assert got["g"] == exp
    # the estimate should be in the right ballpark of the true 200
    assert 80 <= got["g"][3] <= 500


def test_groups_must_appear_in_both(spark):
    a = [("only_a", "x"), ("shared", "y")]
    b = [("only_b", "x"), ("shared", "y")]
    got = _run(spark, a, b, k=16)
    assert set(got) == {"shared"}
    assert got["shared"][1] == 1  # the one common value


def test_disjoint_groups_zero_common(spark):
    a = [("g", f"a{i}") for i in range(5)]
    b = [("g", f"b{i}") for i in range(5)]
    got = _run(spark, a, b, k=16)
    assert got["g"][1] == 0 and got["g"][3] == 0.0 and got["g"][4] == 0.0
