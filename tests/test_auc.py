"""ranking_auc: exact tie-corrected Mann-Whitney ROC AUC."""
from __future__ import annotations

import pytest


def _auc(spark, rows):
    from spikex_spark.operators.evaluation import ranking_auc

    df = spark.createDataFrame(rows, "score double, y int")
    return ranking_auc(df).collect()[0]


def _brute(rows):
    """Pairwise definition: P(s_pos > s_neg) + 0.5 P(s_pos = s_neg)."""
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    num = sum(1.0 if p > n else 0.5 if p == n else 0.0
              for p in pos for n in neg)
    return num / (len(pos) * len(neg))


def test_perfect_and_inverted(spark):
    rows = [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)]
    assert _auc(spark, rows)["auc"] == 1.0
    rows_inv = [(s, 1 - y) for s, y in rows]
    assert _auc(spark, rows_inv)["auc"] == 0.0


def test_ties_match_pairwise_definition(spark):
    rows = [(0.5, 1), (0.5, 0), (0.7, 1), (0.3, 0), (0.5, 1), (0.2, 0)]
    got = _auc(spark, rows)
    assert got["auc"] == pytest.approx(_brute(rows), abs=1e-6)
    assert got["gini"] == pytest.approx(2 * _brute(rows) - 1, abs=1e-6)
    assert (got["n_pos"], got["n_neg"]) == (3, 3)


def test_random_case_matches_brute_force(spark):
    import random

    rng = random.Random(11)
    rows = [(round(rng.random(), 2), rng.randint(0, 1)) for _ in range(60)]
    if not any(y for _, y in rows) or all(y for _, y in rows):
        rows += [(0.5, 0), (0.5, 1)]
    assert _auc(spark, rows)["auc"] == pytest.approx(_brute(rows), abs=1e-6)


def test_degenerate_single_class_is_null(spark):
    got = _auc(spark, [(0.5, 1), (0.6, 1)])
    assert got["auc"] is None and got["gini"] is None


def test_logistic_contributions_reconstruct_logit(spark):
    from spikex_spark.operators.linkage import (logistic_contributions,
                                                logistic_score,
                                                logistic_train)

    rows = [
        (1, 2, 1.0, 0.95, 0.90),
        (1, 3, 0.0, 0.20, 0.10),
        (2, 3, 1.0, 0.85, 0.80),
        (4, 5, 0.0, 0.40, 0.30),
    ]
    feat = spark.createDataFrame(
        rows, "id_a long, id_b long, y double, jw double, jacc double")
    wts = logistic_train(feat, ["jw", "jacc"], rounds=3)
    contribs = logistic_contributions(feat, wts, ["jw", "jacc"]).collect()
    by_pair = {}
    for r in contribs:
        by_pair.setdefault((r["id_a"], r["id_b"]), []).append(r)
    assert all(len(v) == 3 for v in by_pair.values())  # bias + 2 features
    # exact identity: every contribution is w_micro * f_micro
    for v in by_pair.values():
        for r in v:
            assert r["contrib_p12"] == r["w_micro"] * r["f_micro"]
    # z reconstructed from contributions reproduces the scorer's p_micro
    import math
    scores = {(r["id_a"], r["id_b"]): r["p_micro"]
              for r in logistic_score(feat, wts, ["jw", "jacc"]).collect()}
    for pair, v in by_pair.items():
        z = sum(r["contrib_p12"] for r in v) / 1e12
        pm = math.floor(1.0 / (1.0 + math.exp(-z)) * 1e6 + 0.5)
        assert pm == scores[pair]
