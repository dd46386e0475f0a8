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
