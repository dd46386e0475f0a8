"""logistic_train: deterministic in-engine logistic matcher training."""
from __future__ import annotations

import math

import pytest


def _numpy_ref(rows, rounds):
    """Brute-force replay of the micro-int GD recipe."""
    ym = [int(math.floor(y * 1e6 + 0.5)) for y, *_ in rows]
    fm = [[int(math.floor(f * 1e6 + 0.5)) for f in fs] for _, *fs in rows]
    nfeat = len(fm[0])
    w = [0] * (nfeat + 1)
    n = len(rows)
    for _ in range(rounds):
        s = [0] * (nfeat + 1)
        for i in range(n):
            z = w[0] / 1e6
            for j in range(nfeat):
                z = z + w[j + 1] / 1e6 * (fm[i][j] / 1e6)
            pm = int(math.floor(1.0 / (1.0 + math.exp(-z)) * 1e6 + 0.5))
            d = pm - ym[i]
            s[0] += d * 1000000
            for j in range(nfeat):
                s[j + 1] += d * fm[i][j]
        for j in range(nfeat + 1):
            w[j] -= math.floor(s[j] / (n * 1e6) + 0.5)
    return w


def test_matches_scalar_replay(spark):
    from spikex_spark.operators.linkage import logistic_train

    rows = [(1.0, 0.95, 0.8), (1.0, 0.9, 0.9), (1.0, 0.85, 0.7),
            (0.0, 0.2, 0.1), (0.0, 0.3, 0.05), (0.0, 0.15, 0.2),
            (0.0, 0.6, 0.4), (1.0, 0.7, 0.75)]
    df = spark.createDataFrame(rows, "y double, a double, b double")
    got = logistic_train(df, ["a", "b"], rounds=4)
    exp = _numpy_ref(rows, rounds=4)
    assert [w for _, w in got] == exp
    assert [nm for nm, _ in got] == ["bias", "a", "b"]


def test_separable_data_gets_positive_feature_weights(spark):
    from spikex_spark.operators.linkage import logistic_train

    rows = ([(1.0, 0.9 + i * 0.001) for i in range(20)]
            + [(0.0, 0.1 + i * 0.001) for i in range(20)])
    df = spark.createDataFrame(rows, "y double, a double")
    got = dict(logistic_train(df, ["a"], rounds=5))
    assert got["a"] > 0
    # the trained model separates the two blobs
    wb, wa = got["bias"] / 1e6, got["a"] / 1e6
    p_hi = 1 / (1 + math.exp(-(wb + wa * 0.9)))
    p_lo = 1 / (1 + math.exp(-(wb + wa * 0.1)))
    assert p_hi > 0.5 > p_lo


def test_all_one_label_pushes_bias_up(spark):
    from spikex_spark.operators.linkage import logistic_train

    df = spark.createDataFrame([(1.0, 0.5)] * 6, "y double, a double")
    got = dict(logistic_train(df, ["a"], rounds=3))
    assert got["bias"] > 0 and got["a"] > 0


def test_score_matches_manual_sigmoid(spark):
    import math

    from spikex_spark.operators.linkage import (logistic_score,
                                                logistic_train)

    rows = [(1, 2, 1.0, 0.9), (3, 4, 0.0, 0.2), (5, 6, 1.0, 0.8),
            (7, 8, 0.0, 0.3)]
    df = spark.createDataFrame(rows,
                               "id_a bigint, id_b bigint, y double, a double")
    wts = logistic_train(df, ["a"], rounds=3)
    got = {(r["id_a"], r["id_b"]): r
           for r in logistic_score(df, wts, ["a"]).collect()}
    w = dict(wts)
    for ia, ib, _, a in rows:
        am = math.floor(a * 1e6 + 0.5)
        z = w["bias"] / 1e6 + w["a"] / 1e6 * (am / 1e6)
        pm = math.floor(1.0 / (1.0 + math.exp(-z)) * 1e6 + 0.5)
        assert got[(ia, ib)]["p_micro"] == pm
        assert got[(ia, ib)]["p_match"] == pm / 1e6
