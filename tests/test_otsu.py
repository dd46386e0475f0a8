"""otsu_threshold: unsupervised bimodal split over match scores."""
from __future__ import annotations

import pytest


def _run(spark, scores, bins=100):
    from spikex_spark.operators.erqc import otsu_threshold

    df = spark.createDataFrame([(float(s),) for s in scores],
                               "score double")
    return otsu_threshold(df, bins=bins).collect()


def test_bimodal_split_lands_between_modes(spark):
    scores = [0.05, 0.08, 0.10, 0.12, 0.07] * 8 + [0.9, 0.92, 0.95, 0.88] * 6
    rows = _run(spark, scores)
    chosen = [r for r in rows if r["chosen"]]
    assert len(chosen) == 1
    # split must separate the low mode (<=0.12) from the high (>=0.88)
    assert 12 <= chosen[0]["bin"] < 88
    assert chosen[0]["threshold"] == pytest.approx((chosen[0]["bin"] + 1) / 100)


def test_exact_otsu_against_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    scores = np.clip(np.concatenate([
        rng.normal(0.2, 0.05, 200), rng.normal(0.85, 0.04, 80)]), 0, 0.9999)
    rows = _run(spark, scores.tolist())
    chosen = next(r for r in rows if r["chosen"])

    # reference: brute-force Otsu on the same binned histogram
    bins = np.minimum((scores * 100).astype(np.int64), 99)
    hist = np.bincount(bins, minlength=100).astype(np.int64)
    n, s = hist.sum(), (hist * np.arange(100)).sum()
    best, best_k = -1.0, None
    w0 = s0 = 0
    for k in range(100):
        w0 += hist[k]; s0 += hist[k] * k
        if hist[k] == 0 or w0 == 0 or n - w0 == 0:
            continue
        d = float(s0 * n - s * w0)
        v = d * d / float(w0 * (n - w0))
        if v > best:
            best, best_k = v, k
    assert chosen["bin"] == best_k


def test_valid_splits_only(spark):
    rows = _run(spark, [0.5] * 10)     # one bin: no valid split...
    assert rows == []
    rows = _run(spark, [0.2, 0.8])
    # splits at bin 20 only (w1 at bin 80 would be 0)
    assert [r["bin"] for r in rows] == [20]
    assert rows[0]["chosen"]


def test_counts_are_cumulative(spark):
    rows = _run(spark, [0.1, 0.1, 0.3, 0.9])
    by_bin = {r["bin"]: r for r in rows}
    assert by_bin[10]["w0"] == 2 and by_bin[10]["w1"] == 2
    assert by_bin[30]["w0"] == 3 and by_bin[30]["w1"] == 1
    assert 90 not in by_bin  # w1 = 0 there
