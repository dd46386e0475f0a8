"""pair_metrics_by: per-slice linkage precision/recall/F1."""
from __future__ import annotations

import pytest


def _run(spark, pred, ref, slices):
    from spikex_spark.operators.evaluation import pair_metrics_by

    p = spark.createDataFrame(pred, "id_a bigint, id_b bigint")
    r = spark.createDataFrame(ref, "id_a bigint, id_b bigint")
    s = spark.createDataFrame(slices, "id bigint, slice string")
    out = pair_metrics_by(p, r, s).collect()
    return {row["slice"]: row for row in out}


def test_per_slice_counts(spark):
    # en: tp (1,2); fp (1,3). de: fn (10,11)
    pred = [(1, 2), (1, 3)]
    ref = [(1, 2), (10, 11)]
    slices = [(1, "en"), (2, "en"), (3, "en"), (10, "de"), (11, "de")]
    got = _run(spark, pred, ref, slices)
    en = got["en"]
    assert (en["tp"], en["fp"], en["fn"]) == (1, 1, 0)
    assert en["precision"] == pytest.approx(0.5)
    assert en["recall"] == 1.0
    assert en["f1"] == pytest.approx(2 / 3, abs=1e-6)
    de = got["de"]
    assert (de["tp"], de["fp"], de["fn"]) == (0, 0, 1)
    assert de["precision"] == 0.0 and de["recall"] == 0.0 and de["f1"] == 0.0


def test_slice_of_smaller_id_and_unknown(spark):
    pred = [(5, 9)]      # 5 is 'fr', 9 is 'en' -> attributed to fr
    ref = [(5, 9), (100, 101)]  # 100 unmapped -> unknown
    slices = [(5, "fr"), (9, "en")]
    got = _run(spark, pred, ref, slices)
    assert got["fr"]["tp"] == 1
    assert got["unknown"]["fn"] == 1
    assert "en" not in got


def test_orientation_and_duplicates_canonicalized(spark):
    pred = [(2, 1), (1, 2), (1, 1)]
    ref = [(1, 2)]
    got = _run(spark, pred, ref, [(1, "en"), (2, "en")])
    assert got["en"]["tp"] == 1 and got["en"]["fp"] == 0


def test_pair_metrics_jackknife_counts_and_loo(spark):
    from spikex_spark.operators.evaluation import pair_metrics_jackknife
    # gold = {(1,2),(3,4),(5,6)}; pred misses (5,6), adds (7,8)
    gold = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], ["id_a", "id_b"])
    pred = spark.createDataFrame(
        [(2, 1), (3, 4), (7, 8)], ["id_a", "id_b"])  # orientation-free
    rows = pair_metrics_jackknife(pred, gold, buckets=2).collect()
    # global tp=2 fp=1 fn=1; each row excludes its fold's pairs
    by = {r["bucket"]: r for r in rows}
    total_excluded = sum(r["n_excluded"] for r in rows)
    assert total_excluded == 4                      # |union of pairs|
    for b, r in by.items():
        assert r["tp"] + r["fp"] >= 0
        # leave-one-out counts complement to the global counts
        assert (2 - r["tp"]) + (1 - r["fp"]) + (1 - r["fn"]) \
            == r["n_excluded"]


def test_pair_metrics_jackknife_perfect_pred_all_folds_f1_1(spark):
    from spikex_spark.operators.evaluation import pair_metrics_jackknife
    pairs = [(i, i + 100) for i in range(40)]
    gold = spark.createDataFrame(pairs, ["id_a", "id_b"])
    rows = pair_metrics_jackknife(gold, gold, buckets=10).collect()
    assert len(rows) >= 2
    assert all(r["f1"] == 1.0 for r in rows)
    assert all(r["fp"] == 0 and r["fn"] == 0 for r in rows)
