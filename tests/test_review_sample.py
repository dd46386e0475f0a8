"""review_sample: deterministic clerical-review batch selection."""
from __future__ import annotations

import hashlib

import pytest


def _run(spark, rows, **kw):
    from spikex_spark.operators.erqc import review_sample

    df = spark.createDataFrame(rows, "id_a bigint, id_b bigint, score double")
    return review_sample(df, **kw).collect()


def test_band_filter_and_strata(spark):
    rows = [(1, 2, 0.65), (3, 4, 0.70), (5, 6, 0.74), (7, 8, 0.76),
            (9, 10, 0.81), (11, 12, 0.89), (13, 14, 0.90), (15, 16, 0.95)]
    got = _run(spark, rows, lo=0.70, hi=0.90, strata=4, k=10)
    by_pair = {(r["id_a"], r["id_b"]): r["stratum"] for r in got}
    # outside [0.70, 0.90): excluded
    assert (1, 2) not in by_pair and (13, 14) not in by_pair
    assert by_pair[(3, 4)] == 0 and by_pair[(5, 6)] == 0
    assert by_pair[(7, 8)] == 1
    assert by_pair[(9, 10)] == 2
    assert by_pair[(11, 12)] == 3


def test_k_per_stratum_in_md5_order(spark):
    rows = [(i, i + 100, 0.72) for i in range(20)]
    got = _run(spark, rows, lo=0.70, hi=0.90, strata=4, k=5)
    assert len(got) == 5
    assert sorted(r["sample_rank"] for r in got) == [1, 2, 3, 4, 5]
    # expected order: md5("a:b") ascending
    exp = sorted(range(20),
                 key=lambda i: hashlib.md5(f"{i}:{i+100}".encode())
                 .hexdigest())[:5]
    assert {(r["id_a"]) for r in got} == set(exp)


def test_deterministic_across_runs(spark):
    rows = [(i, i * 7 + 1, 0.70 + (i % 20) * 0.01) for i in range(200)]
    a = sorted(map(tuple, _run(spark, rows, k=3)))
    b = sorted(map(tuple, _run(spark, rows, k=3)))
    assert a == b and len(a) > 0


def test_covers_every_nonempty_stratum(spark):
    rows = [(i, i + 1000, s) for i, s in enumerate(
        [0.71, 0.72, 0.76, 0.77, 0.82, 0.83, 0.86, 0.88])]
    got = _run(spark, rows, k=1)
    assert sorted(r["stratum"] for r in got) == [0, 1, 2, 3]


def test_pair_provenance_sorted_channels(spark):
    from spikex_spark.operators.erqc import pair_provenance

    a = spark.createDataFrame([(1, 2), (3, 4)], "id_a bigint, id_b bigint")
    b = spark.createDataFrame([(2, 1), (5, 6)], "id_a bigint, id_b bigint")
    got = {(r["id_a"], r["id_b"]): r
           for r in pair_provenance({"zeta": a, "alpha": b}).collect()}
    # (1,2) proposed by both (b has it reversed); arrays sorted
    assert got[(1, 2)]["channels"] == ["alpha", "zeta"]
    assert got[(1, 2)]["n_channels"] == 2
    assert got[(3, 4)]["channels"] == ["zeta"]
    assert got[(5, 6)]["channels"] == ["alpha"]


def test_pair_provenance_dedups_within_channel(spark):
    from spikex_spark.operators.erqc import pair_provenance

    a = spark.createDataFrame([(1, 2), (1, 2), (2, 1), (7, 7)],
                              "id_a bigint, id_b bigint")
    got = pair_provenance({"only": a}).collect()
    assert len(got) == 1            # self-pair dropped, dups collapsed
    assert got[0]["n_channels"] == 1
