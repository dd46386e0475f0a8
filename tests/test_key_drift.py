"""key_drift: crawl-over-crawl keyed population drift."""
from __future__ import annotations

import pytest


def _run(spark, prev, nxt, k=20):
    from spikex_spark.operators.profiling import key_drift

    p = spark.createDataFrame([(x,) for x in prev], "key string")
    n = spark.createDataFrame([(x,) for x in nxt], "key string")
    return key_drift(p, n, k=k).collect()


def test_shares_and_delta(spark):
    prev = ["a"] * 3 + ["b"] * 1
    nxt = ["a"] * 2 + ["b"] * 6
    got = {r["key"]: r for r in _run(spark, prev, nxt)}
    a, b = got["a"], got["b"]
    assert (a["c_prev"], a["c_nxt"]) == (3, 2)
    assert a["share_prev"] == pytest.approx(0.75)
    assert a["share_nxt"] == pytest.approx(0.25)
    assert a["share_delta"] == pytest.approx(-0.5)
    assert b["share_delta"] == pytest.approx(0.5)


def test_new_and_vanished_keys(spark):
    got = {r["key"]: r for r in _run(spark, ["old", "both"], ["both", "new"])}
    assert got["new"]["c_prev"] == 0 and got["new"]["share_prev"] == 0.0
    assert got["old"]["c_nxt"] == 0 and got["old"]["share_nxt"] == 0.0


def test_top_k_by_combined_count(spark):
    prev = ["x"] * 5 + ["y"] * 4 + ["z"] * 1
    nxt = ["x"] * 5 + ["y"] * 4 + ["z"] * 1
    got = _run(spark, prev, nxt, k=2)
    assert [r["key"] for r in got] == ["x", "y"]
