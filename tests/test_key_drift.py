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


def test_url_path_templates_collapse(spark):
    from spikex_spark.operators.urls import url_path_templates
    urls = ["https://s.com/p/123?r=a", "https://s.com/p/456?r=b",
            "https://s.com/p/123?r=a#frag",
            "https://s.com/sess/aabbccdd1122/x",
            "https://s.com/static/about"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = {r["template"]: r for r in
           url_path_templates(df, "url").collect()}
    # product pages collapse to one template (fragment stripped,
    # query value masked, id digits collapsed)
    assert out["https://s.com/p/{d}?r={v}"]["n_urls"] == 3
    assert out["https://s.com/p/{d}?r={v}"]["example_url"] \
        == "https://s.com/p/123?r=a"
    # 12-char hex run -> {h}; static path untouched
    assert "https://s.com/sess/{h}/x" in out
    assert "https://s.com/static/about" in out
