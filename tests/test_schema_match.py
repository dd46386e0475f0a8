from __future__ import annotations

import pytest

from spikex_spark.operators.profiling import schema_match

A_ROWS = [
    ("https://x.com/1", "en", "Alpha Page"),
    ("https://x.com/2", "de", "Beta Page"),
    ("https://x.com/3", "en", "Gamma Page"),
    ("https://x.com/4", "fr", "Delta Page"),
]
B_ROWS = [
    ("Alpha Page", "https://x.com/1", "en"),
    ("Beta Page", "https://x.com/2", "de"),
    ("Echo Page", "https://y.com/9", "es"),
]


@pytest.fixture(scope="module")
def ab(spark):
    a = spark.createDataFrame(A_ROWS, "url string, lang string, title string")
    b = spark.createDataFrame(B_ROWS, "name string, page_url string, language string")
    return a, b


def test_alignment_ranks_counterparts_first(spark, ab):
    a, b = ab
    rows = schema_match(a, b, ["url", "lang", "title"],
                        ["name", "page_url", "language"]).collect()
    top = {r["col_a"]: r["col_b"] for r in rows if r["rank"] == 1}
    assert top == {"url": "page_url", "lang": "language", "title": "name"}
    grid = {(r["col_a"], r["col_b"]): r for r in rows}
    assert len(grid) == 9  # full pair grid present
    # exact regime: jaccard of url/page_url value sets is 2/5
    r = grid[("url", "page_url")]
    assert (r["n_common"], r["n_union_sample"]) == (2, 5)
    assert r["est_jaccard"] == 0.4
    # disjoint columns score zero
    assert grid[("url", "name")]["est_jaccard"] == 0.0


def test_nulls_and_empties_carry_no_evidence(spark):
    a = spark.createDataFrame(
        [("x", None), ("y", ""), ("z", "shared")], "p string, q string")
    b = spark.createDataFrame(
        [("shared",), (None,)], "r string")
    rows = schema_match(a, b, ["p", "q"], ["r"]).collect()
    grid = {(r["col_a"], r["col_b"]): r for r in rows}
    assert grid[("q", "r")]["n_common"] == 1
    assert grid[("q", "r")]["n_union_sample"] == 1  # empties/nulls gone
    assert grid[("p", "r")]["n_common"] == 0
