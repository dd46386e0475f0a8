"""Span window operators O1-O5 vs hand-computed goldens."""

from __future__ import annotations

from spikex_spark.operators import windows as W


def test_drop_contained(spark):
    spans = spark.createDataFrame(
        [("d", 0, 10), ("d", 2, 5), ("d", 8, 15), ("d", 0, 10),
         ("e", 1, 3)],
        ["doc", "start", "end"],
    )
    got = sorted((r["doc"], r["start"], r["end"])
                 for r in W.drop_contained(spans).collect())
    # (2,5) contained in (0,10); duplicate (0,10) dropped; (8,15) overlaps
    # but extends beyond -> kept
    assert got == [("d", 0, 10), ("d", 8, 15), ("e", 1, 3)]


def test_greedy_nonoverlap(spark):
    spans = spark.createDataFrame(
        [("d", 0, 4), ("d", 2, 6), ("d", 4, 8), ("d", 9, 12)],
        ["doc", "start", "end"],
    )
    got = sorted((r["start"], r["end"]) for r in W.greedy_nonoverlap(spans).collect())
    # keep (0,4); (2,6) overlaps kept -> drop; (4,8) starts at prev end -> keep
    assert got == [(0, 4), (4, 8), (9, 12)]


def test_leftmost_longest(spark):
    spans = spark.createDataFrame(
        [("d", 0, 5), ("d", 2, 5), ("d", 3, 7)],
        ["doc", "start", "end"],
    )
    got = sorted((r["start"], r["end"]) for r in W.leftmost_longest(spans).collect())
    assert got == [(0, 5), (3, 7)]  # same end=5 -> keep earliest start


def test_top_k_per_key(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("b", 4, 5.0)],
        ["k", "id", "v"],
    )
    got = sorted((r["k"], r["id"]) for r in
                 W.top_k_per_key(df, "k", "v", 2, tiebreak_col="id").collect())
    assert got == [("a", 2), ("a", 3), ("b", 4)]


def test_sort_spans_order(spark):
    spans = spark.createDataFrame(
        [("d", 5, 8), ("d", 0, 3), ("d", 0, 6)],
        ["doc", "start", "end"],
    )
    got = [(r["start"], r["end"]) for r in
           W.sort_spans(spans).orderBy("span_order").collect()]
    assert got == [(0, 6), (0, 3), (5, 8)]  # start asc, length desc
