"""Deequ-style column profiling and uniqueness constraint checks."""

from __future__ import annotations

from spikex_spark.operators.profiling import profile_columns, uniqueness_check


def test_profile_columns_nulls_distinct_mean(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b")], "x long, s string")
    rows = {r["column"]: r for r in profile_columns(df).collect()}
    x = rows["x"]
    assert (x["n_rows"], x["n_nonnull"], x["n_distinct"]) == (4, 4, 4)
    assert x["completeness"] == 1.0
    assert (x["min_value"], x["max_value"]) == ("1", "4")
    assert x["mean"] == 2.5
    s = rows["s"]
    assert (s["n_nonnull"], s["n_distinct"]) == (3, 2)
    assert s["completeness"] == 0.75
    assert (s["min_value"], s["max_value"]) == ("a", "b")
    assert s["mean"] is None


def test_profile_columns_subset_and_order(spark):
    df = spark.createDataFrame([(1, "a")], "x long, s string")
    out = profile_columns(df, ["s"]).collect()
    assert [r["column"] for r in out] == ["s"]


def test_uniqueness_check(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c"), (5, "c"), (6, "c")],
        "id long, k string")
    u = uniqueness_check(df, ["id"]).collect()[0]
    assert (u["n_rows"], u["n_keys"], u["n_dup_rows"], u["unique"]) == \
        (6, 6, 0, True)
    d = uniqueness_check(df, ["k"]).collect()[0]
    assert (d["n_rows"], d["n_keys"], d["n_dup_rows"], d["unique"]) == \
        (6, 3, 5, False)


def test_key_skew_top_and_salt(spark):
    from spikex_spark.operators.profiling import key_skew
    rows = [(i, "hot") for i in range(10)] + [(100, "a"), (101, "b")]
    df = spark.createDataFrame(rows, "id long, k string")
    out = key_skew(df, ["k"], top_k=2, target_rows=4).collect()
    assert [(r["key"], r["cnt"], r["salt_factor"]) for r in out] == \
        [("hot", 10, 3), ("a", 1, 1)]
    assert out[0]["share"] == round(10 / 12, 6)
    assert out[0]["n_keys"] == 3 and out[0]["total"] == 12
