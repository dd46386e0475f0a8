"""Byte-identical extraction: Spark mapInPandas vs pure Python vs native."""

from __future__ import annotations

from spikex_spark import synth
from spikex_spark.extract import extract_native, extract_stage
from spikex_spark.textutils import extract_text


def test_extract_stage_byte_identical(spark, pages_df):
    out = {
        r["url"]: r["extracted"]
        for r in extract_stage(pages_df.select("url", "text")).collect()
    }
    for row in synth.gen_pages(120):
        assert out[row["url"]] == extract_text(row["text"]), row["url"]


def test_native_path_agrees_with_arrow_path(spark, pages_df):
    arrow = extract_stage(pages_df.select("url", "text"))
    native = extract_native(pages_df.select("url", "text"))
    a = {r["url"]: r["extracted"] for r in arrow.collect()}
    n = {r["url"]: r["extracted"] for r in native.collect()}
    assert a == n


def test_unicode_and_nulls(spark):
    rows = [("u1", "héllo wörld"), ("u2", None), ("u3", "tab\there")]
    df = spark.createDataFrame(rows, ["url", "text"])
    out = {r["url"]: r["extracted"] for r in extract_stage(df).collect()}
    assert out["u1"] == "héllo_wörld"
    assert out["u2"] is None
    assert out["u3"] == "tab_here"
