"""KMV distinct-count and count-min sketch operators."""

from __future__ import annotations

import hashlib

from spikex_spark.operators import sketch as SK


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_kmv_exact_regime_small_groups(spark):
    rows = [("en", f"word{i % 7}") for i in range(50)] + \
           [("de", f"wort{i % 3}") for i in range(10)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {r["grp"]: r for r in SK.kmv_distinct(df, "g", "v", k=256).collect()}
    # under k distinct values the sketch IS the distinct set
    assert got["en"]["n_hashes"] == 7 and got["en"]["est_distinct"] == 7.0
    assert got["de"]["n_hashes"] == 3 and got["de"]["est_distinct"] == 3.0
    assert got["en"]["true_distinct"] == 7
    # theta = max of the k kept hashes = max hash overall here
    assert got["de"]["theta_hash"] == max(_h60(f"wort{i}") for i in range(3))


def test_kmv_estimate_regime_reasonable(spark):
    df = spark.createDataFrame(
        [("x", f"v{i}") for i in range(5000)], ["g", "v"])
    row = SK.kmv_distinct(df, "g", "v", k=64).collect()[0]
    assert row["n_hashes"] == 64
    # KMV with k=64 has ~12.5% relative stddev; 3 sigma bound
    assert abs(row["est_distinct"] - 5000) / 5000 < 0.4
    expected = round(63.0 * float(1 << 60) / float(row["theta_hash"]), 4)
    assert row["est_distinct"] == expected


def test_cms_never_underestimates_and_is_tight_when_sparse(spark):
    texts = [(0, "alpha alpha alpha beta beta gamma")] + \
            [(i, f"tok{i}a tok{i}b") for i in range(1, 30)]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {r["token"]: r for r in
           SK.cms_heavy_hitters(df, "text", top=5, depth=4,
                                width=4096).collect()}
    assert len(got) == 5
    for tok, r in got.items():
        assert r["est"] >= r["true_count"]          # CMS one-sided error
    # 61 tokens in a 4x4096 table: collisions across all 4 rows are
    # essentially impossible -> estimates are exact
    assert got["alpha"]["est"] == got["alpha"]["true_count"] == 3
    assert got["beta"]["true_count"] == 2


def test_cms_build_shape_bounded(spark):
    df = spark.createDataFrame([(f"v{i}",) for i in range(500)], ["v"])
    sk = SK.cms_build(df, "v", depth=4, width=64).collect()
    assert len(sk) <= 4 * 64
    assert sum(r["c"] for r in sk) == 4 * 500      # every value hits each row


def test_kmv_union_equals_single_pass(spark):
    df1 = spark.createDataFrame([("x", f"v{i}") for i in range(800)],
                                ["g", "v"])
    df2 = spark.createDataFrame([("x", f"v{i}") for i in range(400, 1200)],
                                ["g", "v"])
    both = df1.union(df2)
    single = SK.kmv_distinct(both, "g", "v", k=64).collect()[0]
    merged = SK.kmv_union(SK.kmv_hashes(df1, "g", "v", k=64),
                          SK.kmv_hashes(df2, "g", "v", k=64),
                          k=64).collect()[0]
    assert merged["theta_hash"] == single["theta_hash"]
    assert merged["est_distinct"] == single["est_distinct"]
    assert merged["n_hashes"] == 64


def test_cms_merge_equals_single_pass(spark):
    d1 = spark.createDataFrame([(f"t{i % 5}",) for i in range(50)], ["v"])
    d2 = spark.createDataFrame([(f"t{i % 3}",) for i in range(30)], ["v"])
    single = {(r["row"], r["col"]): r["c"] for r in
              SK.cms_build(d1.union(d2), "v", depth=3, width=32).collect()}
    merged = {(r["row"], r["col"]): r["c"] for r in
              SK.cms_merge(SK.cms_build(d1, "v", depth=3, width=32),
                           SK.cms_build(d2, "v", depth=3, width=32)).collect()}
    assert merged == single


def test_kmv_bigrams_survives_tokenless_docs(spark):
    # empty / punctuation-only / one-token docs must not kill the stage
    # (slice(w, 1, -1) is a hard Spark error without the size guard)
    df = spark.createDataFrame(
        [("en", "alpha beta gamma"), ("en", "!!! ..."), ("en", ""),
         ("en", "solo"), ("de", "???")],
        ["lang", "text"])
    got = {r["grp"]: r for r in
           SK.kmv_distinct_bigrams(df, "lang", "text", k=16).collect()}
    assert got["en"]["true_distinct"] == 2     # alpha-beta, beta-gamma
    assert "de" not in got                     # no bigram-bearing docs
