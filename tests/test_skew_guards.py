"""Skew guards under pathological input — the 100 TB failure modes, small.

A web corpus at scale contains boilerplate pages duplicated millions of
times and hub n-grams shared by everything; each guard must turn the
quadratic blowup into a bounded candidate set WITHOUT touching well-behaved
keys. These tests feed exactly those pathologies.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spikex_spark.operators import blocking as B
from spikex_spark.operators.dedup import minhash_near_dups, ngram_jaccard_pairs


def test_minhash_bucket_cap_bounds_clone_storm(spark):
    """2000 byte-identical docs land in the SAME LSH buckets; the bucket
    cap must bound candidate pairs at cap^2/2 instead of n^2/2."""
    clones = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate page body repeated everywhere").alias("text"),
    )
    cap = 50
    pairs = minhash_near_dups(clones, "doc_id", "text", bucket_cap=cap)
    n = pairs.count()
    assert 0 < n <= cap * (cap - 1) // 2, n
    # the survivors are the deterministic first-N ids
    ids = {r["id_a"] for r in pairs.collect()} | {r["id_b"] for r in pairs.collect()}
    assert max(ids) < cap


def test_ngram_max_df_drops_hub_grams(spark):
    """Every doc shares the hub trigram; with max_df below the corpus size
    the hub gram is dropped and docs pair only through their rare grams."""
    docs = spark.createDataFrame(
        [(i, f"of the web unique{i} token{i} marker{i}") for i in range(300)]
        + [(1000, "of the web unique7 token7 marker7")],  # near-dup of doc 7
        ["doc_id", "text"],
    )
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                min_jaccard=0.3, max_df=100)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # the hub gram 'of the web' (df=301 > 100) is gone — only the genuine
    # near-dup pair (sharing rare grams) survives
    assert got == {(7, 1000)}, got


def test_cap_blocks_compound_key(spark):
    rows = [(i, b, "x") for i in range(40) for b in range(2)]
    blocks = spark.createDataFrame(rows, ["id", "band", "bucket"])
    capped = B.cap_blocks(blocks, key_col=["band", "bucket"], id_col="id",
                          cap=5)
    per_key = (
        capped.groupBy("band", "bucket").count().collect()
    )
    assert all(r["count"] == 5 for r in per_key)
    assert {r["id"] for r in capped.collect()} == set(range(5))


def test_salted_pair_join_bounds_hub_block(spark):
    """salt_blocks splits a hub blocking key across nsalt groups; the pair
    join on (key, salt) then produces ~n^2/nsalt pairs instead of n^2."""
    from spikex_spark.operators.pairs import candidate_pairs

    n, nsalt = 400, 8
    hub = spark.createDataFrame(
        [(f"d{i:04d}", "hub", f"s{i}") for i in range(n)],
        ["id", "block_key", "surface"],
    )
    salted = B.salt_blocks(hub, cap=100, nsalt=nsalt)
    pairs = candidate_pairs(salted, salted=True)
    n_pairs = pairs.count()
    full = n * (n - 1) // 2
    # deterministic hashing spreads ids across salts; the pair count must
    # drop by roughly the salt factor (allow 2x slack for imbalance)
    assert n_pairs < full / (nsalt / 2), (n_pairs, full)


def test_resumable_doc_pairs_capped_under_clone_storm(spark, tmp_path):
    """The LEDGERED documents pipeline must carry the same bucket cap as
    the one-shot path: 2000 identical docs share every LSH bucket, so an
    uncapped self-join would enumerate ~2M pairs; the capped stage is
    bounded by cap²/2 per bucket."""
    from pyspark.sql import functions as F

    from spikex_spark.lineage import resolve_documents_resumable, run_stage

    clones = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.lit("copyright notice all rights reserved terms of service "
              "privacy policy cookie settings").alias("text"),
    )
    ledger = str(tmp_path / "clone_ledger")
    out = resolve_documents_resumable(spark, clones, ledger, fingerprint="c")
    # the first `cap` ids form one cluster; the capped-out tail stays
    # singleton — the documented deterministic recall trade (identical to
    # the one-shot path's cap semantics)
    sizes = sorted(
        r["n"] for r in out.groupBy("cluster_id").agg(
            F.count("*").alias("n")).collect()
    )
    assert sizes[-1] == 1000 and sizes[:-1] == [1] * 1000
    # and the ledgered pair stage is capped, not quadratic (~2M pairs)
    pairs = run_stage(spark, ledger, "20_pairs", lambda: None,
                      input_fingerprint="c")
    n = pairs.count()
    assert n <= 1000 * 999 / 2 + 1, n


def test_blocking_cost_exact_counts(spark):
    from pyspark.sql import functions as F
    from spikex_spark.operators.metablocking import blocking_cost

    keyed = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 2 + [("c",)], "key string")
    got = {r["channel"]: r
           for r in blocking_cost({"ch": keyed}, cap=3).collect()}
    r = got["ch"]
    assert r["n_blocks"] == 3 and r["n_keyed_rows"] == 8
    assert r["pairs_uncapped"] == 10 + 1        # C(5,2)+C(2,2)
    assert r["pairs_capped"] == 3 + 1           # C(3,2)+C(2,2)
    assert r["cap_savings"] == round(1 - 4 / 11, 6)


def test_blocking_cost_singleton_only_channel(spark):
    from spikex_spark.operators.metablocking import blocking_cost

    keyed = spark.createDataFrame([("x",), ("y",)], "key string")
    r = blocking_cost({"solo": keyed}).collect()[0]
    assert r["pairs_uncapped"] == 0 and r["cap_savings"] == 0.0


def test_scaled_corpus_long_doc_mix_deterministic(spark):
    """gen_pages_scaled_df's round-5 long-document mix: deterministic,
    hash-drawn 10-500KB lengths at ~1/long_every rate, and OFF by
    default (existing callers' corpora unchanged)."""
    from pyspark.sql import functions as F

    from spikex_spark import synth

    def build():
        pages, _ = synth.gen_pages_scaled_df(
            spark, 20_000, long_every=500, partitions=8)
        return pages

    stats = build().select(
        F.count(F.when(F.length("text") >= 10_000, 1)).alias("n_long"),
        F.max(F.length("text")).alias("mx")).collect()[0]
    assert 20 <= stats["n_long"] <= 70          # ~40 expected at 1/500
    assert 10_000 <= stats["mx"] <= 510_000
    h = lambda df: df.select(F.sum(F.pmod(
        F.xxhash64("url", "text"), F.lit(10**9)))).collect()[0][0]
    assert h(build()) == h(build())             # bit-deterministic
    # default long_every=0 leaves the corpus short-doc only
    short, _ = synth.gen_pages_scaled_df(spark, 20_000, partitions=8)
    assert short.select(F.max(F.length("text"))).collect()[0][0] < 10_000
