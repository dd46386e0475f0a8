"""Round-6 optimization equivalence pins.

Each optimization this round replaced an operator's internals with a faster
physical shape while claiming VALUE-identical output; these tests pin each
claim directly (the DuckDB oracle gate pins them end-to-end too).
"""

from __future__ import annotations

import random
import string

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spikex_spark.textutils import jaro_winkler as jw_py


def _rand_pairs(n: int, seed: int = 7) -> list[tuple]:
    rnd = random.Random(seed)
    alph = string.ascii_lowercase + "0123456789 "
    out = []
    for _ in range(n):
        la, lb = rnd.randint(0, 64), rnd.randint(0, 64)
        a = "".join(rnd.choice(alph) for _ in range(la))
        b = "".join(rnd.choice(alph) for _ in range(lb))
        if rnd.random() < 0.4:  # shared-prefix near-dups hit the JW boost
            cut = rnd.randint(0, min(la, lb))
            b = a[:cut] + b[cut:]
        out.append((a, b))
    out += [("", ""), ("a", ""), ("", "b"), ("abc", "abc"),
            ("martha", "marhta"), ("dixon", "dicksonx"),
            ("a" * 64, "a" * 63 + "b"), (None, "x"), ("x", None),
            (None, None)]
    return out


def test_jw_duckdb_batch_matches_python_exactly():
    """The vectorized (DuckDB) JW batch evaluator must be bit-identical to
    the pure-Python reference on adversarial pairs, including NULLs —
    byte-exact equality, not approx."""
    from spikex_spark.operators.scoring import _jw_batch

    pairs = _rand_pairs(2000)
    a = pd.Series([p[0] for p in pairs], dtype=object)
    b = pd.Series([p[1] for p in pairs], dtype=object)
    got = _jw_batch(a, b)
    for (x, y), g in zip(pairs, got):
        if x is None or y is None:
            assert pd.isna(g)
        else:
            assert g == jw_py(x, y), (x, y, g, jw_py(x, y))


def test_jw_python_fallback_matches_duckdb_path(monkeypatch):
    """With duckdb unavailable the batch evaluator falls back to the pure
    loop and produces the same values."""
    import spikex_spark.operators.scoring as S

    pairs = _rand_pairs(200, seed=11)
    a = pd.Series([p[0] for p in pairs], dtype=object)
    b = pd.Series([p[1] for p in pairs], dtype=object)
    fast = S._jw_batch(a, b)
    monkeypatch.setattr(S, "_JW_DUCK_CON", False)
    slow = S._jw_batch(a, b)
    assert list(pd.isna(fast)) == list(pd.isna(slow))
    assert [v for v in fast if not pd.isna(v)] == \
        [v for v in slow if not pd.isna(v)]


def test_minhash_near_dups_matches_per_shingle_join_form(spark):
    """The packed-array verification must reproduce the old per-shingle
    join + groupBy verification row-for-row (same pairs, same jaccard)."""
    from spikex_spark.operators import blocking as B
    from spikex_spark.operators.dedup import minhash_near_dups

    rnd = random.Random(3)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta"]
    rows = []
    base = " ".join(rnd.choice(words) for _ in range(30))
    for i in range(60):
        if i % 3 == 0:  # near-dup family: mutate a couple of words
            toks = base.split()
            for _ in range(rnd.randint(0, 2)):
                toks[rnd.randrange(len(toks))] = rnd.choice(words)
            rows.append((i, " ".join(toks)))
        else:
            rows.append((i, " ".join(rnd.choice(words)
                                     for _ in range(rnd.randint(5, 30)))))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in minhash_near_dups(docs, "doc_id", "text",
                                      min_jaccard=0.5).collect()}

    # reference: the pre-round-6 per-shingle-join implementation
    sh = B.shingle_df(docs, "doc_id", "text", k=5)
    sig = B.minhash_signatures(sh, num_hashes=16)
    buckets = B.cap_blocks(B.lsh_buckets(sig, 4, 4),
                           key_col=["band", "bucket"], id_col="id", cap=1000)
    cands = (
        buckets.select("band", "bucket", F.col("id").alias("id_a"))
        .join(buckets.select("band", "bucket", F.col("id").alias("id_b")),
              ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct()
    )
    counts = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    inter = (
        cands.join(sh.withColumnsRenamed({"id": "id_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "shingle": "shingle_b"}),
              "id_b")
        .where(F.col("shingle") == F.col("shingle_b"))
        .groupBy("id_a", "id_b").agg(F.count("*").alias("inter"))
    )
    want = {(r["id_a"], r["id_b"]): r["jaccard"] for r in (
        inter.join(counts.withColumnsRenamed({"id": "id_a", "n_sh": "na"}),
                   "id_a")
        .join(counts.withColumnsRenamed({"id": "id_b", "n_sh": "nb"}), "id_b")
        .withColumn("jaccard", F.round(
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"), 6))
        .where(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")).collect()}
    assert got == want and len(got) > 0


def test_packed_shingle_encoding_is_injective(spark):
    """conv(hex(s),16,10) over the normalized shingle alphabet must be
    collision-free (it is an exact base-256 byte encode, < 2^56 for ≤7
    bytes) — checked over every shingle of a real-ish corpus."""
    from spikex_spark.operators import blocking as B

    rnd = random.Random(5)
    alph = string.ascii_lowercase + "0123456789"
    rows = [(i, " ".join("".join(rnd.choice(alph)
                                 for _ in range(rnd.randint(1, 8)))
                         for _ in range(rnd.randint(1, 20))))
            for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = B.shingle_df(docs, "doc_id", "text", k=5).select("shingle").distinct()
    packed = sh.select(
        "shingle", F.conv(F.hex("shingle"), 16, 10).cast("long").alias("p"))
    n = packed.count()
    assert packed.select("p").distinct().count() == n
    assert packed.where(F.col("p").isNull()).count() == 0


def test_simhash_filter_before_distinct_matches(spark):
    """simhash_near_dups (filter→distinct) equals the distinct→filter
    form."""
    from spikex_spark.operators.dedup import (
        _HASH_BITS,
        simhash,
        simhash_near_dups,
    )

    rnd = random.Random(9)
    words = [f"w{i}" for i in range(40)]
    base = " ".join(rnd.choice(words) for _ in range(20))
    rows = []
    for i in range(80):
        if i % 2 == 0:  # near-dup family: drop/replace at most one word
            toks = base.split()
            if rnd.random() < 0.7:
                toks[rnd.randrange(len(toks))] = rnd.choice(words)
            rows.append((i, " ".join(toks)))
        else:
            rows.append((i, " ".join(rnd.choice(words)
                                     for _ in range(rnd.randint(3, 25)))))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r["id_a"], r["id_b"], r["hamming"])
           for r in simhash_near_dups(docs, "doc_id", "text").collect()}

    sh = simhash(docs, "doc_id", "text")
    width = _HASH_BITS // 4
    banded = sh.select("id", "simhash", F.explode(F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.shiftright(F.col("simhash"), b * width)
                 .bitwiseAND(F.lit((1 << width) - 1)).alias("bval"))
        for b in range(4)])).alias("bb")).select(
        "id", "simhash", F.col("bb.band").alias("band"),
        F.col("bb.bval").alias("bval"))
    left = banded.select("band", "bval", F.col("id").alias("id_a"),
                         F.col("simhash").alias("sh_a"))
    right = banded.select("band", "bval", F.col("id").alias("id_b"),
                          F.col("simhash").alias("sh_b"))
    want = {(r["id_a"], r["id_b"], r["hamming"]) for r in (
        left.join(right, ["band", "bval"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b").distinct()
        .withColumn("hamming",
                    F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")).collect()}
    assert got == want and len(got) > 0


def test_quality_translate_punct_equals_regex_form(spark):
    """length(translate(text, [a-zA-Z0-9 ], '')) ≡ the old
    len - len(regexp_replace) punct count, incl. unicode + NULL."""
    texts = ["hello, world!", "", None, "ünïcödé — em-dash…",
             "tabs\tand\nnewlines", "ALLCAPS 123 ok", "!!!???", "a" * 500]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    import string as _s
    keepc = _s.ascii_letters + _s.digits + " "
    cmp = docs.select(
        (F.length("text")
         - F.length(F.regexp_replace("text", r"[^a-zA-Z0-9 ]", "")))
        .alias("a"),
        F.length(F.translate("text", keepc, "")).alias("b"),
    ).collect()
    for r in cmp:
        assert r["a"] == r["b"]


def test_quality_score_values_unchanged_reference(spark):
    """quality_score over a mixed corpus matches a row-by-row Python
    recompute of the documented formula."""
    import math

    from spikex_spark.operators.textstats import STOPWORDS, quality_score
    texts = ["The quick brown fox, with as many of the stopwords as is!",
             "short", "x" * 150, "no stop words here at all 12345",
             "punct!!! ??? ,,, ;;;", None, ""]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    rows = {r["id"]: r for r in
            quality_score(docs, "doc_id", "text").collect()}
    import re
    en = set(STOPWORDS["en"])
    for i, t in enumerate(texts):
        r = rows[i]
        if t is None:
            assert r["n_chars"] is None
            continue
        toks = [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
        n_chars = len(t)
        n_punct = sum(1 for c in t
                      if not (c.isascii() and (c.isalnum() or c == " ")))
        pr = n_punct / n_chars if n_chars else 0.0
        sw = sum(1 for w in toks if w in en)
        swr = sw / len(toks) if toks else 0.0
        q = round(0.4 * (1.0 if 100 <= n_chars <= 20000 else 0.0)
                  + 0.3 * (1 - pr) + 0.3 * min(swr * 5, 1.0), 6)
        assert r["n_chars"] == n_chars and r["n_tokens"] == len(toks)
        assert r["punct_ratio"] == pytest.approx(round(pr, 6), abs=1e-9)
        assert r["quality"] == pytest.approx(q, abs=1e-9)


def test_capped_pair_explode_matches_self_join(spark):
    """The fused cap+pair enumeration equals cap_blocks + key self-join."""
    from spikex_spark.operators.blocking import cap_blocks, capped_pair_explode

    rnd = random.Random(13)
    rows = []
    for b in range(40):
        for m in rnd.sample(range(500), rnd.randint(1, 15)):
            rows.append((b % 4, f"bk{b}", m))
    df = spark.createDataFrame(rows, ["band", "bucket", "id"])
    got = {(r["id_a"], r["id_b"]) for r in
           capped_pair_explode(df, ["band", "bucket"], "id", cap=6).collect()}
    capped = cap_blocks(df, ["band", "bucket"], "id", cap=6)
    ref = (
        capped.select("band", "bucket", F.col("id").alias("id_a"))
        .join(capped.select("band", "bucket", F.col("id").alias("id_b")),
              ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct()
    )
    want = {(r["id_a"], r["id_b"]) for r in ref.collect()}
    assert got == want and len(got) > 0


def test_simhash_first_band_emission_matches_distinct(spark):
    """First-matching-band emission (no trailing distinct) emits each
    qualifying pair EXACTLY once — multiset equals the old
    distinct-deduped output, including under a hamming budget that makes
    pairs match in several bands."""
    from spikex_spark.operators.dedup import simhash_near_dups

    rnd = random.Random(31)
    words = [f"w{i}" for i in range(30)]
    base = " ".join(rnd.choice(words) for _ in range(18))
    rows = []
    for i in range(120):
        toks = base.split()
        if i % 3 == 0 and rnd.random() < 0.8:  # heavy near-dup families:
            toks[rnd.randrange(len(toks))] = rnd.choice(words)
            rows.append((i, " ".join(toks)))
        elif i % 3 == 1:
            rows.append((i, base))             # exact dups → 0 hamming,
        else:                                  # match in ALL 4 bands
            rows.append((i, " ".join(rnd.choice(words)
                                     for _ in range(rnd.randint(3, 22)))))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = simhash_near_dups(docs, "doc_id", "text").collect()
    # exactly-once: no duplicate (id_a, id_b) rows without any distinct
    pairs = [(r["id_a"], r["id_b"]) for r in out]
    assert len(pairs) == len(set(pairs)) and len(pairs) > 0
    # and the trailing distinct is actually gone from the plan: the only
    # aggregates left are the simhash signature groupBy's own
    # (partial+final) — the pair-dedup aggregate above the join vanished
    from spikex_spark.operators.dedup import simhash
    plan = simhash_near_dups(docs, "doc_id", "text")._jdf.queryExecution() \
        .executedPlan().toString()
    sig_plan = simhash(docs, "doc_id", "text")._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("HashAggregate") == 2 * sig_plan.count("HashAggregate")


def test_corpus_stats_local_parity(spark):
    """corpus_stats_local ≡ corpus_stats row-for-row, incl. the Java-\\s
    (ASCII-only) tokenizer split, hapax pruning, dotted-word filter, and
    the deterministic top-N bound."""
    from spikex_spark.pipes import nbmodel as NB
    texts = ["The cat sat. The cat ran.", "dogs dogs Dogs  bark.\tbark",
             "x.\ny. x. mixed CASE case case", "", "one-token",
             "trailing.  trailing. trailing"]
    lw_d, na_d = NB.corpus_stats_local(texts, min_count=2, max_words=4)
    lw_s, na_s = NB.corpus_stats(
        spark.createDataFrame([(t,) for t in texts], ["text"]),
        min_count=2, max_words=4)
    assert lw_d == {r["word"]: r["cnt"] for r in lw_s.collect()}
    assert na_d == {r["word"]: r["cnt"] for r in na_s.collect()}


def test_nb_features_map_literal_parity(spark):
    """nb_features over dict stats (literal-map lookup) ≡ the broadcast
    left-join form, including absent keys → NULL counts and empty stats."""
    from spikex_spark.pipes import nbmodel as NB
    frags = spark.createDataFrame(
        [(1, "Dr.", "Smith", 1), (2, "etc.", "went", 0),
         (3, "co-op.", "re-run", 1), (4, "A.", "B", 0)],
        ["frag_id", "w1", "w2", "label"])
    lw = {"smith": 3, "went": 9}
    na = {"Dr": 2, "co-op": 7}
    lw_df = spark.createDataFrame(list(lw.items()), ["word", "cnt"])
    na_df = spark.createDataFrame(list(na.items()), ["word", "cnt"])
    a = sorted((r["label"], r["feat"])
               for r in NB.nb_features(frags, lw, na).collect())
    b = sorted((r["label"], r["feat"])
               for r in NB.nb_features(frags, lw_df, na_df).collect())
    assert a == b and len(a) > 0
    # empty dict stats == empty DataFrame stats
    e_df = spark.createDataFrame([], "word string, cnt long")
    a2 = sorted((r["label"], r["feat"])
                for r in NB.nb_features(frags, {}, {}).collect())
    b2 = sorted((r["label"], r["feat"])
                for r in NB.nb_features(frags, e_df, e_df).collect())
    assert a2 == b2


def test_nb_train_driver_tail_parity(spark):
    """nb_train(driver_max=...) ≡ the distributed tail after round(·, 6)
    (the precision every consumer applies), and falls back above the
    bound."""
    from pyspark.sql import functions as F
    from spikex_spark.pipes import nbmodel as NB
    frags = spark.createDataFrame(
        [(i, f"w{i % 7}.", f"V{i % 5}", i % 2) for i in range(40)],
        ["frag_id", "w1", "w2", "label"])
    feats = NB.nb_features(frags, {}, {})
    a = {(r["label"], r["feat"]): round(r["prob"], 6)
         for r in NB.nb_train(feats).collect()}
    b = {(r["label"], r["feat"]): round(r["prob"], 6)
         for r in NB.nb_train(feats, driver_max=1_000_000).collect()}
    assert a == b and len(a) > 2
    # above the bound: falls back to the distributed tail, same values
    c = {(r["label"], r["feat"]): round(r["prob"], 6)
         for r in NB.nb_train(feats, driver_max=2).collect()}
    assert a == c


def test_capped_pair_explode_carry_matches(spark):
    """carry/pair_filter path ≡ plain capped_pair_explode + per-side count
    joins + the same filter applied after — including cap interaction and
    multi-bucket dedup."""
    from spikex_spark.operators import blocking as B

    rnd = random.Random(17)
    rows = [(f"k{rnd.randrange(6)}", i, rnd.randint(1, 50))
            for i in range(200)]
    blocks = spark.createDataFrame(rows, ["block_key", "id", "n"])
    flt = (lambda p: F.least(p["n_a"], p["n_b"]).cast("double")
           >= F.lit(0.5) * F.greatest(p["n_a"], p["n_b"]))
    got = sorted(tuple(r) for r in B.capped_pair_explode(
        blocks, key_col="block_key", id_col="id", cap=7,
        carry=["n"], pair_filter=flt).collect())

    plain = B.capped_pair_explode(
        blocks.select("block_key", "id"), key_col="block_key",
        id_col="id", cap=7)
    nn = blocks.select("id", "n").distinct()
    want = sorted(tuple(r) for r in (
        plain.join(nn.select(F.col("id").alias("id_a"), F.col("n").alias("n_a")), "id_a")
        .join(nn.select(F.col("id").alias("id_b"), F.col("n").alias("n_b")), "id_b")
        .where(F.least("n_a", "n_b").cast("double")
               >= F.lit(0.5) * F.greatest("n_a", "n_b"))
        .select("id_a", "id_b", "n_a", "n_b")).collect())
    assert got == want and len(got) > 0
    # carry without filter, and the no-carry path, still agree on pairs
    got2 = sorted((r["id_a"], r["id_b"]) for r in B.capped_pair_explode(
        blocks, key_col="block_key", id_col="id", cap=7,
        carry=["n"]).collect())
    want2 = sorted((r["id_a"], r["id_b"]) for r in plain.collect())
    assert got2 == want2
