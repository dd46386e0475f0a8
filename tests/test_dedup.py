"""Dedup family: exact, simhash, n-gram Jaccard, MinHash near-dups."""

from __future__ import annotations

import pytest

from spikex_spark.operators import dedup as D


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),   # near dup
        (4, "completely unrelated text about spark engines"),
        (5, "Copyright notice all rights reserved terms"),
        (6, "copyright notice ALL rights reserved terms!"),   # case/punct dup
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_exact_duplicates(spark, docs):
    out = {r["id"]: r["canonical_id"] for r in
           D.exact_duplicates(docs, "doc_id", "text").collect()}
    assert out[1] == 1 and out[2] == 1          # byte-identical collapse
    assert out[3] == 3 and out[4] == 4          # others keep themselves
    assert out[5] == 5 and out[6] == 6          # case differs -> not exact


def test_simhash_stability_and_locality(spark, docs):
    sh = {r["id"]: r["simhash"] for r in D.simhash(docs, "doc_id", "text").collect()}
    assert sh[1] == sh[2]                       # identical text, same hash
    ham_13 = bin(sh[1] ^ sh[3]).count("1")
    ham_14 = bin(sh[1] ^ sh[4]).count("1")
    assert ham_13 < ham_14                      # near-dup closer than random


def test_simhash_near_dups_pairs(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in D.simhash_near_dups(docs, "doc_id", "text", max_hamming=5).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 4) not in pairs


def test_ngram_jaccard(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in D.ngram_jaccard_pairs(docs, "doc_id", "text",
                                            n=3, min_jaccard=0.3).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.3 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs
    # case/punct-normalized grams collapse 5 and 6
    assert pairs[(5, 6)] == 1.0


def test_minhash_near_dups(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in D.minhash_near_dups(docs, "doc_id", "text",
                                          min_jaccard=0.5).collect()}
    assert pairs[(1, 2)] == 1.0
    assert pairs[(5, 6)] == 1.0
    assert (1, 4) not in pairs


def test_line_dedup_docs_boilerplate_removal(spark):
    """Corpus-hot lines go, unique lines and empty-line structure stay,
    order preserved; fully-boilerplate docs come back with empty text."""
    from spikex_spark.operators.dedup import line_dedup_docs

    boiler, foot = "Subscribe now", "(c) corp"
    docs = spark.createDataFrame([
        (1, f"Unique A\n{boiler}\n\nBody 1"),
        (2, f"{boiler}\nBody 2\n{foot}"),
        (3, f"Body 3\n{foot}"),
        (4, f"{boiler}\n{foot}"),               # nothing survives
    ], "doc_id long, text string")
    out = {r["id"]: r for r in
           line_dedup_docs(docs, "doc_id", "text").collect()}
    assert out[1]["cleaned_text"] == "Unique A\n\nBody 1"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (4, 3)
    assert out[2]["cleaned_text"] == "Body 2"
    assert out[3]["cleaned_text"] == "Body 3"
    assert out[4]["cleaned_text"] == ""
    assert (out[4]["n_lines"], out[4]["n_kept"]) == (2, 0)

    # threshold: both boilerplate lines occur 3 times; min_dup=4 keeps
    # them, min_dup=3 (the assertions above run at the default 2) drops
    out4 = {r["id"]: r for r in
            line_dedup_docs(docs, "doc_id", "text", min_dup=4).collect()}
    assert foot in out4[2]["cleaned_text"]
    assert boiler in out4[1]["cleaned_text"]


def test_substring_dup_spans(spark):
    """Cross-doc and within-doc duplicated windows, overlapping-window
    merge, distant spans NOT merged, sub-window docs produce nothing."""
    docs = spark.createDataFrame([
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "x alpha beta gamma delta y"),
        (3, "unique words only here nothing shared"),
        (4, "rep rep rep rep rep rep rep rep"),
        (5, "a b c d p q r s a b c d"),
        (6, "a b c d"),
        (7, "tiny doc"),
    ], "doc_id long, text string")
    spans = sorted(
        (r["id"], r["span_start"], r["span_end"]) for r in
        D.substring_dup_spans(docs, "doc_id", "text", window=4).collect())
    assert spans == [
        (1, 1, 4),            # "alpha beta gamma delta" shared with doc 2
        (2, 2, 5),
        (4, 1, 8),            # 5 overlapping within-doc windows -> one span
        (5, 1, 4), (5, 9, 12),  # gap of 4 non-dup tokens -> two spans
        (6, 1, 4),
    ]


def test_substring_dedup_rollup_and_cleaned_text(spark):
    docs = spark.createDataFrame([
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "x alpha beta gamma delta y"),
        (3, "unique words only here nothing shared"),
        (4, "rep rep rep rep rep rep rep rep"),
        (5, "a b c d p q r s a b c d"),
        (6, "a b c d"),
        (7, "tiny doc"),
    ], "doc_id long, text string")
    out = {r["id"]: r for r in
           D.substring_dedup(docs, "doc_id", "text", window=4).collect()}
    assert len(out) == 7                      # clean docs covered with zeros
    assert out[1]["cleaned_text"] == "epsilon zeta"
    assert (out[1]["n_tokens"], out[1]["dup_tokens"],
            out[1]["n_spans"]) == (6, 4, 1)
    assert out[1]["dup_ratio"] == pytest.approx(0.666667)
    assert out[2]["cleaned_text"] == "x y"
    assert out[3]["dup_tokens"] == 0 and out[3]["cleaned_text"] == (
        "unique words only here nothing shared")
    assert out[4]["cleaned_text"] == "" and out[4]["dup_ratio"] == 1.0
    assert out[5]["cleaned_text"] == "p q r s" and out[5]["n_spans"] == 2
    assert out[6]["cleaned_text"] == "" and out[6]["n_tokens"] == 4
    assert out[7]["cleaned_text"] == "tiny doc" and out[7]["n_spans"] == 0


def test_decontaminate_flags_benchmark_ngrams(spark):
    bench = spark.createDataFrame(
        [(100, "secret eval answer is here")], "doc_id long, text string")
    train = spark.createDataFrame([
        (1, "the eval answer is forty two"),     # hits "eval answer is"
        (2, "completely clean training text"),
        (3, "short"),                            # < n tokens, still covered
    ], "doc_id long, text string")
    out = {r["id"]: r for r in
           D.decontaminate(train, "doc_id", "text", bench, n=3).collect()}
    assert len(out) == 3
    assert out[1]["contaminated"] and out[1]["n_hit_windows"] == 1
    assert not out[2]["contaminated"] and out[2]["n_hit_windows"] == 0
    assert not out[3]["contaminated"]


def test_bloom_decontaminate_matches_exact_flags(spark):
    bench = spark.createDataFrame(
        [(100, "secret eval answer is here")], "doc_id long, text string")
    train = spark.createDataFrame([
        (1, "the eval answer is forty two"),     # shares "eval answer is"
        (2, "completely clean training text"),
        (3, "short"),
    ], "doc_id long, text string")
    out = {r["id"]: r for r in
           D.bloom_decontaminate(train, "doc_id", "text", bench,
                                 n=3, m=1 << 20, k=3).collect()}
    assert len(out) == 3
    # no false negatives: the truly shared gram is always flagged
    assert out[1]["contaminated"] and out[1]["n_maybe_grams"] == 1
    # at m=2^20 with a 3-gram benchmark set, clean docs stay clean
    assert not out[2]["contaminated"] and out[2]["n_maybe_grams"] == 0
    assert not out[3]["contaminated"]


def test_jaccard_prefix_pairs_matches_naive(spark):
    """Prefix filtering is lossless: results equal the naive all-shared-
    token join at every threshold, including pairs whose shared tokens
    are all CORPUS-COMMON (the prefix theorem's worst case)."""
    from spikex_spark.operators.dedup import jaccard_prefix_pairs
    docs = [
        (0, "the quick brown fox jumps"),
        (1, "the quick brown fox leaps"),       # J=4/6 with 0
        (2, "the quick brown cat sits"),        # J=3/7 with 0
        (3, "totally different words here"),
        (4, "the the quick quick"),             # dup tokens collapse
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    def naive(t):
        sets = {i: set(s.split()) for i, s in docs}
        out = set()
        for a in sets:
            for b in sets:
                if a < b and sets[a] & sets[b]:
                    j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
                    if j >= t:              # threshold on UNROUNDED j
                        out.add((a, b, round(j, 6)))
        return out

    for t in (0.3, 0.5, 0.66, 0.9):
        got = {(r["id_a"], r["id_b"], r["jaccard"]) for r in
               jaccard_prefix_pairs(df, "doc_id", "text",
                                    threshold=t).collect()}
        assert got == naive(t), f"threshold {t}"


def test_jaccard_prefix_pairs_ngram_mode(spark):
    from spikex_spark.operators.dedup import jaccard_prefix_pairs
    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d f"), (2, "x y")],
        ["doc_id", "text"])
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           jaccard_prefix_pairs(df, "doc_id", "text", threshold=0.4,
                                n=3).collect()}
    # 3-grams of 0: {abc,bcd,cde}; of 1: {abc,bcd,cdf} -> J = 2/4 = 0.5
    assert got == {(0, 1): 0.5}


def test_lsh_expected_recall_hand_computed(spark):
    from spikex_spark.operators.dedup import lsh_expected_recall
    # one pair with s = 1/2, one with s = 1 (i=u)
    pairs = spark.createDataFrame(
        [(1, 2, 5, 10), (3, 4, 7, 7)], "id_a long, id_b long, i long, u long")
    out = {(r["bands"], r["rows_per_band"]):
           (r["n_pairs"], r["exp_recall"])
           for r in lsh_expected_recall(pairs).collect()}

    def p(s, b, r):
        return 1.0 - (1.0 - s ** r) ** b

    for (b, r), (n, got) in out.items():
        assert n == 2
        want = round((round(p(0.5, b, r) * 1e6) + round(p(1.0, b, r) * 1e6))
                     / (2 * 1e6), 6)
        assert got == want
    # more bands at fixed hash budget -> higher recall at s=0.5
    assert out[(8, 1)][1] > out[(4, 2)][1] > out[(2, 4)][1] > out[(1, 8)][1]


def test_lsh_expected_recall_union_guard(spark):
    from spikex_spark.operators.dedup import lsh_expected_recall
    pairs = spark.createDataFrame(
        [(1, 2, 5, 10), (3, 4, 20000, 20001)],
        "id_a long, id_b long, i long, u long")
    out = lsh_expected_recall(pairs).collect()
    assert all(r["n_pairs"] == 1 for r in out)   # oversize union excluded


def test_line_dedup_grouped_scopes_to_host(spark):
    from spikex_spark.operators.dedup import line_dedup_grouped

    rows = [
        (0, "a.com", "Cookie banner\nStory alpha"),
        (1, "a.com", "Cookie banner\nStory beta"),
        (2, "b.com", "Cookie banner\nStory gamma"),
    ]
    df = spark.createDataFrame(rows, "id long, host string, text string")
    got = {r["id"]: r for r in
           line_dedup_grouped(df, "id", "text", "host").collect()}
    # repeated on a.com → dropped there; single occurrence on b.com → kept
    assert got[0]["cleaned_text"] == "Story alpha"
    assert got[1]["cleaned_text"] == "Story beta"
    assert got[2]["cleaned_text"] == "Cookie banner\nStory gamma"
    assert (got[0]["n_lines"], got[0]["n_kept"]) == (2, 1)
    assert got[2]["n_kept"] == 2


def test_bag_jaccard_separates_repetition_from_near_dup(spark):
    from spikex_spark.operators.dedup import bag_jaccard_pairs
    base = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = [
        (1, base),
        (2, base + " india"),              # true near-dup of 1
        (3, ("alpha " * 50) + base),       # same vocab, repetition-skewed
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {(r["id_a"], r["id_b"]): r for r in bag_jaccard_pairs(
        df, "doc_id", "text", min_jaccard=0.0, max_df=10).collect()}
    # (1,2): 8 shared of 9-union tokens, all count 1 -> 8/9
    assert out[(1, 2)]["bag_jaccard"] == round(8 / 9, 6)
    # (1,3): set Jaccard would be 1.0, but the bag is 8/58 shared mass
    assert out[(1, 3)]["inter_w"] == 8
    assert out[(1, 3)]["total_b"] == 58          # 51x alpha + 7 others
    assert out[(1, 3)]["bag_jaccard"] == round(8 / 58, 6)
    # threshold filter keeps only the true near-dup at 0.5
    kept = bag_jaccard_pairs(
        df, "doc_id", "text", min_jaccard=0.5, max_df=10).collect()
    assert {(r["id_a"], r["id_b"]) for r in kept} == {(1, 2)}


def test_bag_jaccard_hub_guard_drops_common_tokens(spark):
    from spikex_spark.operators.dedup import bag_jaccard_pairs
    # 'common' appears in all 4 docs -> df=4 > max_df=3 -> guarded away,
    # leaving no shared tokens between the two pairs
    rows = [(i, f"common unique{i} word{i}") for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bag_jaccard_pairs(df, "doc_id", "text",
                            min_jaccard=0.0, max_df=3).collect()
    assert out == []


def test_dedup_savings_monotone(spark):
    import __spark_entry__ as E
    rows = E.queries()["dedup_savings"](
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        # near-dup resolution can only remove more than exact dedup
        assert r["n_docs_near"] <= r["n_docs_exact"] <= r["n_docs_raw"]
        assert r["bytes_near"] <= r["bytes_exact"] <= r["bytes_raw"]
        assert 0.0 <= r["pct_bytes_saved"] < 1.0


def test_exact_duplicates_covers_null_and_empty_text(spark):
    from spikex_spark.operators.dedup import exact_duplicates
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None), (5, "")],
        "doc_id long, text string")
    out = {r["id"]: r for r in
           exact_duplicates(df, "doc_id", "text").collect()}
    # the contract: output covers ALL rows, and null-text docs are
    # SELF-canonical (ADVICE r4: a failed fetch is not a duplicate of
    # another failed fetch, and resolve_documents leaves null docs as
    # singleton clusters — keep_near ⊆ keep_exact must hold on
    # null-bearing corpora too)
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[2]["canonical_id"] == 1
    assert out[3]["canonical_id"] == 3 and out[4]["canonical_id"] == 4
    assert out[5]["canonical_id"] == 5          # empty != null


def test_dedup_keep_near_subset_of_keep_exact_with_nulls(spark):
    """The monotone invariant on a null-bearing corpus: every doc kept
    by near-dup resolution is also kept by exact dedup."""
    from spikex_spark.operators.dedup import exact_duplicates
    from spikex_spark.pipeline import resolve_documents
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta common text"),
         (2, "alpha beta gamma delta common text"),
         (3, None), (4, None), (5, "")],
        "doc_id long, text string")
    keep_exact = {r["id"] for r in
                  exact_duplicates(df, "doc_id", "text").collect()
                  if r["id"] == r["canonical_id"]}
    keep_near = {r["doc_id"] for r in
                 resolve_documents(df, threshold=0.80).collect()
                 if r["doc_id"] == r["cluster_id"]}
    assert {3, 4} <= keep_exact            # null docs self-canonical
    assert keep_near <= keep_exact


def test_minhash_est_error_bounds(spark):
    import __spark_entry__ as E
    row = E.queries()["minhash_est_error"](
        spark, "/root/testdata/sf0.001").collect()[0]
    assert row["n_pairs"] > 0
    # both means are Jaccards; MAE is bounded by 1 and, at 16 hashes on
    # near-dup candidates, should be tight
    assert 0.0 <= row["mean_sig_jaccard"] <= 1.0
    assert 0.0 <= row["mean_exact_jaccard"] <= 1.0
    assert 0.0 <= row["mae"] <= 0.5
