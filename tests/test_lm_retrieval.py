"""Bigram-LM perplexity filtering and BM25 retrieval operators."""

from __future__ import annotations

import math

import pytest

from spikex_spark.operators import lm as LM
from spikex_spark.operators import retrieval as R


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a b a b"),
        (1, "a a"),
        (2, ""),                      # zero tokens -> no bigrams -> excluded
        (3, "spam spam spam spam spam spam spam spam"),
        (4, "the quick brown fox jumps over the lazy dog tonight"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def _bigrams(text):
    toks = ["<s>"] + [t for t in text.lower().split() if t]
    return list(zip(toks, toks[1:]))


def _expected_ppl(corpus, doc_text, k=0.5):
    """Reference implementation of the add-k bigram LM, mirroring lm.py's
    exact-integer contract (logp scaled int64 -> exact sum -> ppl@6)."""
    allbg = [g for t in corpus for g in _bigrams(t)]
    from collections import Counter
    cbw = Counter(allbg)
    cw = Counter(g[0] for g in allbg)
    V = len({g[1] for g in allbg})
    doc = Counter(_bigrams(doc_text))
    lps = sum(c * int(round(math.log((cbw[g] + k) / (cw[g[0]] + k * V)) * 1e7))
              for g, c in doc.items())
    n = sum(doc.values())
    return n, lps, round(math.exp(-(lps / 1e7) / n), 6)


def test_doc_bigrams_bos_and_empty(spark, docs):
    got = LM.doc_bigrams(docs, "doc_id", "text")
    rows = [(r["id"], r["w1"], r["w2"]) for r in got.collect()]
    assert (1, "<s>", "a") in rows and (1, "a", "a") in rows
    assert not any(i == 2 for i, _, _ in rows)      # empty doc has no bigrams
    assert sum(1 for i, _, _ in rows if i == 0) == 4


def test_perplexity_matches_reference_math(spark, docs):
    corpus = [r["text"] for r in docs.collect()]
    got = {r["id"]: r for r in
           LM.perplexity(docs, "doc_id", "text", k=0.5).collect()}
    assert 2 not in got                              # excluded, not NaN
    for doc_id, text in [(0, "a b a b"), (3, "spam " * 7 + "spam"),
                         (4, "the quick brown fox jumps over the lazy dog tonight")]:
        n, lps, ppl = _expected_ppl(corpus, text)
        assert got[doc_id]["n_bigrams"] == n
        assert got[doc_id]["logprob_e7"] == lps        # exact int64
        assert got[doc_id]["ppl"] == pytest.approx(ppl, abs=2e-6)
    # the degenerate repeated page is far more predictable than fresh prose
    assert got[3]["ppl"] < got[4]["ppl"]


def test_perplexity_keep_flag_threshold(spark, docs):
    got = {r["id"]: r["keep"] for r in
           LM.perplexity(docs, "doc_id", "text", threshold=3.0).collect()}
    ppls = {r["id"]: r["ppl"] for r in
            LM.perplexity(docs, "doc_id", "text", threshold=3.0).collect()}
    for i, keep in got.items():
        assert keep == (1 if ppls[i] <= 3.0 else 0)
    assert set(got.values()) == {0, 1}               # threshold actually splits


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "apple banana cherry"),
        (1, "apple apple apple banana"),
        (2, "durian elderberry fig"),
        (3, "apple durian"),
        (100, "banana cherry cherry"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_bm25_ranks_tf_and_rarity(spark, corpus):
    q = spark.createDataFrame([(9, "apple")], ["query_id", "qtext"])
    got = R.bm25_topk(corpus, q, "doc_id", "text", k=10).orderBy("rank").collect()
    ids = [r["doc_id"] for r in got]
    assert set(ids) == {0, 1, 3}                     # only docs containing apple
    # exact scores vs hand BM25 (idf@7, contribution@7, sum@6)
    N, avgdl = 5.0, (3 + 4 + 3 + 2 + 3) / 5.0
    df_t = 3.0
    idf = round(math.log(1.0 + (N - df_t + 0.5) / (df_t + 0.5)), 7)

    def w(tf, dl):
        return int(round(
            idf * (tf * 2.2)
            / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) * 1e7)) / 1e7

    expected = {0: w(1.0, 3.0), 1: w(3.0, 4.0), 3: w(1.0, 2.0)}
    for r in got:
        assert r["score"] == pytest.approx(expected[r["doc_id"]], abs=1e-6)
    # tf saturation still lets the tf=3 doc win; shorter doc beats equal-tf
    assert ids == [1, 3, 0]


def test_bm25_topk_limit_and_tiebreak(spark, corpus):
    q = spark.createDataFrame([(9, "banana cherry")], ["query_id", "qtext"])
    got = R.bm25_topk(corpus, q, "doc_id", "text", k=2).orderBy("rank").collect()
    assert len(got) == 2 and got[0]["rank"] == 1
    # both query terms present twice -> doc 100 beats single-term docs
    assert got[0]["doc_id"] == 100


def test_corpus_queries_deterministic(spark, corpus):
    got = R.corpus_queries(corpus, "doc_id", "text", every=100,
                           n_tokens=2).orderBy("query_id").collect()
    assert [(r["query_id"], r["qtext"]) for r in got] == [
        (0, "apple banana"), (100, "banana cherry")]


def test_cluster_label_terms_are_discriminative(spark):
    from spikex_spark.operators.retrieval import cluster_label_terms
    docs = spark.createDataFrame(
        [(1, "zebra zebra zebra common"), (2, "zebra zebra common"),
         (3, "quark quark quark common"), (4, "quark quark common"),
         (5, "lonely singleton page")],
        ["doc_id", "text"])
    cl = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3), (5, 5)],
        ["doc_id", "cluster_id"])
    out = cluster_label_terms(docs, cl, "doc_id", "text", k=1)
    top = {r["cluster_id"]: r["term"] for r in out.collect()}
    # each cluster's top label is its own discriminative term, never the
    # shared 'common'; singleton cluster 5 is dropped (min_members=2)
    assert top == {1: "zebra", 3: "quark"}


def test_cluster_label_rank_ties_break_on_term(spark):
    from spikex_spark.operators.retrieval import cluster_label_terms
    docs = spark.createDataFrame(
        [(1, "beta alpha"), (2, "alpha beta")], ["doc_id", "text"])
    cl = spark.createDataFrame([(1, 1), (2, 1)], ["doc_id", "cluster_id"])
    out = cluster_label_terms(docs, cl, "doc_id", "text", k=2).collect()
    ranked = sorted(out, key=lambda r: r["rank"])
    # identical tf and f_t -> identical score; rank 1 must be 'alpha'
    assert [r["term"] for r in ranked] == ["alpha", "beta"]
    assert ranked[0]["score"] == ranked[1]["score"]
