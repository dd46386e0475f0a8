from __future__ import annotations

import re

import pytest

from spikex_spark.operators.dedup import containment_pairs

SMALL = "alpha beta gamma delta epsilon zeta"
BIG = (
    "intro words here first. "
    + SMALL
    + " and then a very long tail of unrelated filler content goes on "
    "and on about completely different topics for a while longer"
)
DOCS = [
    (0, SMALL),  # fully contained in 1
    (1, BIG),
    (2, "totally different text about oranges and apples in the market"),
    (3, SMALL),  # exact duplicate of 0 -> containment 1.0, tie by id
    (4, "al be ga"),  # short, unrelated
]


def _grams(text: str, n: int = 3) -> set[str]:
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    if len(toks) >= n:
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    return {" ".join(toks)} if toks else set()


def _brute(min_containment: float = 0.8):
    gs = {i: _grams(t) for i, t in DOCS if _grams(t)}
    out = {}
    ids = sorted(gs)
    for x in ids:
        for y in ids:
            if x >= y:
                continue
            inter = len(gs[x] & gs[y])
            if inter == 0:
                continue
            c = round(inter / min(len(gs[x]), len(gs[y])), 6)
            if c >= min_containment:
                if (len(gs[x]), x) <= (len(gs[y]), y):
                    sm, bg = x, y
                else:
                    sm, bg = y, x
                out[(sm, bg)] = (
                    inter,
                    min(len(gs[x]), len(gs[y])),
                    max(len(gs[x]), len(gs[y])),
                    c,
                )
    return out


def test_containment_matches_bruteforce(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = containment_pairs(df, "doc_id", "text").collect()
    got = {
        (r["contained_id"], r["container_id"]): (
            r["inter"],
            r["n_small"],
            r["n_big"],
            r["containment"],
        )
        for r in rows
    }
    assert got == _brute()
    # the asymmetric cases Jaccard misses: 0⊂1 and the exact dup 0/3
    assert (0, 1) in got and got[(0, 1)][3] == 1.0
    assert (0, 3) in got and got[(0, 3)][3] == 1.0
    assert (3, 1) in got  # the duplicate is contained in BIG too


def test_jaccard_would_miss_the_subset_pair(spark):
    from spikex_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    jacc = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", min_jaccard=0.5
        ).collect()
    }
    assert (0, 1) not in jacc  # resemblance blind spot, by construction


def test_hub_gram_guard_applies(spark):
    # 30 docs sharing one hub trigram + one unique trigram each: with
    # max_df=10 the hub gram is dropped, so no pair shares anything
    docs = [
        (i, f"common hub gram unique{i} token{i} word{i}")
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = containment_pairs(
        df, "doc_id", "text", min_containment=0.1, max_df=10
    ).collect()
    hub_pairs = [r for r in rows if r["containment"] >= 0.1]
    # every surviving intersection must come from non-hub grams only;
    # the unique tails share nothing, so nothing survives
    assert hub_pairs == []


def test_minhash_containment_estimates_subset(spark):
    from spikex_spark.operators.dedup import minhash_containment_est

    small = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon")
    # a SHORT tail keeps true J high enough for 4x4 banding to recall
    # the pair (the estimator is downstream of LSH candidates)
    big = small + " plus tiny tail"
    docs = [(0, small), (1, big), (2, "wholly different content here")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = minhash_containment_est(df, "doc_id", "text",
                                   min_containment=0.3).collect()
    got = {(r["contained_id"], r["container_id"]): r for r in rows}
    assert (0, 1) in got
    r = got[(0, 1)]
    # the subset pair: high signature agreement, containment near/above 1
    assert r["agree"] >= 8
    assert r["est_containment"] >= 0.8
    assert r["n_small"] < r["n_big"]
    assert not any(2 in k for k in got)
