from __future__ import annotations

import pytest

from spikex_spark.operators.survivorship import truth_discovery

# "good" and "mid" form the consistent majority; "bad" contradicts
# everywhere (its e2 value also loses the first-round tie alphabetically)
CLAIMS = [
    ("e1", "good", "en"), ("e1", "bad", "de"), ("e1", "mid", "en"),
    ("e2", "good", "fr"), ("e2", "bad", "zz"),
    ("e3", "good", "en"), ("e3", "bad", "zh"), ("e3", "mid", "en"),
]


def _snap(n, d):
    return max(1, min(999_999, (2 * n * 1_000_000 + d) // (2 * d)))


def _brute(claims, rounds=3, init=800_000):
    trust = {s: init for _, s, _ in claims}
    chosen = {}
    for _ in range(rounds):
        score = {}
        votes = {}
        for e, s, v in claims:
            score[(e, v)] = score.get((e, v), 0) + trust[s]
            votes[(e, v)] = votes.get((e, v), 0) + 1
        chosen = {}
        for (e, v), sc in score.items():
            cur = chosen.get(e)
            key = (-sc, v)
            if cur is None or key < cur[0]:
                chosen[e] = (key, v, sc, votes[(e, v)])
        nc, nt = {}, {}
        for e, s, v in claims:
            nt[s] = nt.get(s, 0) + 1
            if v == chosen[e][1]:
                nc[s] = nc.get(s, 0) + 1
        trust = {s: _snap(nc.get(s, 0), nt[s]) for s in nt}
    fused = {e: (v, sc, nv) for e, (_, v, sc, nv) in chosen.items()}
    return fused, trust, nc, nt


def test_truth_discovery_matches_bruteforce(spark):
    df = spark.createDataFrame(CLAIMS, "entity string, src string, value string")
    fused, trust = truth_discovery(df, rounds=3)
    got_f = {r["entity"]: (r["fused_value"], r["score_micro"], r["n_votes"])
             for r in fused.collect()}
    got_t = {r["src"]: (r["trust_micro"], r["n_claims"], r["n_correct"])
             for r in trust.collect()}
    exp_f, exp_t, nc, nt = _brute(CLAIMS)
    assert got_f == exp_f
    assert got_t == {s: (exp_t[s], nt[s], nc.get(s, 0)) for s in exp_t}
    # the consistently-agreeing source ends up more trusted than the
    # contradicting one, and e2's tie breaks toward the trusted source
    assert got_t["good"][0] > got_t["bad"][0]
    assert got_f["e1"][0] == "en"
    assert got_f["e2"][0] == "fr"


def test_round_zero_equivalent_tie_breaks_alphabetical(spark):
    df = spark.createDataFrame(
        [("e", "s1", "b"), ("e", "s2", "a")],
        "entity string, src string, value string")
    fused, _ = truth_discovery(df, rounds=1)
    assert fused.collect()[0]["fused_value"] == "a"  # equal trust -> alpha
