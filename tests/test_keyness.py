from __future__ import annotations

import math

import pytest

from spikex_spark.operators.profiling import keyness_g2

A = (["cat"] * 30 + ["dog"] * 10 + ["the"] * 60 + ["rare"] * 1)
B = (["cat"] * 5 + ["dog"] * 12 + ["the"] * 80 + ["zeta"] * 3)


def _brute(a, b, top_k=50):
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    n1, n2 = len(a), len(b)
    out = []
    for k in set(ca) | set(cb):
        o1, o2 = ca.get(k, 0), cb.get(k, 0)
        both, nt = o1 + o2, n1 + n2
        lr1 = round(math.log((o1 * nt) / (n1 * both)) * 1e7) if o1 else 0
        lr2 = round(math.log((o2 * nt) / (n2 * both)) * 1e7) if o2 else 0
        g2 = 2 * (o1 * lr1 + o2 * lr2)
        direction = ("over" if o1 * n2 > o2 * n1
                     else "under" if o1 * n2 < o2 * n1 else "even")
        out.append((k, o1, o2, lr1, lr2, g2, direction))
    out.sort(key=lambda r: (-r[5], r[0]))
    return out[:top_k]


def test_keyness_matches_bruteforce(spark):
    a = spark.createDataFrame([(k,) for k in A], "key string")
    b = spark.createDataFrame([(k,) for k in B], "key string")
    rows = keyness_g2(a, b, "key").collect()
    got = [(r["key"], r["o1"], r["o2"], r["lr1_e7"], r["lr2_e7"],
            r["g2_e7"], r["direction"]) for r in rows]
    assert got == _brute(A, B)
    byk = {r[0]: r for r in got}
    # 'cat' is heavily over-used in A, 'zeta' exists only in B
    assert byk["cat"][6] == "over"
    assert byk["zeta"][6] == "under" and byk["zeta"][1] == 0
    # the most significant key should be 'cat' (big count, big shift)
    assert got[0][0] == "cat" and got[0][5] > 0


def test_top_k_truncation(spark):
    a = spark.createDataFrame([(k,) for k in A], "key string")
    b = spark.createDataFrame([(k,) for k in B], "key string")
    rows = keyness_g2(a, b, "key", top_k=2).collect()
    assert len(rows) == 2
    assert [r["key"] for r in rows] == [x[0] for x in _brute(A, B, 2)]
