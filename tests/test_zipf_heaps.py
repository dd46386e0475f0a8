from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from spikex_spark.operators.corpus import heaps_curve, zipf_curve

DOCS = [
    (0, "the cat sat on the mat the end"),
    (1, "the dog and the cat ran to the park"),
    (5, "a dog a cat a bird a fish"),
    (9, "completely novel words appear here only once ever"),
    (13, "the the the cat cat dog"),
    (19, "zeta omega theta the cat"),
]


def _tok(t):
    return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]


def test_zipf_matches_bruteforce(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = zipf_curve(df, "doc_id", "text", top_k=5).collect()
    cnt = Counter(t for _, txt in DOCS for t in _tok(txt))
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = sorted(rows, key=lambda r: r["rank"])
    assert [(r["token"], r["freq"]) for r in got] == exp
    # e7 snaps
    for r in got:
        assert r["ln_rank_e7"] == round(math.log(r["rank"]) * 1e7)
        assert r["ln_freq_e7"] == round(math.log(r["freq"]) * 1e7)
    # slope: exact integer moments, final ratio float
    xs = [round(math.log(i + 1) * 1e7) for i in range(len(exp))]
    ys = [round(math.log(f) * 1e7) for _, f in exp]
    n = len(xs)
    num = n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys)
    den = n * sum(a * a for a in xs) - sum(xs) ** 2
    assert got[0]["slope"] == round(num / den, 6)
    assert all(r["slope"] == got[0]["slope"] for r in got)
    assert got[0]["slope"] < 0  # frequencies fall with rank


def test_heaps_matches_bruteforce(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    B = 4
    rows = sorted(
        heaps_curve(df, "doc_id", "text", buckets=B).collect(),
        key=lambda r: r["bucket"],
    )
    mx = max(i for i, _ in DOCS) + 1
    buckets = {}
    first_seen = {}
    for i, txt in sorted(DOCS):
        b = math.floor(i * B / mx)
        toks = _tok(txt)
        buckets.setdefault(b, [0, 0])
        buckets[b][0] += len(toks)
        for t in toks:
            if t not in first_seen:
                first_seen[t] = b
                buckets[b][1] += 1
    assert [r["bucket"] for r in rows] == sorted(buckets)
    ct, cy = 0, 0
    for r in rows:
        nt, ny = buckets[r["bucket"]]
        ct += nt
        cy += ny
        assert (r["n_tokens"], r["new_types"]) == (nt, ny)
        assert (r["cum_tokens"], r["cum_types"]) == (ct, cy)
    # totals line up with the corpus
    assert ct == sum(len(_tok(t)) for _, t in DOCS)
    assert cy == len({t for _, txt in DOCS for t in _tok(txt)})
