from __future__ import annotations

import pytest

from spikex_spark.operators.hac import hac_clusters


def _brute(pairs, ids, rounds=3, min_score=0.80):
    lab = {i: i for i in ids}
    pe = [(a, b, round(s * 10_000)) for a, b, s in pairs if a != b]
    for _ in range(rounds):
        cl = {}
        for a, b, s in pe:
            la, lb = lab[a], lab[b]
            if la == lb:
                continue
            k = (min(la, lb), max(la, lb))
            st = cl.setdefault(k, [0, 0])
            st[0] += s
            st[1] += 1
        cl = {k: v for k, v in cl.items()
              if v[0] >= round(min_score * 10_000) * v[1]}
        best = {}
        for (ca, cb), (s, c) in cl.items():
            for src, dst in ((ca, cb), (cb, ca)):
                cur = best.get(src)
                key = (-(s / c), dst)
                if cur is None or key < cur[0]:
                    best[src] = (key, dst)
        merges = []
        for src, (_, dst) in best.items():
            if src < dst and best.get(dst, (None, None))[1] == src:
                merges.append((src, dst))
        m = dict((gone, keep) for keep, gone in merges)
        lab = {i: m.get(l, l) for i, l in lab.items()}
    return lab


IDS = list(range(10))
# two tight groups + a weak bridge + noise
PAIRS = [
    (0, 1, 0.99), (0, 2, 0.95), (1, 2, 0.97),
    (3, 4, 0.96), (4, 5, 0.92), (3, 5, 0.90),
    (2, 3, 0.81),  # bridge: above threshold but weaker
    (6, 7, 0.70),  # below threshold: never merges
    (8, 9, 0.85),
]


def _run(spark, rounds=3, min_score=0.80):
    p = spark.createDataFrame(PAIRS, "id_a long, id_b long, score double")
    ids = spark.createDataFrame([(i,) for i in IDS], "id long")
    return {
        r["id"]: r["cluster_id"]
        for r in hac_clusters(p, ids, rounds=rounds,
                              min_score=min_score).collect()
    }


def test_hac_matches_bruteforce(spark):
    for rounds in (1, 2, 3):
        assert _run(spark, rounds=rounds) == _brute(
            PAIRS, IDS, rounds=rounds)


def test_hac_semantics(spark):
    got = _run(spark, rounds=3)
    # the two tight triangles collapse
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    # the sub-threshold pair stays apart; 8-9 merge
    assert got[6] != got[7]
    assert got[8] == got[9]


def test_threshold_blocks_all(spark):
    got = _run(spark, rounds=3, min_score=0.999)
    assert all(got[i] == i for i in IDS)
