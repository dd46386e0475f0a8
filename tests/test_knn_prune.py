"""mutual_knn_edges: degree-bounded match-graph sparsification."""
from __future__ import annotations

import pytest


def _edges(spark, rows, k):
    from spikex_spark.operators.graph import mutual_knn_edges

    df = spark.createDataFrame(rows, "id_a bigint, id_b bigint, score double")
    return {(r["src"], r["dst"])
            for r in mutual_knn_edges(df, k=k).collect()}


def test_mutuality_required(spark):
    # hub 1 matches 2,3,4 strongly; with k=1, node 1 keeps only its best
    rows = [(1, 2, 0.99), (1, 3, 0.95), (1, 4, 0.90)]
    got = _edges(spark, rows, k=1)
    # 2,3,4 each pick 1 (their only match), but 1 only picks 2 -> mutual
    assert got == {(1, 2)}


def test_k_bounds_degree(spark):
    rows = [(1, j, 1.0 - j * 0.01) for j in range(2, 10)]
    got = _edges(spark, rows, k=3)
    # node 1's top-3 partners by (score desc): 2, 3, 4
    assert got == {(1, 2), (1, 3), (1, 4)}


def test_tie_breaks_on_partner_id(spark):
    rows = [(1, 5, 0.9), (1, 3, 0.9), (1, 4, 0.9)]
    got = _edges(spark, rows, k=2)
    assert got == {(1, 3), (1, 4)}


def test_chain_merge_is_cut(spark):
    # two tight pairs bridged by one weaker link: with k=1 the bridge dies
    rows = [(1, 2, 0.99), (3, 4, 0.99), (2, 3, 0.85)]
    got = _edges(spark, rows, k=1)
    assert got == {(1, 2), (3, 4)}
    # with k=2 the bridge survives (it's mutual 2nd-best)
    assert _edges(spark, rows, k=2) == {(1, 2), (2, 3), (3, 4)}


def test_output_canonical_and_unique(spark):
    rows = [(2, 1, 0.9), (1, 3, 0.8)]
    got = _edges(spark, rows, k=5)
    assert got == {(1, 2), (1, 3)}


def _core(spark, rows, k=2, rounds=6):
    from spikex_spark.operators.graph import kcore_nodes

    df = spark.createDataFrame(rows, "src bigint, dst bigint")
    return {r["node"] for r in kcore_nodes(df, k=k, rounds=rounds).collect()}


def test_kcore_triangle_survives_tail_dies(spark):
    # triangle 1-2-3 plus a tail 3-4-5
    rows = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    assert _core(spark, rows) == {1, 2, 3}


def test_kcore_star_fully_peels(spark):
    rows = [(0, j) for j in range(1, 6)]
    assert _core(spark, rows) == set()


def test_kcore_cycle_is_its_own_2core(spark):
    rows = [(1, 2), (2, 3), (3, 4), (4, 1)]
    assert _core(spark, rows) == {1, 2, 3, 4}


def test_kcore_cascading_peel_needs_rounds(spark):
    # chain hanging off a triangle: peeling cascades one node per round
    rows = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (6, 7)]
    assert _core(spark, rows, rounds=6) == {1, 2, 3}


def _brute_mutual_knn(rows, k):
    import collections

    by_node = collections.defaultdict(list)
    for a, b, s in rows:
        by_node[a].append((-s, b))
        by_node[b].append((-s, a))
    picks = {n: {p for _, p in sorted(v)[:k]} for n, v in by_node.items()}
    out = set()
    for a, b, _ in rows:
        if b in picks.get(a, ()) and a in picks.get(b, ()):
            out.add((min(a, b), max(a, b)))
    return out


def test_mutual_knn_matches_brute_force_random_graphs(spark):
    import random

    for seed in range(5):
        rng = random.Random(seed)
        n = rng.randint(5, 14)
        pairs = {(a, b) for a in range(n) for b in range(a + 1, n)
                 if rng.random() < 0.4}
        rows = [(a, b, round(rng.random(), 4)) for a, b in pairs]
        if not rows:
            continue
        k = rng.randint(1, 3)
        assert _edges(spark, rows, k=k) == _brute_mutual_knn(rows, k), \
            (seed, k)


def _brute_kcore(rows, k):
    import collections

    edges = {(min(a, b), max(a, b)) for a, b in rows if a != b}
    while True:
        deg = collections.Counter()
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        alive = {n for n, d in deg.items() if d >= k}
        kept = {(a, b) for a, b in edges if a in alive and b in alive}
        if kept == edges:
            break
        edges = kept
    deg = collections.Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    return {n for n, d in deg.items() if d >= k}


def test_kcore_matches_brute_force_random_graphs(spark):
    import random

    for seed in range(5):
        rng = random.Random(100 + seed)
        n = rng.randint(5, 12)
        rows = [(a, b) for a in range(n) for b in range(a + 1, n)
                if rng.random() < 0.35]
        if not rows:
            continue
        k = rng.randint(2, 3)
        # rounds = n is always enough for full convergence
        assert _core(spark, rows, k=k, rounds=n) == _brute_kcore(rows, k), \
            (seed, k)
