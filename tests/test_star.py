from __future__ import annotations

import pytest

from spikex_spark.operators.star import star_clusters


def _brute(edges, ids, rounds=3):
    nbrs = {}
    for a, b in edges:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    uncovered = set(deg)
    out = {}
    for r in range(1, rounds + 1):
        live = {v: {u for u in nbrs[v] if u in uncovered}
                for v in uncovered}
        centers = {v for v, ns in live.items()
                   if ns and all((deg[v], -v) > (deg[u], -u) for u in ns)}
        for c in centers:
            out[c] = (c, 1, r)
        for v in list(uncovered):
            if v in centers:
                continue
            cn = [u for u in live.get(v, ()) if u in centers]
            if cn:
                best = max(cn, key=lambda u: (deg[u], -u))
                out[v] = (best, 0, r)
        uncovered -= set(out)
    for v in ids:
        if v not in out:
            out[v] = (v, 1, 0)
    return out


EDGES = [
    # hub 1 with 4 satellites
    (1, 2), (1, 3), (1, 4), (1, 5),
    # second star sharing a satellite with the hub
    (6, 5), (6, 7), (6, 8),
    # chain that needs multiple rounds / leftovers
    (10, 11), (11, 12), (12, 13),
    # isolated pair
    (20, 21),
]
IDS = [1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 12, 13, 20, 21, 99]


def _run(spark, rounds=3):
    p = spark.createDataFrame(EDGES, "id_a long, id_b long")
    ids = spark.createDataFrame([(i,) for i in IDS], "id long")
    rows = star_clusters(p, ids, rounds=rounds).collect()
    assert len(rows) == len(IDS)
    return {r["id"]: (r["center_id"], r["is_center"], r["round"])
            for r in rows}


def test_star_matches_bruteforce(spark):
    for rounds in (1, 2, 3):
        assert _run(spark, rounds) == _brute(EDGES, IDS, rounds)


def test_star_semantics(spark):
    got = _run(spark, 3)
    # the hub is a round-1 center and owns its satellites
    assert got[1] == (1, 1, 1)
    assert got[2] == (1, 0, 1) and got[4] == (1, 0, 1)
    # the shared satellite joins the HIGHER-degree center (deg 1=4 > 6=3)
    assert got[5] == (1, 0, 1)
    # no satellite belongs to two stars; isolated node is its own center
    assert got[99] == (99, 1, 0)
