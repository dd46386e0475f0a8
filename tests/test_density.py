from __future__ import annotations

import random

import pytest

from spikex_spark.operators.density import dbscan_clusters


def _brute_dbscan(edges, ids, min_pts):
    """Reference DBSCAN with the module's deterministic border rule."""
    nbrs: dict[int, set[int]] = {i: set() for i in ids}
    for a, b in edges:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    core = {i for i in ids if len(nbrs.get(i, ())) >= min_pts - 1}
    # components over core-core edges, label = min member
    label = {i: i for i in core}

    def find(x):
        while label[x] != x:
            label[x] = label[label[x]]
            x = label[x]
        return x

    for a, b in edges:
        if a in core and b in core:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                label[hi] = lo
    cl = {i: find(i) for i in core}
    out = {}
    for i in ids:
        if i in core:
            out[i] = ("core", cl[i])
        else:
            cn = [cl[n] for n in nbrs.get(i, ()) if n in core]
            if cn:
                out[i] = ("border", min(cn))
            else:
                out[i] = ("noise", -1)
    return out


EDGES = (
    # blob A: 0-3 complete
    [(a, b) for a in range(4) for b in range(a + 1, 4)]
    # blob B: 10-13 complete
    + [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    + [(3, 21)]  # pendant off blob A
    + [(30, 31)]  # isolated thin pair
    + [(3, 22), (10, 22)]  # two-cluster contact point
)
IDS = list(range(4)) + list(range(10, 14)) + [21, 22, 30, 31, 40]


def _run(spark, edges, ids, min_pts):
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    all_ids = spark.createDataFrame([(i,) for i in ids], "id long")
    rows = dbscan_clusters(pairs, all_ids, min_pts=min_pts).collect()
    assert len(rows) == len(ids)
    return {r["id"]: (r["role"], r["cluster_id"]) for r in rows}


def test_min_pts_3_structure(spark):
    got = _run(spark, EDGES, IDS, 3)
    assert got == _brute_dbscan(EDGES, IDS, 3)
    # node 22 (degree 2) is core at min_pts=3 and WELDS A and B
    assert got[22][0] == "core"
    assert got[0][1] == got[10][1] == 0
    # thin pair + isolated node are noise
    assert got[30] == ("noise", -1)
    assert got[31] == ("noise", -1)
    assert got[40] == ("noise", -1)
    # pendant 21 is border of blob A
    assert got[21] == ("border", 0)


def test_min_pts_4_border_tie_and_separation(spark):
    got = _run(spark, EDGES, IDS, 4)
    assert got == _brute_dbscan(EDGES, IDS, 4)
    # at min_pts=4 the contact point is no longer core: A and B separate
    assert got[0][1] == 0 and got[10][1] == 10
    # border of BOTH clusters -> deterministic min cluster id
    assert got[22] == ("border", 0)
    # 3 is still core at min_pts=4 (degree 5), so the pendant stays border
    assert got[21] == ("border", 0)


def test_randomized_bruteforce_parity(spark):
    rng = random.Random(42)
    ids = list(range(60))
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(60), rng.randrange(60)) for _ in range(150)
            )
            if a != b
        }
    )
    for min_pts in (2, 3, 5):
        assert _run(spark, edges, ids, min_pts) == _brute_dbscan(
            edges, ids, min_pts
        )
