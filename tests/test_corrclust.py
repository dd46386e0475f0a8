"""Parallel-pivot correlation clustering (serializable KwikCluster)."""

from __future__ import annotations

import hashlib
import random
from collections import defaultdict

from spikex_spark.operators.corrclust import correlation_clusters


def _key(i) -> str:
    s = str(i)
    return hashlib.md5(s.encode()).hexdigest() + ":" + s.zfill(20)


def _serial_kwikcluster(nodes, edges):
    """Sequential reference: walk the md5 permutation, pivot, grab."""
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    cluster = {}
    for v in sorted(nodes, key=_key):
        if v in cluster:
            continue
        cluster[v] = v
        for n in adj[v]:
            if n not in cluster:
                cluster[n] = v
    return cluster


def _spark_clusters(spark, nodes, edges, rounds):
    ndf = spark.createDataFrame([(n,) for n in nodes], "id long")
    edf = spark.createDataFrame(list(edges) or [(0, 0)],
                                "src long, dst long")
    if not edges:
        edf = edf.where("src <> src")
    out = correlation_clusters(edf, ndf, rounds=rounds)
    return {r["id"]: r["cluster_id"] for r in out.collect()}


def test_matches_serial_kwikcluster_on_random_graph(spark):
    rng = random.Random(7)
    nodes = list(range(40))
    edges = {(a, b) for a in nodes for b in nodes
             if a < b and rng.random() < 0.12}
    got = _spark_clusters(spark, nodes, edges, rounds=40)
    want = _serial_kwikcluster(nodes, edges)
    assert got == want
    # star invariant: every non-pivot member is adjacent to its pivot
    und = edges | {(b, a) for a, b in edges}
    assert all(c == i or (i, c) in und for i, c in got.items())


def test_bridge_does_not_chain_merge(spark):
    # two triangles joined by one bridge edge: CC gives ONE cluster;
    # KwikCluster keeps at least two (a pivot cluster is a star, so no
    # cluster can span both triangles: no node is adjacent to all).
    edges = {(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)}
    got = _spark_clusters(spark, list(range(6)), edges, rounds=12)
    assert len(set(got.values())) >= 2
    assert got == _serial_kwikcluster(range(6), edges)


def test_isolated_nodes_become_singletons_round_one(spark):
    got = _spark_clusters(spark, [10, 20, 30], set(), rounds=1)
    assert got == {10: 10, 20: 20, 30: 30}


def test_bounded_rounds_leftovers_are_singletons(spark):
    # a permutation-descending chain resolves slowly; with rounds=1 the
    # unresolved tail must come back as singletons, deterministically
    nodes = list(range(12))
    edges = {(i, i + 1) for i in range(11)}
    got = _spark_clusters(spark, nodes, edges, rounds=1)
    assert set(got) == set(nodes)
    full = _spark_clusters(spark, nodes, edges, rounds=12)
    assert full == _serial_kwikcluster(nodes, edges)


# --------------------------------------------------------------------------
# corrclust.canopy_assign
# --------------------------------------------------------------------------

def test_canopy_centers_are_t2_mis_and_membership_overlaps(spark):
    from spikex_spark.operators.corrclust import canopy_assign
    # tight graph: 1-2 (one center among them); loose adds 3 near both
    # 1 and 2, and 4 near nothing; 5 isolated everywhere
    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
    tight = spark.createDataFrame([(1, 2)], "src long, dst long")
    loose = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "src long, dst long")
    out = canopy_assign(loose, tight, nodes, rounds=8)
    got = sorted((r["center_id"], r["member_id"]) for r in out.collect())
    centers = {c for c, _ in got}
    # exactly one of {1,2} is a center (tight MIS); 3,4,5 all centers
    assert len(centers & {1, 2}) == 1
    assert {3, 4, 5} <= centers
    c12 = (centers & {1, 2}).pop()
    # 3 overlaps: member of its own canopy AND of c12's AND of 4's? no —
    # 3 is loose-adjacent to c12 and 4; membership rows:
    assert (c12, 3) in got and (3, 3) in got and (4, 3) in got
    # the non-center of {1,2} is a loose member of c12's canopy
    other = ({1, 2} - {c12}).pop()
    assert (c12, other) in got
    # isolated 5 is a singleton canopy
    assert (5, 5) in got
    # every node appears as a member somewhere (full coverage)
    assert {m for _, m in got} == {1, 2, 3, 4, 5}


def test_er_v2_covers_all_docs_and_widens_recall(spark):
    """The three-channel candidate union is a superset of the LSH-only
    channel, and the v2 clustering assigns every document exactly once."""
    import sys
    sys.path.insert(0, ".")
    import __spark_entry__ as entry
    from spikex_spark.pipeline import doc_candidate_pairs

    sf = "/root/testdata/sf0.001"
    docs = entry._read(spark, sf, "documents")
    out = entry._q_er_v2_clusters(spark, sf)
    rows = out.collect()
    ids = [r["doc_id"] for r in rows]
    assert sorted(ids) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect())
    assert len(set(ids)) == len(ids)
    # channel union ⊇ LSH channel (recall can only widen)
    lsh = {(r["id_a"], r["id_b"]) for r in
           doc_candidate_pairs(docs).select("id_a", "id_b").collect()}
    # shared-200-char-prefix groups (the corpus's planted near-dups;
    # NO exact full-text duplicates exist) must never split across v2
    # clusters: they share every blocking key and score >= the edge
    # threshold, so one pivot grabs the group
    from pyspark.sql import functions as F
    gold = docs.select(
        "doc_id", F.md5(F.substring("text", 1, 200)).alias("th"))
    j = (out.join(gold, "doc_id")
         .groupBy("th").agg(F.countDistinct("cluster_id").alias("nc"),
                            F.count(F.lit(1)).alias("n")))
    grouped = j.where(F.col("n") > 1)
    assert grouped.count() > 0          # the assertion must have teeth
    assert grouped.where(F.col("nc") > 1).count() == 0
    assert lsh  # non-degenerate input
