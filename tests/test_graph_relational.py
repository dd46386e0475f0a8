"""Graph d-hop (G2) + relational join operators (J1-J4, F2) on synth titles."""

from __future__ import annotations

from spikex_spark.operators import graph as G
from spikex_spark.operators import relational as R


def test_d_hop_directed(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 5), (9, 1)], ["src", "dst"]
    )
    roots = spark.createDataFrame([(1,)], ["id"])
    got = {r["id"]: r["dist"] for r in G.d_hop_neighbors(edges, roots, d=2).collect()}
    assert got == {2: 1, 5: 1, 3: 2}  # 9 unreachable (wrong direction)


def test_d_hop_undirected_min_dist(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], ["src", "dst"])
    roots = spark.createDataFrame([(1,)], ["id"])
    got = {r["id"]: r["dist"] for r in
           G.d_hop_neighbors(edges, roots, d=3, directed=False).collect()}
    assert got == {2: 1, 3: 1}  # cycle: everything at dist 1, no revisits


def test_resolve_redirects_two_hop(spark, titles_df):
    out = {r["title"]: r["resolved_pageid"]
           for r in R.resolve_redirects(titles_df).collect()}
    # direct page resolves to itself
    assert out["Apple_(company)"] == 100
    # one-hop redirect
    assert out["apple_(company)"] == 100
    # two-hop chain: Apple_Computer -> Apple_Computer_Inc -> 100
    assert out["Apple_Computer"] == 100
    assert out["Apple_Computer_Inc"] == 100


def test_dedup_pages_anti_join(spark, titles_df):
    kept = {r["title"] for r in R.dedup_pages(titles_df).collect()}
    assert "Apple_(company)" in kept
    assert "apple_(company)" not in kept        # redirect source removed
    assert "Apple" not in kept                  # disambiguation removed
    assert "Category:Companies" not in kept     # not kind=page


def test_filter_hidden(spark, titles_df):
    kept = {r["title"]: r["is_disambiguation"]
            for r in R.filter_hidden(titles_df).collect()}
    assert "Hidden_page" not in kept
    assert kept["Apple"] is True
    assert kept["Apple_(company)"] is False


def test_category_links_semi_join(spark, titles_df):
    from spikex_spark.synth import gen_category_links
    links = spark.createDataFrame(gen_category_links())
    # add a bogus edge to a non-category target — must be filtered
    bogus = spark.createDataFrame([(100, 100, "page")], ["src", "dst", "cl_type"])
    out = R.allowed_category_links(links.unionByName(bogus), titles_df).collect()
    assert all(r["cl_type"] in ("page", "subcat") for r in out)
    assert (100, 100) not in {(r["src"], r["dst"]) for r in out}
    assert len(out) == links.count()


def test_personalized_pagerank_bruteforce(spark):
    from spikex_spark.operators.graph import personalized_pagerank

    SCALE = 10**12
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "a"),
             ("x", "y")]
    seeds = ["a"]
    e = spark.createDataFrame(edges, "src string, dst string")
    s = spark.createDataFrame([(i,) for i in seeds], "id string")
    got = {r["id"]: r["rank_scaled"]
           for r in personalized_pagerank(e, s, iterations=4).collect()}

    # brute force with identical truncating integer arithmetic
    nodes = sorted({n for ed in edges for n in ed})
    out = {}
    for a, b in set(edges):
        out[a] = out.get(a, 0) + 1
    init = SCALE // len(seeds)
    base = (15 * init) // 100
    r = {n: (init if n in seeds else 0) for n in nodes}
    for _ in range(4):
        contrib = {}
        for a, b in set(edges):
            contrib[b] = contrib.get(b, 0) + r[a] // out[a]
        r = {n: ((base if n in seeds else 0)
                 + (85 * contrib.get(n, 0)) // 100) for n in nodes}
    assert got == r
    # mass concentrates near the seed; the disconnected x/y pair gets 0
    assert got["a"] > got["d"] > 0
    assert got["x"] == 0 and got["y"] == 0


def test_personalized_pagerank_no_seeds_in_graph(spark):
    from spikex_spark.operators.graph import personalized_pagerank

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    s = spark.createDataFrame([("zz",)], "id string")
    rows = personalized_pagerank(e, s, iterations=2).collect()
    assert all(r["rank_scaled"] == 0 for r in rows)


def test_wl_fingerprints_distinguish_structure(spark):
    from spikex_spark.operators.graph import wl_fingerprints

    # two disjoint components: a path a-b-c and a triangle x-y-z.
    # path endpoints (a, c) are WL-equivalent; the middle (b) is not;
    # triangle nodes are all equivalent to each other but distinct from
    # every path node (degree-2 with different neighborhoods).
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("y", "z"), ("z", "x")],
        "src string, dst string")
    got = {r["node"]: r for r in wl_fingerprints(edges, rounds=2).collect()}
    assert got["a"]["wl_label"] == got["c"]["wl_label"]
    assert got["a"]["wl_label"] != got["b"]["wl_label"]
    tri = {got[n]["wl_label"] for n in "xyz"}
    assert len(tri) == 1
    assert tri.isdisjoint({got[n]["wl_label"] for n in "abc"})
    assert got["b"]["degree"] == 2 and got["x"]["degree"] == 2


def test_wl_rounds_refine(spark):
    from spikex_spark.operators.graph import wl_fingerprints

    # star center vs leaf: degree already separates them at round 0 and
    # every round keeps them separated; all leaves stay identical
    edges = spark.createDataFrame(
        [("c", f"l{i}") for i in range(4)], "src string, dst string")
    got = {r["node"]: r["wl_label"]
           for r in wl_fingerprints(edges, rounds=3).collect()}
    leaves = {got[f"l{i}"] for i in range(4)}
    assert len(leaves) == 1
    assert got["c"] not in leaves


def test_neighborhood_function_exact_when_k_covers_graph(spark):
    """With k >= |V| every sketch holds its whole ball, so
    reachable_pairs must equal the EXACT BFS pair counts."""
    from spikex_spark.operators.graph import neighborhood_function

    # path 0-1-2-3 plus an isolated triangle 10-11-12
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12), (12, 10)],
        "src long, dst long")
    out = {r["t"]: r for r in
           neighborhood_function(edges, rounds=3, k=64).collect()}
    adj = {0: {1}, 1: {0, 2}, 2: {1, 3}, 3: {2},
           10: {11, 12}, 11: {10, 12}, 12: {10, 11}}

    def ball(v, t):
        seen, frontier = {v}, {v}
        for _ in range(t):
            frontier = {u for w in frontier for u in adj[w]} - seen
            seen |= frontier
        return len(seen)

    for t in range(4):
        expect = sum(ball(v, t) for v in adj)
        assert out[t]["reachable_pairs"] == expect, t
        assert out[t]["n_nodes"] == 7
        assert out[t]["n_saturated"] == 0


def test_neighborhood_function_saturates_and_estimates(spark):
    """k smaller than the ball: the estimator kicks in, is monotone-ish
    and flags saturation; n_nodes stays the full node set."""
    from spikex_spark.operators.graph import neighborhood_function

    # star: hub 0 connected to 1..40 — every ball at t>=2 has 41 nodes
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 41)], "src long, dst long")
    out = {r["t"]: r for r in
           neighborhood_function(edges, rounds=2, k=8).collect()}
    assert out[0]["n_saturated"] == 0
    assert out[2]["n_saturated"] == 41  # all balls hold 41 >= k nodes
    # KMV estimate of 41 from k=8 is rough but must be positive and
    # within a loose factor
    est_avg = out[2]["reachable_pairs"] / 41
    assert 10 <= est_avg <= 164


def test_cluster_bfs_depth_chain_vs_star(spark):
    from spikex_spark.operators.graph import cluster_bfs_depth
    # cluster 1: star around canonical 1 -> depth 1
    # cluster 10: chain 10-11-12-13 -> depth 3
    # cluster 20: singleton -> depth 0
    cl = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1),
         (10, 10), (11, 10), (12, 10), (13, 10),
         (20, 20)], ["id", "cluster_id"])
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (10, 11), (11, 12), (12, 13)],
        ["id_a", "id_b"])
    out = {r["cluster_id"]: r for r in
           cluster_bfs_depth(cl, edges).collect()}
    assert out[1]["depth"] == 1 and out[1]["n_unreached"] == 0
    assert out[10]["depth"] == 3 and out[10]["n_unreached"] == 0
    assert out[20]["depth"] == 0 and out[20]["n_unreached"] == 0


def test_cluster_bfs_depth_cap_reports_unreached(spark):
    from spikex_spark.operators.graph import cluster_bfs_depth
    # chain of length 4 from the seed, capped at depth 2 -> 2 unreached
    cl = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 0), (4, 0)], ["id", "cluster_id"])
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], ["id_a", "id_b"])
    out = cluster_bfs_depth(cl, edges, max_depth=2).collect()[0]
    assert out["depth"] == 2 and out["n_unreached"] == 2
    # cross-cluster edges never leak: an edge to a foreign cluster is
    # dropped by the within-cluster restriction
    cl2 = spark.createDataFrame([(0, 0), (1, 0), (5, 5)],
                                ["id", "cluster_id"])
    e2 = spark.createDataFrame([(0, 1), (1, 5)], ["id_a", "id_b"])
    rows = {r["cluster_id"]: r for r in
            cluster_bfs_depth(cl2, e2).collect()}
    assert rows[0]["depth"] == 1 and rows[0]["n_unreached"] == 0
    assert rows[5]["depth"] == 0
