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
