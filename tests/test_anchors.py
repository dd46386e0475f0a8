from __future__ import annotations

import pytest

from spikex_spark.operators.anchors import anchor_aliases, extract_links

PAGES = [
    (
        "https://site1.com/a",
        "<html><body>"
        '<a href="https://www.Example.com/apple?utm_source=x">Apple Inc.</a>'
        ' <a href="https://example.com/apple#frag"><b>Apple</b> Inc.</a>'
        "</body></html>",
    ),
    (
        "https://site2.com/b",
        '<p><a href="https://example.com/apple">AAPL</a>'
        '<a href="https://example.com/banana">Banana</a>'
        '<a href="https://example.com/empty"> <b> </b> </a>'
        '<a href="">dangling</a>'
        '<A HREF="https://example.com/apple">Apple\nInc.</A></p>',
    ),
    ("https://site3.com/c", "<html><body>no links here</body></html>"),
]


@pytest.fixture(scope="module")
def pages_bin_df(spark):
    rows = [(u, h.encode()) for u, h in PAGES]
    return spark.createDataFrame(rows, "url string, html binary")


def test_extract_links_binary_html(spark, pages_bin_df):
    got = sorted(
        (r["src"], r["dst"], r["anchor"])
        for r in extract_links(pages_bin_df).collect()
    )
    assert got == [
        ("https://site1.com/a", "https://example.com/apple", "apple inc."),
        ("https://site1.com/a", "https://example.com/apple", "apple inc."),
        ("https://site2.com/b", "https://example.com/apple", "aapl"),
        ("https://site2.com/b", "https://example.com/apple", "apple inc."),
        ("https://site2.com/b", "https://example.com/banana", "banana"),
    ]


def test_extract_links_no_canonicalize(spark, pages_bin_df):
    dsts = {
        r["dst"]
        for r in extract_links(pages_bin_df, canonicalize=False).collect()
    }
    assert "https://www.Example.com/apple?utm_source=x" in dsts
    assert "https://example.com/apple#frag" in dsts


def test_anchor_aliases_rollup(spark, pages_bin_df):
    rows = {r["dst"]: r for r in anchor_aliases(pages_bin_df).collect()}
    assert set(rows) == {
        "https://example.com/apple",
        "https://example.com/banana",
    }
    a = rows["https://example.com/apple"]
    assert a["n_links"] == 4
    assert a["n_sources"] == 2
    assert a["n_aliases"] == 2
    assert a["top_alias"] == "apple inc."
    assert a["aliases"] == ["aapl", "apple inc."]
    b = rows["https://example.com/banana"]
    assert (b["n_links"], b["n_sources"], b["top_alias"]) == (1, 1, "banana")


def test_top_alias_tie_is_alphabetical(spark):
    html = (
        '<a href="https://t.com/x">beta</a>'
        '<a href="https://t.com/x">alpha</a>'
    )
    df = spark.createDataFrame(
        [("https://s.com/p", html.encode())], "url string, html binary"
    )
    row = anchor_aliases(df).collect()[0]
    assert row["top_alias"] == "alpha"


def test_max_aliases_cap(spark):
    html = "".join(
        f'<a href="https://t.com/x">alias{i:02d}</a>' for i in range(30)
    )
    df = spark.createDataFrame(
        [("https://s.com/p", html.encode())], "url string, html binary"
    )
    row = anchor_aliases(df, max_aliases=5).collect()[0]
    assert row["n_aliases"] == 30
    assert row["aliases"] == [f"alias{i:02d}" for i in range(5)]


def test_alias_block_pairs(spark):
    from spikex_spark.operators.anchors import alias_block_pairs

    pages = [
        ("https://s1.com", '<a href="https://t.com/a">Acme Corp</a>'
                           '<a href="https://t.com/a">The A Company</a>'),
        ("https://s2.com", '<a href="https://t.com/b">acme corp</a>'
                           '<a href="https://t.com/b">Acme</a>'),
        ("https://s3.com", '<a href="https://t.com/c">ACME CORP</a>'
                           '<a href="https://t.com/c">acme</a>'
                           '<a href="https://t.com/d">other thing</a>'),
    ]
    df = spark.createDataFrame(
        [(u, h.encode()) for u, h in pages], "url string, html binary"
    )
    got = {
        (r["id_a"], r["id_b"]): r["n_shared_aliases"]
        for r in alias_block_pairs(df).collect()
    }
    # a/b/c all share "acme corp"; b/c also share "acme"; d shares nothing
    assert got == {
        ("https://t.com/a", "https://t.com/b"): 1,
        ("https://t.com/a", "https://t.com/c"): 1,
        ("https://t.com/b", "https://t.com/c"): 2,
    }


def test_alias_block_cap(spark):
    from spikex_spark.operators.anchors import alias_block_pairs

    # 6 targets share one hub alias; cap=3 keeps the 3 smallest ids
    html = "".join(
        f'<a href="https://t.com/{i}">hub</a>' for i in range(6)
    )
    df = spark.createDataFrame(
        [("https://s.com", html.encode())], "url string, html binary"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in alias_block_pairs(df, cap=3).collect()
    }
    kept = [f"https://t.com/{i}" for i in range(3)]
    assert got == {
        (kept[i], kept[j]) for i in range(3) for j in range(3) if i < j
    }


def test_commonness_priors(spark):
    from spikex_spark.operators.anchors import commonness, extract_links

    pages = [
        ("https://s1.com", '<a href="https://t.com/a">apple</a>'
                           '<a href="https://t.com/a">apple</a>'
                           '<a href="https://t.com/b">apple</a>'),
    ]
    df = spark.createDataFrame(
        [(u, h.encode()) for u, h in pages], "url string, html binary"
    )
    got = {
        (r["anchor"], r["dst"]): (r["n"], r["n_anchor"], r["prior_e6"])
        for r in commonness(extract_links(df)).collect()
    }
    assert got[("apple", "https://t.com/a")] == (2, 3, 666667)  # half-up
    assert got[("apple", "https://t.com/b")] == (1, 3, 333333)


def test_link_by_commonness_ranks(spark):
    from spikex_spark.operators.anchors import (commonness, extract_links,
                                                link_by_commonness)

    pages = [
        ("https://s1.com", '<a href="https://t.com/a">acme</a>'
                           '<a href="https://t.com/a">acme</a>'
                           '<a href="https://t.com/b">acme</a>'),
    ]
    df = spark.createDataFrame(
        [(u, h.encode()) for u, h in pages], "url string, html binary"
    )
    pri = commonness(extract_links(df))
    mentions = spark.createDataFrame(
        [(0, "acme"), (1, "acme"), (1, "unknown")],
        "doc long, mention string",
    )
    rows = link_by_commonness(mentions, pri).collect()
    got = {(r["doc"], r["mention"], r["rank"]): r["dst"] for r in rows}
    # majority target ranks first for every mention; unknown drops out
    assert got[(0, "acme", 1)] == "https://t.com/a"
    assert got[(0, "acme", 2)] == "https://t.com/b"
    assert got[(1, "acme", 1)] == "https://t.com/a"
    assert not any(r["mention"] == "unknown" for r in rows)


def test_inlink_relatedness_jaccard(spark):
    from spikex_spark.operators.anchors import inlink_relatedness

    # in-link sets: A←{s1,s2,s3}, B←{s2,s3}, C←{s3}
    links = spark.createDataFrame(
        [("s1", "A", "x"), ("s2", "A", "x"), ("s3", "A", "x"),
         ("s2", "B", "x"), ("s3", "B", "x"), ("s3", "C", "x")],
        "src string, dst string, anchor string")
    got = {(r["dst_a"], r["dst_b"]): r
           for r in inlink_relatedness(links).collect()}
    # J(A,B)=2/3, J(A,C)=1/3, J(B,C)=1/2 — half-up e6 snaps
    assert got[("A", "B")]["rel_e6"] == 666667
    assert got[("A", "C")]["rel_e6"] == 333333
    assert got[("B", "C")]["rel_e6"] == 500000
    assert got[("A", "B")]["n_common"] == 2
    assert got[("A", "B")]["n_union"] == 3


def test_inlink_relatedness_src_cap(spark):
    from spikex_spark.operators.anchors import inlink_relatedness

    # a hub source linking to 5 targets is capped to its first 2 (by
    # dst order) — only the (T0, T1) co-citation survives
    links = spark.createDataFrame(
        [("hub", f"T{i}", "x") for i in range(5)],
        "src string, dst string, anchor string")
    rows = inlink_relatedness(links, cap_per_src=2).collect()
    assert {(r["dst_a"], r["dst_b"]) for r in rows} == {("T0", "T1")}


def test_rerank_by_context_flips_prior(spark):
    from spikex_spark.operators.anchors import rerank_by_context

    # mention m1 in doc 0: candidate P wins on prior, but Q is related
    # to the doc's unambiguous context target CTX — context must flip it
    cands = spark.createDataFrame(
        [(0, "m1", "P", 900000, 1), (0, "m1", "Q", 100000, 2),
         (0, "m2", "CTX", 1000000, 1)],
        "doc long, mention string, dst string, prior_e6 long, rank int")
    rel = spark.createDataFrame(
        [("CTX", "Q", 1, 2, 500000)],
        "dst_a string, dst_b string, n_common long, n_union long,"
        " rel_e6 long")
    got = {(r["doc"], r["mention"], r["rank"]): (r["dst"], r["ctx_e6"])
           for r in rerank_by_context(cands, rel).collect()}
    assert got[(0, "m1", 1)] == ("Q", 500000)   # context wins
    assert got[(0, "m1", 2)] == ("P", 0)
    assert got[(0, "m2", 1)][0] == "CTX"        # no-context: prior order
