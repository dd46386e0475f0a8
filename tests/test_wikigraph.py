"""WikiGraph end-to-end: dump lines → graph → category/neighbor queries.

Mirrors the reference's golden test shape (tests/test_wikigraph.py:1-27:
categories and neighbors of Category:Apples) on a synthetic apple wiki.
"""

from __future__ import annotations

import pytest

from spikex_spark.sources import read_wiki_dump
from spikex_spark.wikigraph import build_wikigraph

PAGE_DUMP = (
    "INSERT INTO `page` VALUES "
    "(1,14,'Apples','',0,0),(2,14,'Fruits','',0,0),"
    "(3,14,'Amygdaloideae','',0,0),(4,14,'Apple_products','',0,0),"
    "(10,0,'Apple','',0,0),(11,0,'Granny_Smith','',0,0),"
    "(12,0,'Gala_(apple)','',0,0),(13,0,'Gala','',0,0),"
    "(14,0,'Malus','',0,0),(15,0,'Hidden_apple','',0,0),"
    "(16,0,'Apple_disambig','',0,0);"
)
PROPS_DUMP = (
    "INSERT INTO `page_props` VALUES "
    "(15,'hiddencat','1',0),(16,'disambiguation','1',0);"
)
REDIRECT_DUMP = (
    "INSERT INTO `redirect` VALUES (13,0,'Gala_(apple)','','');"
)
LINKS_DUMP = (
    "INSERT INTO `categorylinks` VALUES "
    "(10,'Apples','x','page'),(11,'Apples','x','page'),"
    "(12,'Apples','x','page'),(14,'Apples','x','page'),"
    "(1,'Fruits','x','subcat'),(1,'Amygdaloideae','x','subcat'),"
    "(4,'Apples','x','subcat'),(15,'Apples','x','page'),"
    "(10,'Fruits','x','page');"
)


@pytest.fixture(scope="module")
def wg(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("wikidump")
    (d / "page.sql").write_text(PAGE_DUMP + "\n")
    (d / "props.sql").write_text(PROPS_DUMP + "\n")
    (d / "redirect.sql").write_text(REDIRECT_DUMP + "\n")
    (d / "links.sql").write_text(LINKS_DUMP + "\n")
    pages = read_wiki_dump(spark, str(d / "page.sql"), "page")
    redirects = read_wiki_dump(spark, str(d / "redirect.sql"), "redirect")
    links = read_wiki_dump(spark, str(d / "links.sql"), "categorylinks")
    import pandas as pd
    from pyspark.sql import functions as F  # noqa
    props = spark.createDataFrame(
        pd.DataFrame({"pageid": [15, 16], "prop": ["hiddencat", "disambiguation"]})
    )
    return build_wikigraph(pages, props, redirects, links)


def test_hidden_and_disambig_filtered(wg):
    titles = {r["title"] for r in wg.pages.collect()}
    assert "Hidden_apple" not in titles        # F2
    assert "Apple_disambig" not in titles      # J3
    assert "Gala" not in titles                # redirect source removed
    assert "Gala_(apple)" in titles


def test_redirect_resolution(wg):
    r = {x["src_title"]: x["dst_pageid"] for x in wg.redirects.collect()}
    assert r == {"Gala": 12}
    assert wg.get_pageid("Gala") == 12         # lookup follows redirects


def test_categories_of_apples(wg):
    got = {r["title"] for r in wg.get_categories("Category:Apples").collect()}
    assert got == {"Category:Fruits", "Category:Amygdaloideae"}


def test_neighbors_of_apples(wg):
    got = {r["title"] for r in wg.get_neighbors("Category:Apples").collect()}
    # members + parent categories + subcats; hidden page excluded
    assert got == {
        "Apple", "Granny_Smith", "Gala_(apple)", "Malus",
        "Category:Fruits", "Category:Amygdaloideae", "Category:Apple_products",
    }


def test_two_hop_categories(wg):
    got = {(r["title"], r["dist"])
           for r in wg.get_categories("Apple", distance=2).collect()}
    assert ("Category:Apples", 1) in got
    assert ("Category:Fruits", 1) in got       # direct link from Apple
    assert ("Category:Amygdaloideae", 2) in got


def test_api_parity_surface(wg):
    """Reference WikiGraph surface (wikigraph/wikigraph.py:99-149):
    is_redirect / is_category / is_disambiguation / redirect / get_page /
    get_pageid / pages() / categories()."""
    assert wg.is_redirect("Gala") and not wg.is_redirect("Apple")
    assert wg.is_category("Category:Apples") and not wg.is_category("Apple")
    assert wg.is_disambiguation("Apple_disambig")
    assert not wg.is_disambiguation("Apple")
    # redirect resolution returns the target TITLE; non-redirects echo back
    assert wg.redirect("Gala") == "Gala_(apple)"
    assert wg.redirect("Apple") == "Apple"
    # pageid lookups: redirect sources resolve to the target pageid
    assert wg.get_pageid("Gala") == 12
    assert wg.get_pageid("Apple") == 10
    assert wg.get_page(10) == "Apple"
    assert wg.get_page(16) == "Apple_disambig"
    assert wg.get_page(99999) is None
    # iterators — redirect sources must NOT leak into the default view
    arts = set(wg.iter_pages())
    assert "Apple" in arts and "Category:Apples" not in arts
    assert "Gala" not in arts and "Apple_disambig" not in arts
    # and redirect=True must yield each title exactly once
    with_all = list(wg.iter_pages(redirect=True, disambi=True))
    assert len(with_all) == len(set(with_all))
    with_red = set(wg.iter_pages(redirect=True, disambi=True))
    assert "Gala" in with_red and "Apple_disambig" in with_red
    cats = set(wg.categories())
    assert "Category:Apples" in cats and "Apple" not in cats
