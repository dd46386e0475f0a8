"""Relational operators: the reference's dict/trie lookups as real joins.

Reference parity (SURVEY.md §2.3):

* J1 redirect resolution (2-hop) — spikex ``wikigraph/wikigraph.py:322-340``:
  ``redirects: title→pageid`` plus one extra hop to collapse
  redirect-of-redirect chains.
* J2 category semi-join — ``wikigraph.py:343-364``: keep categorylink rows
  whose source exists in the allowed pages (trie membership ≡ left-semi).
* J3 anti-join dedup — ``wikigraph.py:300-306``: drop redirect sources and
  disambiguation pages from the pages table.
* J4 id↔title lookup — ``wikigraph.py:133-149``: union of dimension tables +
  broadcast equi-join.
* F2 page-props filter — ``wikigraph.py:283-296``: drop hiddencat/noindex.

Scale notes: redirects/disambiguations are ≪ pages → broadcast hash joins
(hinted); the pages table is the fact side and never shuffles for these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(titles: DataFrame, max_hops: int = 2) -> DataFrame:
    """J1: (title, resolved_pageid) following redirect chains up to max_hops.

    Non-redirect rows resolve to themselves. A chain longer than max_hops
    resolves as far as the hop bound allows (reference follows exactly one
    extra hop, ``wikigraph.py:331-339``).
    """
    base = titles.select(
        "title", "pageid", "is_redirect",
        F.col("redirect_to").alias("_next"),
    )
    resolved = base.withColumn(
        "resolved", F.when(F.col("is_redirect"), F.col("_next")).otherwise(F.col("pageid"))
    )
    dim = titles.select(
        F.col("pageid").alias("_pid"),
        F.col("is_redirect").alias("_r"),
        F.col("redirect_to").alias("_rt"),
    )
    for _ in range(max_hops - 1):
        resolved = (
            resolved.join(F.broadcast(dim), resolved.resolved == dim._pid, "left")
            .withColumn(
                "resolved",
                F.when(F.col("_r") & F.col("_rt").isNotNull(), F.col("_rt"))
                .otherwise(F.col("resolved")),
            )
            .drop("_pid", "_r", "_rt")
        )
    return resolved.select("title", "pageid", F.col("resolved").alias("resolved_pageid"))


def dedup_pages(titles: DataFrame) -> DataFrame:
    """J3: pages minus redirect sources minus disambiguations (anti-joins)."""
    pages = titles.where(F.col("kind") == "page")
    redirects = titles.where(F.col("is_redirect")).select(F.col("title").alias("t"))
    disambi = titles.where(F.col("kind") == "disambiguation").select(
        F.col("title").alias("t")
    )
    return (
        pages.join(F.broadcast(redirects), pages.title == redirects.t, "left_anti")
        .join(F.broadcast(disambi), pages.title == disambi.t, "left_anti")
    )


def filter_hidden(titles: DataFrame) -> DataFrame:
    """F2: drop pages whose props include hiddencat/noindex; flag disambig."""
    return titles.where(
        ~F.array_contains(F.col("props"), "hiddencat")
        & ~F.array_contains(F.col("props"), "noindex")
    ).withColumn(
        "is_disambiguation", F.array_contains(F.col("props"), "disambiguation")
    )


def allowed_category_links(links: DataFrame, titles: DataFrame) -> DataFrame:
    """J2: keep edges whose src is an allowed page AND dst is a category."""
    allowed = filter_hidden(titles).select(F.col("pageid").alias("_src_ok"))
    cats = titles.where(F.col("kind") == "category").select(
        F.col("pageid").alias("_dst_ok")
    )
    return (
        links.join(F.broadcast(allowed), links.src == F.col("_src_ok"), "left_semi")
        .join(F.broadcast(cats), links.dst == F.col("_dst_ok"), "left_semi")
    )


def id_title_lookup(titles: DataFrame, ids: DataFrame,
                    id_col: str = "pageid") -> DataFrame:
    """J4: enrich arbitrary pageid rows with titles (broadcast dim join)."""
    dim = titles.select("pageid", "title", "kind")
    return ids.join(F.broadcast(dim), ids[id_col] == dim.pageid, "left").drop(
        dim.pageid
    )
