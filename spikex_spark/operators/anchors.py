"""Anchor-text alias extraction — the web-graph entity-alias signal.

What links *say* about a page is the oldest entity signal on the web:
the anchor texts pointing at a URL are surface forms ("aliases") of the
entity the page is about, independent of the page's own content — the
same role the reference's WikiGraph redirects/titles play for Wikipedia
pages (reference parity: spikex/wikigraph pages→titles; here the alias
dictionary is mined from the crawl itself).  Aggregated per target they
feed ER directly: an extra blocking channel (alias keys) and extra
pairwise evidence (shared-alias score).

Extraction is pure Catalyst regex over the raw ``html`` column (binary
or string) — one ``regexp_extract_all`` plus two group extracts per
link, a narrow map with no Python.  The pattern is conservative and
documented rather than a parser: double-quoted ``href`` attributes,
``(?is)`` so tag case and newlines inside the element don't matter;
single-quoted/unquoted hrefs and nested ``<a>`` are out of scope (a
crawl-grade HTML parser is a mapInPandas stage, not a regex — this
operator is the cheap high-precision channel).

Whitespace is normalized with the explicit class ``[ \\t\\n\\x0b\\f\\r]``
on both engines — Java ``\\s`` and RE2 ``\\s`` disagree on ``\\x0b``
(see token_counts oracle).

100-TB shape: link extraction is shuffle-free; the per-target rollup is
two groupBys on the canonical target (map-side combinable counts + a
distinct-source agg); hub targets (millions of in-links) are bounded by
the same cap/salt discipline as every other key channel — the alias
*set* per target is capped with ``max_aliases`` so no single row
explodes.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .urls import canonical_url

__all__ = ["extract_links", "anchor_aliases", "alias_block_pairs",
           "commonness", "link_by_commonness", "inlink_relatedness",
           "rerank_by_context"]

_LINK_PAT = '(?is)<a[ \\t\\n\\x0b\\f\\r][^>]*href="([^"]*)"[^>]*>(.*?)</a>'
_WS = "[ \\t\\n\\x0b\\f\\r]+"


def extract_links(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    canonicalize: bool = True,
) -> DataFrame:
    """(src, dst, anchor) — one row per hyperlink.

    ``src`` is the page URL as given; ``dst`` is the href, canonicalized
    via :func:`urls.canonical_url` unless ``canonicalize=False``;
    ``anchor`` is the link text with inner tags stripped, lowercased,
    whitespace-collapsed.  Links with an empty href or empty anchor
    after normalization are dropped (they carry no alias evidence).
    """
    html = F.col(html_col).cast("string")
    m = F.explode(
        F.regexp_extract_all(html, F.lit(_LINK_PAT), F.lit(0))
    ).alias("m")
    dst_raw = F.regexp_extract(F.col("m"), _LINK_PAT, 1)
    anchor = F.trim(
        F.regexp_replace(
            F.lower(
                F.regexp_replace(
                    F.regexp_extract(F.col("m"), _LINK_PAT, 2),
                    "<[^>]*>", " ",
                )
            ),
            _WS, " ",
        )
    )
    dst = canonical_url(dst_raw) if canonicalize else dst_raw
    return (
        df.select(F.col(url_col).alias("src"), m)
        .select("src", dst.alias("dst"), anchor.alias("anchor"))
        .where((F.col("dst") != "") & (F.col("anchor") != ""))
    )


def anchor_aliases(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    canonicalize: bool = True,
    max_aliases: int = 20,
) -> DataFrame:
    """(dst, n_links, n_sources, n_aliases, top_alias, aliases) — the
    alias dictionary per link target.

    ``top_alias`` is the most frequent anchor text (ties broken by
    alphabetical order — deterministic); ``aliases`` is the sorted
    distinct alias list, truncated to the ``max_aliases``
    alphabetically-first entries so hub rows stay bounded.
    """
    links = extract_links(df, url_col, html_col, canonicalize)
    per_alias = links.groupBy("dst", "anchor").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("dst").orderBy(
        F.col("n").desc(), F.col("anchor").asc()
    )
    tops = (
        per_alias.withColumn("_rk", F.row_number().over(w))
        .groupBy("dst")
        .agg(
            F.sum("n").cast("long").alias("n_links"),
            F.count("*").cast("long").alias("n_aliases"),
            F.max(F.when(F.col("_rk") == 1, F.col("anchor"))).alias(
                "top_alias"
            ),
            F.slice(
                F.array_sort(F.collect_set("anchor")), 1, max_aliases
            ).alias("aliases"),
        )
    )
    srcs = links.groupBy("dst").agg(
        F.countDistinct("src").cast("long").alias("n_sources")
    )
    return tops.join(srcs, "dst").select(
        "dst", "n_links", "n_sources", "n_aliases", "top_alias", "aliases"
    )


def alias_block_pairs(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    canonicalize: bool = True,
    cap: int = 1000,
) -> DataFrame:
    """(id_a, id_b, n_shared_aliases) — the alias blocking channel:
    two link TARGETS become a candidate pair when the crawl calls them
    by the same anchor text.  The web-ER complement to the content
    channels (normalized-title, MinHash, TF-IDF): it pairs mirror /
    moved / syndicated pages whose own text may differ entirely,
    because their *in-links* agree on what they are.

    Each alias is a block; hub aliases ("click here", brand names) are
    the skew bomb, so blocks are capped at ``cap`` members with the
    shared :func:`blocking.cap_blocks` discipline (deterministic by
    id) before the quadratic within-block join — same 100-TB posture
    as every other channel.  Pair weight = number of distinct shared
    aliases after capping.
    """
    from .blocking import cap_blocks

    links = extract_links(df, url_col, html_col, canonicalize)
    blocks = cap_blocks(
        links.select(F.col("anchor").alias("block_key"),
                     F.col("dst").alias("id")).distinct(),
        cap=cap,
    )
    return (
        blocks.alias("a")
        .join(blocks.alias("b"), "block_key")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").cast("long").alias("n_shared_aliases"))
    )


def commonness(links: DataFrame) -> DataFrame:
    """(anchor, dst, n, n_anchor, prior_e6) — the commonness prior
    ``P(dst | anchor)`` from link statistics (Milne & Witten, CIKM
    2008): of everything the crawl calls "apple inc.", what fraction of
    the links point at each target?  ``prior_e6`` is the half-up-rounded
    prior in integer micro-units (``(2·n·10⁶ + t) div (2·t)`` — the
    linkage._snap_ratio discipline; no float rounding mode ever decides
    it).  Input is the (src, dst, anchor) stream of
    :func:`extract_links`.
    """
    per = links.groupBy("anchor", "dst").agg(
        F.count("*").cast("long").alias("n"))
    tot = per.groupBy("anchor").agg(
        F.sum("n").cast("long").alias("n_anchor"))
    return per.join(tot, "anchor").select(
        "anchor", "dst", "n", "n_anchor",
        F.expr("(2 * n * 1000000 + n_anchor) div (2 * n_anchor)")
        .cast("long").alias("prior_e6"),
    )


def link_by_commonness(
    mentions: DataFrame,
    priors: DataFrame,
    mention_col: str = "mention",
) -> DataFrame:
    """(doc, mention, dst, prior_e6, rank) — rank each mention's link
    candidates by the commonness prior, the standard no-context entity
    linking baseline (and the tie-break layer under any contextual
    re-ranker).  ``mentions`` carries (doc, mention) surface forms
    normalized like anchors (lowercase, squished); ``priors`` is
    :func:`commonness` output.  Deterministic rank: (prior DESC, dst
    ASC) per (doc, mention).

    Scale: one equi-join of the mention stream against the (broadcast-
    size per-alias) prior table and a per-mention window — partitioned
    by (doc, mention), never global.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("doc", "mention").orderBy(
        F.col("prior_e6").desc(), F.col("dst").asc())
    return (
        mentions.select(F.col("doc"),
                        F.col(mention_col).alias("mention"))
        .join(priors.withColumnRenamed("anchor", "mention"), "mention")
        .select("doc", "mention", "dst", "prior_e6")
        .withColumn("rank", F.row_number().over(w))
    )


def inlink_relatedness(
    links: DataFrame,
    cap_per_src: int = 200,
) -> DataFrame:
    """(dst_a, dst_b, n_common, n_union, rel_e6) — co-in-link Jaccard
    relatedness between link targets: two pages are related in
    proportion to how many source pages link to BOTH.  This is the
    exact-arithmetic stand-in for the Milne–Witten link-based measure
    (WLM, CIKM 2008) used by every anchor-dictionary disambiguator
    since (Ratinov et al., ACL 2011 use the same in-link-set overlap
    family): WLM's normalized-google-distance needs ``log`` (float,
    engine-dependent ulps), while Jaccard over the same in-link sets is
    a pure integer ratio — ``rel_e6`` is half-up-rounded micro-units
    via the ``(2·c·10⁶ + u) div (2·u)`` snap discipline.

    Scale shape: the co-citation self-join is keyed on ``src``, so a
    hub SOURCE (a page linking to thousands of targets) is the
    quadratic bomb — capped at ``cap_per_src`` distinct targets per
    source (deterministic by dst order) before the join, the same
    posture as every blocking channel.  In-link sizes are one
    map-side-combinable groupBy; the pair count is another.
    """
    srcs = links.select("src", "dst").distinct()
    w = Window.partitionBy("src").orderBy("dst")
    capped = (srcs.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") <= cap_per_src).drop("_rn"))
    sz = capped.groupBy("dst").agg(
        F.count("*").cast("long").alias("n_in"))
    a = capped.select("src", F.col("dst").alias("dst_a"))
    b = capped.select("src", F.col("dst").alias("dst_b"))
    common = (
        a.join(b, "src").where(F.col("dst_a") < F.col("dst_b"))
        .groupBy("dst_a", "dst_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    sa = sz.select(F.col("dst").alias("dst_a"), F.col("n_in").alias("_na"))
    sb = sz.select(F.col("dst").alias("dst_b"), F.col("n_in").alias("_nb"))
    out = (common.join(sa, "dst_a").join(sb, "dst_b")
           .withColumn("n_union",
                       (F.col("_na") + F.col("_nb") - F.col("n_common"))
                       .cast("long")))
    return out.select(
        "dst_a", "dst_b", "n_common", "n_union",
        F.expr("(2 * n_common * 1000000 + n_union) div (2 * n_union)")
        .cast("long").alias("rel_e6"),
    )


def rerank_by_context(
    candidates: DataFrame,
    relatedness: DataFrame,
) -> DataFrame:
    """(doc, mention, dst, prior_e6, ctx_e6, rank) — context-aware
    entity disambiguation: re-rank each mention's link candidates by
    their summed relatedness to the document's OTHER mentions'
    top-prior targets (the local-context layer of Milne & Witten 2008
    and GLOW, stacked on the commonness baseline
    :func:`link_by_commonness` — prior breaks ctx ties, dst breaks
    both).  ``candidates`` is :func:`link_by_commonness` output;
    ``relatedness`` is :func:`inlink_relatedness` output (undirected —
    both orientations are expanded here).

    Scale shape: the context table is rank-1 rows only (one per
    (doc, mention)); the scoring join is candidate-stream × relatedness
    on (dst, ctx_dst) — the relatedness table is anchor-dictionary
    sized (targets², capped), broadcastable next to a corpus-scale
    candidate stream; the final rank window is per (doc, mention).
    """
    ctx = (candidates.where(F.col("rank") == 1)
           .select("doc", F.col("mention").alias("ctx_mention"),
                   F.col("dst").alias("ctx_dst")))
    rel2 = relatedness.select(
        F.col("dst_a").alias("_x"), F.col("dst_b").alias("_y"), "rel_e6"
    ).unionByName(relatedness.select(
        F.col("dst_b").alias("_x"), F.col("dst_a").alias("_y"), "rel_e6"))
    scored = (
        candidates.select("doc", "mention", "dst")
        .join(ctx, "doc")
        .where(F.col("ctx_mention") != F.col("mention"))
        .join(rel2, (F.col("dst") == F.col("_x"))
              & (F.col("ctx_dst") == F.col("_y")))
        .groupBy("doc", "mention", "dst")
        .agg(F.sum("rel_e6").cast("long").alias("ctx_e6"))
    )
    w = Window.partitionBy("doc", "mention").orderBy(
        F.col("ctx_e6").desc(), F.col("prior_e6").desc(), F.col("dst"))
    return (
        candidates.select("doc", "mention", "dst", "prior_e6")
        .join(scored, ["doc", "mention", "dst"], "left")
        .withColumn("ctx_e6", F.coalesce("ctx_e6", F.lit(0)).cast("long"))
        .withColumn("rank", F.row_number().over(w))
    )
