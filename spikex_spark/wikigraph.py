"""WikiGraph: the reference's ETL lifecycle as one DataFrame DAG (§3.1).

Reference parity — ``wikigraph/wikigraph.py:273-310`` (``_make_graph_
components``) recast declaratively:

1. page-props hash agg per pageid (A2, ``:313-319``)
2. pages scan: drop hiddencat/noindex, flag disambiguations (F2, ``:283-296``)
3. category titles get the ``Category:`` prefix (``:297``)
4. category-links semi-join against known pages/categories (J2, ``:343-364``)
5. redirect resolution with one extra hop (J1, ``:322-340``)
6. anti-join dedup: redirect sources + disambiguations out of pages
   (J3, ``:300-306``)
7. the edge DataFrame IS the graph (G1; no CSR needed)

Queries (``get_categories`` / ``get_neighbors``) are d-hop frontier joins
(G2) over the edge table — returned as DataFrames; ``.collect`` for the
driver-side list API the reference exposes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.graph import d_hop_neighbors, undirected

# one Arrow transfer covers iterator pulls up to this many rows; larger
# sets stream (memory-bounded) — same strategy/cutoff as the mention
# dictionary probe in pipeline._mentions
_ARROW_ITER_MAX = 2_000_000


def _iter_col(df: DataFrame, col: str):
    """Yield one string column driver-side.

    ``toLocalIterator`` serializes rows one at a time over py4j —
    pathological at the ~20M-title scale of a full wiki dump. Instead pull
    the whole column in ONE Arrow batch transfer when it fits
    ``_ARROW_ITER_MAX`` (the limit(n+1) probe costs a single job and
    avoids a separate count), and only fall back to the streaming iterator
    beyond that, where driver memory — not transfer overhead — is the
    binding constraint.
    """
    head = df.select(col).limit(_ARROW_ITER_MAX + 1).toPandas()
    if len(head) <= _ARROW_ITER_MAX:
        yield from head[col].tolist()
        return
    for r in df.select(col).toLocalIterator(prefetchPartitions=True):
        yield r[col]


@dataclass
class WikiGraph:
    """Graph API mirroring the reference ``WikiGraph`` surface
    (``wikigraph/wikigraph.py:99-149``: is_redirect / is_disambiguation /
    is_category / pages / categories / redirect / get_page / get_pageid /
    get_categories) over DataFrames.

    Per-title lookups run a filtered ``take(1)`` — fine for the interactive
    parity API; batch workloads join against ``pages``/``redirects``/
    ``edges`` directly so Catalyst sees one plan.
    """

    pages: DataFrame       # (pageid, title, kind) — deduped, visible
    redirects: DataFrame   # (src_title, dst_pageid)
    edges: DataFrame       # (src, dst) pageids: member -> category
    all_pages: DataFrame | None = None  # incl. disambiguations + redirect srcs

    def _catalog(self) -> DataFrame:
        return self.all_pages if self.all_pages is not None else self.pages

    def get_pageid(self, title: str) -> int | None:
        """Reference ``get_pageid`` (:138-146): a redirect source resolves to
        its TARGET pageid (the reference's _pages excludes redirect sources);
        otherwise the catalog row (page/category/disambiguation)."""
        r = self.redirects.where(F.col("src_title") == title).take(1)
        if r:
            return r[0]["dst_pageid"]
        row = (
            self._catalog().where(F.col("title") == title)
            .select("pageid").take(1)
        )
        return row[0]["pageid"] if row else None

    def get_page(self, pageid: int) -> str | None:
        """Reference ``get_page`` (:131-137): pageid -> title, any kind."""
        row = (
            self._catalog().where(F.col("pageid") == pageid)
            .select("title").take(1)
        )
        return row[0]["title"] if row else None

    def is_redirect(self, title: str) -> bool:
        """Reference ``is_redirect`` (:99-100)."""
        return bool(
            self.redirects.where(F.col("src_title") == title).take(1)
        )

    def is_category(self, title: str) -> bool:
        """Reference ``is_category`` (:104-105)."""
        return bool(
            self._catalog()
            .where((F.col("title") == title) & (F.col("kind") == "category"))
            .take(1)
        )

    def is_disambiguation(self, title: str) -> bool:
        """Reference ``is_disambiguation`` (:101-103): the REDIRECT-RESOLVED
        title is a disambiguation page."""
        resolved = self.redirect(title)
        if resolved is None:
            return False
        return bool(
            self._catalog()
            .where((F.col("title") == resolved)
                   & (F.col("kind") == "disambiguation"))
            .take(1)
        )

    def redirect(self, title: str) -> str | None:
        """Reference ``redirect`` (:119-129): follow a redirect source to its
        target title; non-redirects return themselves."""
        r = self.redirects.where(F.col("src_title") == title).take(1)
        if not r:
            return title
        return self.get_page(r[0]["dst_pageid"])

    def iter_pages(self, redirect: bool = False, disambi: bool = False):
        """Reference ``pages()`` iterator (:106-113): article titles,
        optionally + redirect sources + disambiguations. Iterates the
        VISIBLE pages (redirect sources and disambiguations are excluded
        from the reference's ``_pages``, so the default must not leak
        them)."""
        yield from _iter_col(self.pages.where(F.col("kind") == "page"),
                             "title")
        if redirect:
            yield from _iter_col(self.redirects, "src_title")
        if disambi:
            yield from _iter_col(
                self._catalog().where(F.col("kind") == "disambiguation"),
                "title")

    def categories(self):
        """Reference ``categories()`` iterator (:114-116) — visible
        categories (redirect-source category titles excluded)."""
        yield from _iter_col(self.pages.where(F.col("kind") == "category"),
                             "title")

    def get_categories(self, title: str, distance: int = 1) -> DataFrame:
        """Categories reachable within ``distance`` hops (directed); a
        redirect source starts from its TARGET (reference :147-155 resolves
        via ``redirect`` first — ``get_pageid`` already returns the
        redirect-resolved pageid, so one lookup suffices)."""
        pid = self.get_pageid(title)
        spark = self.pages.sparkSession
        roots = spark.createDataFrame([(pid,)], ["id"])
        hop = d_hop_neighbors(self.edges, roots, d=distance, directed=True)
        return (
            hop.join(self.pages, hop.id == self.pages.pageid)
            .where(F.col("kind") == "category")
            .select("title", "dist")
        )

    def get_neighbors(self, title: str, distance: int = 1) -> DataFrame:
        pid = self.get_pageid(title)
        spark = self.pages.sparkSession
        roots = spark.createDataFrame([(pid,)], ["id"])
        hop = d_hop_neighbors(self.edges, roots, d=distance, directed=False)
        return hop.join(self.pages, hop.id == self.pages.pageid).select(
            "title", "dist"
        )


def build_wikigraph(pages_raw: DataFrame, pageprops: DataFrame,
                    redirects_raw: DataFrame,
                    categorylinks: DataFrame) -> WikiGraph:
    """Inputs (dump-shaped, see ``sources.read_wiki_dump``):

    * pages_raw:     (ns, pageid, title)        ns ∈ {0, 14}
    * pageprops:     (pageid, prop)             hiddencat/noindex/disambiguation
    * redirects_raw: (pageid, target_title)     source pageid → target title
    * categorylinks: (cl_from, cl_to, cl_type)  target title WITHOUT prefix
    """
    props = pageprops.groupBy("pageid").agg(
        F.collect_set("prop").alias("props")
    )
    pages = (
        pages_raw.join(F.broadcast(props), "pageid", "left")
        .withColumn("props", F.coalesce("props", F.array()))
        .where(
            ~F.array_contains("props", "hiddencat")
            & ~F.array_contains("props", "noindex")
        )
        .withColumn(
            "kind",
            F.when(F.array_contains("props", "disambiguation"), "disambiguation")
            .when(F.col("ns") == 14, "category")
            .otherwise("page"),
        )
        .withColumn(
            "title",
            F.when(F.col("ns") == 14, F.concat(F.lit("Category:"), F.col("title")))
            .otherwise(F.col("title")),
        )
        .select("pageid", "title", "kind")
    )

    # category links: cl_to is a category TITLE (no prefix); resolve to id
    cats = pages.where(F.col("kind") == "category").select(
        F.col("pageid").alias("cat_id"),
        F.regexp_replace("title", "^Category:", "").alias("cat_title"),
    )
    member_ids = pages.select(F.col("pageid").alias("member_id"))
    edges = (
        categorylinks.join(F.broadcast(cats),
                           categorylinks.cl_to == cats.cat_title)
        .join(member_ids, categorylinks.cl_from == member_ids.member_id,
              "left_semi")
        .select(F.col("cl_from").alias("src"), F.col("cat_id").alias("dst"))
        .distinct()
    )

    # redirects: source pageid -> source title (from raw pages), target title
    # -> target pageid; one extra hop collapses redirect-of-redirect
    src_titles = pages_raw.select(
        F.col("pageid").alias("rid"),
        F.when(F.col("ns") == 14, F.concat(F.lit("Category:"), F.col("title")))
        .otherwise(F.col("title")).alias("src_title"),
    )
    tgt_ids = pages.select(F.col("title").alias("t"), F.col("pageid").alias("tid"))
    red1 = (
        redirects_raw.join(src_titles, redirects_raw.pageid == src_titles.rid)
        .join(tgt_ids, redirects_raw.target_title == tgt_ids.t, "left")
        .select("src_title", F.col("pageid").alias("src_id"),
                F.col("tid").alias("dst_pageid"))
    )
    # extra hop: if dst is itself a redirect source, follow once
    hop = red1.select(F.col("src_id").alias("h_src"),
                      F.col("dst_pageid").alias("h_dst"))
    redirects = (
        red1.join(F.broadcast(hop), red1.dst_pageid == F.col("h_src"), "left")
        .select(
            "src_title",
            "src_id",
            F.coalesce("h_dst", "dst_pageid").alias("dst_pageid"),
        )
        .where(F.col("dst_pageid").isNotNull())
    )

    # dedup pages: drop redirect sources and disambiguations (J3)
    red_src = redirects.select(F.col("src_id").alias("r"))
    visible = (
        pages.join(F.broadcast(red_src), pages.pageid == F.col("r"), "left_anti")
        .where(F.col("kind") != "disambiguation")
    )
    return WikiGraph(
        pages=visible,
        redirects=redirects.select("src_title", "dst_pageid"),
        edges=edges,
        # full catalog (incl. disambiguations) backs get_page/is_* parity
        all_pages=pages,
    )
