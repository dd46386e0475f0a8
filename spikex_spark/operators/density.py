"""Density-based clustering (DBSCAN, Ester et al., KDD 1996) over a
precomputed epsilon-neighborhood graph.

Transitive closure (``cc.connected_components``) merges everything a
chain of single edges connects — one boilerplate bridge welds two real
entities.  The engine already carries three anti-chaining tools
(mutual-kNN pruning, k-core peeling, giant-entity repair); DBSCAN is the
classic fourth: only *core* records — those with at least ``min_pts``
records in their epsilon-neighborhood — propagate cluster membership,
border records attach without propagating, and thin chains between dense
regions become noise instead of glue.

Determinism: textbook DBSCAN assigns a border point reachable from two
clusters to whichever core point scans it first (order-dependent).  Here
the rule is the minimum cluster id among its core neighbors — a total,
replayable function of the graph, and the only deviation from the paper.

The epsilon graph comes from any of the engine's pair channels
(``simsearch.cosine_near_dups``, MinHash/SimHash buckets, ER scoring);
DBSCAN itself never computes distances.

100-TB shape: degree = one map-side-combinable groupBy over the edge
stream; core-core filtering is two semi-joins against the (small) core
set; components run on the core-core subgraph only — strictly fewer
edges than the input graph, handled by ``cc.connected_components``'s
adaptive small-graph/large-star strategy; border attachment is one join
edge->core-cluster + a min-agg.  No step touches record payloads.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .cc import cluster_assignments

__all__ = ["dbscan_clusters"]

NOISE = -1


def dbscan_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    min_pts: int = 3,
) -> DataFrame:
    """(id, role, cluster_id) — DBSCAN over the given epsilon graph.

    ``pairs`` holds the epsilon-neighborhood edges (one row per
    unordered pair, ``id_a < id_b`` convention not required — duplicates
    and self-loops are dropped defensively).  ``min_pts`` counts the
    point itself, as in the paper: core iff ``|N_eps(p)| >= min_pts``
    with ``p in N_eps(p)``.

    * role = 'core'   — cluster_id = min core id of its core-core
      component (an isolated core is a singleton cluster: itself);
    * role = 'border' — non-core with >=1 core neighbor; cluster_id =
      min cluster id over its core neighbors (deterministic tie rule);
    * role = 'noise'  — everything else; cluster_id = -1.

    Every id of ``all_ids`` appears exactly once.
    """
    e = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count("*").alias("_deg"))
    core = deg.where(F.col("_deg") >= min_pts - 1).select(
        F.col("a").alias("id")
    )
    cc_edges = (
        sym.join(core.withColumnRenamed("id", "a"), "a", "semi")
        .join(core.withColumnRenamed("id", "b"), "b", "semi")
        .where(F.col("a") < F.col("b"))
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    core_cl = cluster_assignments(cc_edges, core, id_col="id")
    border = (
        sym.join(
            core_cl.select(
                F.col("id").alias("b"), F.col("cluster_id").alias("_ccl")
            ),
            "b",
        )
        .groupBy("a")
        .agg(F.min("_ccl").alias("_bcl"))
        .join(core_cl.select(F.col("id").alias("a")), "a", "anti")
        .select(F.col("a").alias("id"), F.col("_bcl").alias("cluster_id"))
    )
    ids = all_ids.select(F.col(id_col).alias("id")).distinct()
    return (
        ids.join(
            core_cl.select("id", F.col("cluster_id").alias("_core_cl")), "id", "left"
        )
        .join(border.select("id", F.col("cluster_id").alias("_bord_cl")), "id", "left")
        .select(
            "id",
            F.when(F.col("_core_cl").isNotNull(), F.lit("core"))
            .when(F.col("_bord_cl").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce("_core_cl", "_bord_cl", F.lit(NOISE)).alias(
                "cluster_id"
            ),
        )
    )
