"""Star clustering over a match graph, in fixed synchronous rounds.

The star family (Aslam, Pelekhov & Rus, JGAA 2004; evaluated for
duplicate detection by Hassanzadeh & Miller, VLDB J. 2009) covers the
graph with "stars": high-degree centers plus their neighbors as
satellites.  Against transitive closure it never chain-merges (a
satellite joins exactly one center); against correlation clustering it
is cheaper (no pivot rounds over edges) and the cluster REPRESENTATIVE
(the center) falls out of the definition — entity-resolution output
wants exactly that shape.

The textbook algorithm is sequential (repeatedly take the
highest-degree uncovered vertex).  The distributed formulation here
runs synchronous rounds over the UNCOVERED subgraph: a vertex becomes a
center when it is the (degree, -id)-maximum among its uncovered
neighborhood (degrees are static, computed once on the full graph — the
offline-star convention); every uncovered vertex adjacent to a center
joins its best center by the same order.  Local maxima are independent,
so a round commits in parallel; R rounds cover everything but
degenerate chains, and leftovers close as singletons — making the
result a total deterministic function of the graph that the DuckDB
oracle replays round by round.

100-TB shape: one static degree groupBy; per round one semi-join to the
uncovered set, one neighborhood max (map-side combinable), one center
join — all on the match-edge table, which blocking has already bounded.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["star_clusters"]


def star_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    rounds: int = 3,
) -> DataFrame:
    """(id, center_id, is_center, round) — star cover of the match graph.

    ``round`` is the 1-based round the vertex was covered in; leftovers
    after ``rounds`` rounds and isolated vertices close as singleton
    centers with ``round = 0``.
    """
    e = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"),
                F.greatest("a", "b").alias("b"))
        .distinct()
    )
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=False)
    deg = sym.groupBy("a").agg(F.count("*").alias("d")).localCheckpoint(
        eager=False)
    # (a, b, da, db): every directed edge with both static degrees
    adj = (
        sym.join(deg.withColumnsRenamed({"a": "a", "d": "da"}), "a")
        .join(deg.select(F.col("a").alias("b"), F.col("d").alias("db")),
              "b")
        .localCheckpoint(eager=False)
    )
    uncovered = deg.select("a")  # isolated ids never enter the graph
    assigned = None
    for r in range(1, rounds + 1):
        live = (
            adj.join(uncovered, "a", "semi")
            .join(uncovered.withColumnRenamed("a", "b"), "b", "semi")
        )
        # neighborhood maximum over the LIVE subgraph, by (degree, -id)
        nmax = live.groupBy("a").agg(
            F.max(F.struct(F.col("db").alias("d"),
                           (-F.col("b")).alias("nid"))).alias("m"))
        centers = (
            nmax.join(deg, "a")
            .where(
                (F.col("d") > F.col("m.d"))
                | ((F.col("d") == F.col("m.d"))
                   & (-F.col("a") > F.col("m.nid")))
            )
            .select("a")
        )
        # satellites: live vertices adjacent to >=1 center; best center
        # by the same (degree, -id) order
        sat = (
            live.join(centers.withColumnRenamed("a", "b"), "b", "semi")
            .join(centers, "a", "anti")
            .groupBy("a")
            .agg(F.max(F.struct(F.col("db").alias("d"),
                                (-F.col("b")).alias("nid"))).alias("m"))
            .select("a", (-F.col("m.nid")).alias("center_id"))
        )
        got = (
            centers.select("a", F.col("a").alias("center_id"),
                           F.lit(1).alias("is_center"))
            .unionByName(sat.select("a", "center_id",
                                    F.lit(0).alias("is_center")))
            .withColumn("round", F.lit(r))
            .localCheckpoint(eager=False)
        )
        assigned = got if assigned is None else assigned.unionByName(got)
        uncovered = uncovered.join(got.select("a"), "a", "anti")
        uncovered = uncovered.localCheckpoint(eager=False)
    ids = all_ids.select(F.col(id_col).alias("a")).distinct()
    leftover = (ids if assigned is None
                else ids.join(assigned.select("a"), "a", "anti"))
    out = leftover.select(
        "a", F.col("a").alias("center_id"),
        F.lit(1).alias("is_center"), F.lit(0).alias("round"))
    if assigned is not None:
        out = assigned.unionByName(out)
    return out.select(
        F.col("a").alias("id"), "center_id",
        F.col("is_center").cast("int").alias("is_center"),
        F.col("round").cast("int").alias("round"))
