"""Synchronous label propagation: deterministic community detection.

Communities complement the exact components in ``cc.py``: connected
components answer "transitively linked at all?", label propagation
answers "densely linked together?" — on a web-crawl host graph or an ER
similarity graph a single weak bridge merges two CC clusters, while LPA
keeps the two dense cores apart. This is the Raghavan et al. '07
algorithm in its synchronous, fully deterministic variant (fixed round
count, ties broken by smallest label) — the variant that is both
oracle-checkable and idempotent for lineage gating; async/randomized LPA
trades that for faster convergence we don't need at a fixed R.

Each round is ONE shuffle: votes = edges ⋈ labels (labels table is one
row per node — broadcastable for graphs whose node set fits, hinted
below), then a map-side-combined count per (node, label) and a
row_number pick. R rounds ⇒ R shuffles, no driver round-trips; the
oracle unrolls the same rounds as CTEs (the integer-PageRank recipe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """(id, label): community labels after ``rounds`` synchronous votes.

    ``edges`` must already be undirected (both directions present — use
    ``graph.undirected``). Per round every node adopts the most frequent
    label among its neighbors plus ONE self-vote (the self-vote keeps
    degree-1 chains from flip-flopping), smallest label on ties.
    """
    e = edges.select("src", "dst")
    nodes = e.select(F.col("src").alias("id")).distinct()
    labels = nodes.select("id", F.col("id").alias("label"))
    for r in range(rounds):
        votes = (e.join(labels.withColumnRenamed("id", "src"), "src")
                 .select(F.col("dst").alias("id"), "label")
                 .unionByName(labels))
        counts = votes.groupBy("id", "label").agg(F.count("*").alias("n"))
        win = Window.partitionBy("id").orderBy(
            F.col("n").desc(), F.col("label").asc())
        labels = (counts.withColumn("_rk", F.row_number().over(win))
                  .where(F.col("_rk") == 1).select("id", "label"))
        if r < rounds - 1:
            # cut the lineage so round r+1's join doesn't recompute
            # rounds 0..r (same reason cc.py checkpoints its star rounds)
            labels = labels.localCheckpoint(eager=False)
    return labels


def community_sizes(labels: DataFrame) -> DataFrame:
    """(label, size): rollup of a labeling — giant-community detector."""
    return labels.groupBy("label").agg(F.count("*").alias("size"))
