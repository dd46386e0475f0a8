"""Consensus clustering — co-association voting over an ensemble of
clusterings (Fred & Jain, "Combining multiple clusterings using evidence
accumulation", TPAMI 2005), restricted to the blocked candidate pairs.

Every clusterer in this engine has a failure mode: transitive closure
chain-merges, star/HAC can oversplit chains, DBSCAN discards thin
evidence as noise.  The ensemble answer is the classic one: a pair of
records belongs together when a MAJORITY of independent clusterings
co-assign them.  The co-association "matrix" is never materialized —
at 10^12 records it cannot be — instead votes are counted only on the
candidate-pair universe blocking already produced (any pair NO method
could have linked is not recoverable by consensus anyway), which keeps
the operator the same bounded shape as every other pair consumer.

Scale: one broadcast-or-shuffle label join per method per pair side
(label tables are |V| rows), an integer vote sum, then
``cc.cluster_assignments`` over the majority edges.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cc import cluster_assignments

__all__ = ["consensus_clusters", "pair_votes"]


def pair_votes(
    pairs: DataFrame,
    labelings: Sequence[DataFrame],
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """(id_a, id_b, votes) — for each candidate pair, how many of the
    given labelings co-assign its endpoints.  Each labeling is an
    (id, cluster_id) DataFrame (column names exactly those)."""
    out = pairs.select(F.col(id_a).alias("id_a"),
                       F.col(id_b).alias("id_b")).distinct()
    votes = F.lit(0)
    for i, lab in enumerate(labelings):
        la = lab.select(F.col("id").alias("id_a"),
                        F.col("cluster_id").alias(f"_la{i}"))
        lb = lab.select(F.col("id").alias("id_b"),
                        F.col("cluster_id").alias(f"_lb{i}"))
        out = out.join(la, "id_a", "left").join(lb, "id_b", "left")
        votes = votes + F.when(
            F.col(f"_la{i}").isNotNull()
            & (F.col(f"_la{i}") == F.col(f"_lb{i}")), 1).otherwise(0)
    return out.select("id_a", "id_b", votes.cast("int").alias("votes"))


def consensus_clusters(
    pairs: DataFrame,
    labelings: Sequence[DataFrame],
    all_ids: DataFrame,
    id_col: str = "id",
    min_votes: int = 2,
) -> DataFrame:
    """(id, cluster_id) — connected components over the pairs that at
    least ``min_votes`` of the labelings co-assign.  Labels are min
    member ids; singletons keep their own id."""
    v = pair_votes(pairs, labelings)
    edges = (v.where(F.col("votes") >= min_votes)
             .select(F.col("id_a").alias("src"),
                     F.col("id_b").alias("dst")))
    return cluster_assignments(edges, all_ids, id_col=id_col)
