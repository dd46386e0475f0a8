"""Average-linkage agglomerative clustering in synchronous mutual-best
rounds — the HAC member of the engine's clusterer family.

The duplicate-detection literature's standard comparison set (see
Hassanzadeh & Miller, VLDB J. 2009) is: transitive closure (cc.py),
center/star clustering, correlation clustering (corrclust.py), and
agglomerative average-linkage.  Sequential HAC (merge ONE globally-best
pair per step) is unparallelizable; the distributed formulation here
merges EVERY mutually-best cluster pair per round (the same
locally-dominant-edge device as matching.mutual_best_match, lifted from
records to clusters), recomputing average linkage between rounds.
Mutual-best pairs form a matching, so simultaneous merges never
conflict; a fixed round count makes the result a total deterministic
function of the input that the DuckDB oracle replays round by round.

Linkage is the average of OBSERVED pair scores between two clusters
(missing pairs are absent evidence, not zeros — the blocked-ER setting
never scores all pairs).  Ordering discipline: per-cluster best
neighbors are ranked by IEEE double ``sum/count`` (both engines divide
the same exact int64s, so they agree bit-for-bit), tie-broken by
neighbor label; the merge threshold is exact integer arithmetic
(``sum_e4 >= min_score_e4 * count``).

100-TB shape: each round is one labels join + one cluster-pair groupBy +
a per-cluster top-1 window (partitioned by cluster, never global) + a
broadcast-size merge map; rounds are a small constant.  No driver-side
loops over data.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hac_clusters"]


def hac_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str = "id",
    score_col: str = "score",
    rounds: int = 3,
    min_score: float = 0.80,
) -> DataFrame:
    """(id, cluster_id) after ``rounds`` mutual-best average-linkage
    merge rounds over the scored pairs (id_a, id_b, score).

    Scores are snapped to e4 ints (the engine's score precision) so
    linkage sums are exact; cluster labels are min member ids.
    """
    min_e4 = int(round(min_score * 10_000))
    labels = all_ids.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("cluster_id")
    )
    # localCheckpoint: without it every round's labels join re-derives the
    # whole upstream scoring chain and the plan doubles per round (the
    # cc.py large-star lesson) — pairs once, labels once per round
    p = pairs.select(
        F.col("id_a"), F.col("id_b"),
        F.round(F.col(score_col) * 10_000, 0).cast("long").alias("s_e4"),
    ).where(F.col("id_a") != F.col("id_b")).localCheckpoint()
    for _ in range(rounds):
        e = (
            p.join(labels.withColumnsRenamed(
                {"id": "id_a", "cluster_id": "la"}), "id_a")
            .join(labels.withColumnsRenamed(
                {"id": "id_b", "cluster_id": "lb"}), "id_b")
            .where(F.col("la") != F.col("lb"))
            .select(
                F.least("la", "lb").alias("ca"),
                F.greatest("la", "lb").alias("cb"),
                "s_e4",
            )
        )
        cl = e.groupBy("ca", "cb").agg(
            F.sum("s_e4").alias("s"), F.count("*").alias("c")
        ).where(F.col("s") >= F.lit(min_e4) * F.col("c"))
        sym = cl.select(
            F.col("ca").alias("src"), F.col("cb").alias("dst"), "s", "c"
        ).unionByName(cl.select(
            F.col("cb").alias("src"), F.col("ca").alias("dst"), "s", "c"
        ))
        w = Window.partitionBy("src").orderBy(
            (F.col("s").cast("double") / F.col("c").cast("double")).desc(),
            F.col("dst").asc(),
        )
        best = (sym.withColumn("_rk", F.row_number().over(w))
                .where(F.col("_rk") == 1).select("src", "dst"))
        mutual = (
            best.alias("x")
            .join(best.alias("y"),
                  (F.col("x.dst") == F.col("y.src"))
                  & (F.col("y.dst") == F.col("x.src")))
            .where(F.col("x.src") < F.col("x.dst"))
            .select(F.col("x.src").alias("keep"),
                    F.col("x.dst").alias("gone"))
        )
        labels = (
            labels.join(
                F.broadcast(mutual.withColumnRenamed("gone", "cluster_id")),
                "cluster_id", "left")
            .select(
                "id",
                F.coalesce("keep", "cluster_id").alias("cluster_id"),
            )
            .localCheckpoint()
        )
    return labels
