"""One-to-one record linkage: distributed mutual-best (symmetric greedy)
matching over a scored candidate-pair table.

Transitive clustering (``cc.py``) answers many-to-many dedup; record
LINKAGE between two authorities (each entity appears at most once per
side, or once overall) needs a matching instead — the one-to-one
assumption in the Fellegi–Sunter literature. Sequential greedy matching
(sort all pairs by score, take while unmatched) is inherently serial;
the distributed classic is mutual-best rounds (a.k.a. symmetric
best-match, the same local-max idea as Borůvka merges): every node
points at its best-scored partner, pairs that point at EACH OTHER are
matched and their nodes retired, and the next round re-points among
survivors. Every round is deterministic (score desc, partner-id asc
tie-break), so a fixed round count is oracle-replayable as unrolled
CTEs — and each round removes every pair that is a local maximum of the
score landscape, so a handful of rounds matches everything a sequential
greedy would except score-chain tails (bounded by rounds, reported via
the ``match_round`` column).

Shape per round: symmetrize (narrow), one argmax window per node, one
self-join on the best-edge table (size ≤ nodes), two anti-joins to
retire matched nodes. No driver round-trips; ``localCheckpoint`` cuts
the per-round lineage like ``cc.py`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mutual_best_match(pairs: DataFrame, rounds: int = 3,
                      id_a: str = "id_a", id_b: str = "id_b",
                      score: str = "score") -> DataFrame:
    """(id_a, id_b, score, match_round): one-to-one matches after ``rounds``
    mutual-best rounds; every id appears at most once in the output.
    """
    sym = (pairs.select(F.col(id_a).alias("node"),
                        F.col(id_b).alias("partner"),
                        F.col(score).alias("s"))
           .unionByName(pairs.select(
               F.col(id_b).alias("node"),
               F.col(id_a).alias("partner"),
               F.col(score).alias("s")))
           # cut the upstream lineage ONCE: the input is often the tail
           # of an expensive scoring pipeline, and each round's window +
           # anti-join would otherwise re-trigger that whole chain
           # (observed: the ER pair chain re-ran per round)
           .localCheckpoint(eager=True))
    win = Window.partitionBy("node").orderBy(
        F.col("s").desc(), F.col("partner").asc())
    out = None
    active = sym
    for r in range(1, rounds + 1):
        best = (active.withColumn("_rk", F.row_number().over(win))
                .where(F.col("_rk") == 1)
                .select("node", "partner", "s"))
        b2 = best.select(F.col("node").alias("p2"),
                         F.col("partner").alias("n2"))
        matched = (best.join(b2, (best.partner == b2.p2)
                             & (best.node == b2.n2))
                   .where(F.col("node") < F.col("partner"))
                   .select(F.col("node").alias("id_a"),
                           F.col("partner").alias("id_b"),
                           F.col("s").alias("score"))
                   .withColumn("match_round", F.lit(r)))
        out = matched if out is None else out.unionByName(matched)
        if r < rounds:
            taken = (matched.select(F.col("id_a").alias("node"))
                     .unionByName(matched.select(
                         F.col("id_b").alias("node"))))
            active = (active.join(taken, "node", "left_anti")
                      .join(taken.withColumnRenamed("node", "partner"),
                            "partner", "left_anti")
                      .localCheckpoint(eager=True))
    return out
