"""Greedy blocking-scheme learning (Michelson & Knoblock, AAAI 2006;
Bilenko et al.'s adaptive blocking family).

Which blocking channels should a linkage pipeline actually run?  The
engine already *audits* channels after the fact (erqc.channel_stats:
pairs, unique recall, gold hits per channel); this operator makes the
*forward* decision: greedy set-cover over a labeled pair sample — each
round picks the channel with the most still-uncovered gold pairs,
tie-broken by fewer new candidate pairs (cheaper) then by name
(deterministic).  The emitted schedule IS the blocking scheme: run the
first k rounds whose marginal gold coverage justifies their candidate
cost.

Greedy is the published approach because exact set-cover is NP-hard and
the greedy (1-1/e) guarantee is tight in practice; with a handful of
channels the loop runs on the driver while every count is a distributed
aggregate.

100-TB shape: per round, per remaining channel, two joins + counts —
``|gold ∩ channel − covered_gold|`` (gold is a small labeled sample —
broadcast) and ``|channel − covered_pairs|`` (anti-join on the capped
candidate streams, the same bounded surfaces every other pair consumer
reads).  Rounds × channels is a small constant; nothing materializes
beyond the counts and the coverage frontier.
"""
from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, functions as F

__all__ = ["greedy_blocking_scheme"]


def _canon(pairs: DataFrame) -> DataFrame:
    return (
        pairs.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .where(F.col("id_a") != F.col("id_b"))
        .distinct()
    )


def greedy_blocking_scheme(
    channels: Mapping[str, DataFrame],
    gold: DataFrame,
    rounds: int | None = None,
) -> DataFrame:
    """(round, channel, new_gold, new_cands, cum_gold, cum_cands) —
    the greedy channel schedule.

    ``channels`` maps channel name → its candidate-pair DataFrame
    (id_a, id_b); ``gold`` is the labeled match-pair sample.  ``rounds``
    defaults to ranking every channel.  Counts are exact; the schedule
    is a total deterministic function of the inputs, so the DuckDB
    oracle replays it round by round.
    """
    spark = gold.sparkSession
    g = _canon(gold)
    chans = {name: _canon(df) for name, df in channels.items()}
    n_rounds = len(chans) if rounds is None else min(rounds, len(chans))
    covered_gold: DataFrame | None = None
    covered: DataFrame | None = None
    remaining = dict(chans)
    out: list[tuple] = []
    cum_gold = cum_cands = 0
    for r in range(1, n_rounds + 1):
        stats = []
        for name, ch in sorted(remaining.items()):
            gc = ch.join(g, ["id_a", "id_b"], "semi")
            if covered_gold is not None:
                gc = gc.join(covered_gold, ["id_a", "id_b"], "anti")
            nc = ch
            if covered is not None:
                nc = nc.join(covered, ["id_a", "id_b"], "anti")
            # one tiny row per channel: two exact counts
            row = gc.agg(F.count("*").alias("g")).crossJoin(
                nc.agg(F.count("*").alias("c"))
            ).collect()[0]
            stats.append((-row["g"], row["c"], name))
        stats.sort()
        neg_g, c, name = stats[0]
        new_gold, new_cands = -neg_g, c
        cum_gold += new_gold
        cum_cands += new_cands
        out.append((r, name, new_gold, new_cands, cum_gold, cum_cands))
        ch = remaining.pop(name)
        gc = ch.join(g, ["id_a", "id_b"], "semi")
        covered_gold = gc if covered_gold is None else (
            covered_gold.unionByName(gc).distinct()
        )
        covered = ch if covered is None else (
            covered.unionByName(ch).distinct()
        )
    return spark.createDataFrame(
        out,
        "round int, channel string, new_gold long, new_cands long,"
        " cum_gold long, cum_cands long",
    )
