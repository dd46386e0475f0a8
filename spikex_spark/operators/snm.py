"""Sorted-neighborhood blocking (SNM) — the sort-based candidate channel.

Hash blocking (``blocking.title_keys``/LSH buckets) only pairs records
whose keys collide EXACTLY; sorted-neighborhood (Hernandez & Stolfo,
SIGMOD '95) instead sorts records by a sort key and pairs each record
with its ``window - 1`` successors, so near-miss keys (typos in the
first tokens, truncations) still meet. Multi-pass SNM runs several
passes with differently-built keys and unions the candidate sets —
the standard recall amplifier.

Reference parity: spikex has no SNM (its detector is dictionary-driven,
``wikigraph/wikigraph.py:231-270``); this is part of the
beyond-reference ER toolchain (SURVEY.md §2.11) the blocking stage
feeds from.

Scale shape — the classic SNM hazard is the GLOBAL sort:

* ``global_rank`` never drags the corpus through one partition. It
  range-repartitions on the sort key, ranks within each range, and
  broadcast-joins a driver-side prefix of the ~``num_ranges``
  per-partition counts back — the same two-phase scan as
  ``corpus.pack_sequences`` (one all-data shuffle: the range exchange).
* Neighbor pairing is NOT a window ``lead()`` (which would miss
  cross-partition boundary neighbors) but an equi-join on consecutive
  ranks: each row explodes to its ``window - 1`` successor ranks and
  joins back on the rank — rank values are unique and uniform, so the
  join is skew-free by construction, unlike key-collision blocking.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(df: DataFrame, order_cols: Sequence[str],
                num_ranges: int = 64,
                rank_col: str = "rank") -> DataFrame:
    """Append a 1-based dense global rank over ``order_cols`` without a
    single-partition window.

    ``order_cols`` must be a total order (include a unique id as the last
    tie-breaker) — equal sort keys across range boundaries would
    otherwise make ranks partitioning-dependent. Two-phase: range
    exchange → per-range ``row_number`` → driver prefix of the
    per-range counts (≤ ``num_ranges`` rows, driver-size by design)
    broadcast back.
    """
    cols = [F.col(c) for c in order_cols]
    # checkpoint the range-partitioned frame: the prefix-count collect
    # below forces it anyway, and the final join would otherwise re-run
    # the whole upstream plan (scan + key build) a second time
    part = (df.repartitionByRange(num_ranges, *cols)
            .withColumn("_pid", F.spark_partition_id())
            .localCheckpoint(eager=False))
    # ~num_ranges rows: per-range subtotals ARE driver-size by design
    counts = (part.groupBy("_pid").agg(F.count("*").alias("_n"))
              .orderBy("_pid").collect())
    prefix, acc = [], 0
    for r in counts:
        prefix.append((r["_pid"], acc))
        acc += r["_n"]
    pref_df = F.broadcast(df.sparkSession.createDataFrame(
        prefix, "_pid int, _prefix long"))
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (part.join(pref_df, "_pid")
            .withColumn(rank_col,
                        (F.col("_prefix")
                         + F.row_number().over(w)).cast("long"))
            .drop("_pid", "_prefix"))


def sorted_neighborhood(df: DataFrame, key_exprs: Sequence[Column],
                        id_col: str, window: int = 4,
                        num_ranges: int = 64) -> DataFrame:
    """Multi-pass SNM candidate pairs: ``(id_a, id_b, n_passes)``.

    One pass per expression in ``key_exprs``: rank records by
    (key, id), pair each record with its ``window - 1`` rank
    successors. Pairs are canonicalized to (min, max); ``n_passes``
    counts how many passes proposed the pair (a cheap match-prior —
    multi-pass agreement is evidence, the same intuition meta-blocking
    formalizes as CBS weights).

    Within one pass a pair can appear at most once (each id holds one
    rank), so ``n_passes`` is exactly the number of agreeing passes.
    """
    if window < 2:
        raise ValueError("window must be >= 2")
    passes = []
    for expr in key_exprs:
        keyed = df.select(expr.alias("snm_key"),
                          F.col(id_col).cast("long").alias("id"))
        ranked = global_rank(keyed, ["snm_key", "id"],
                             num_ranges=num_ranges)
        succ = ranked.select(
            F.col("id").alias("id_l"),
            F.explode(F.sequence(
                F.col("rank") + 1,
                F.col("rank") + (window - 1))).alias("rank_r"))
        right = ranked.select(F.col("rank").alias("rank_r"),
                              F.col("id").alias("id_r"))
        passes.append(
            succ.join(right, "rank_r")
            .select(F.least("id_l", "id_r").alias("id_a"),
                    F.greatest("id_l", "id_r").alias("id_b")))
    allp = passes[0]
    for p in passes[1:]:
        allp = allp.unionByName(p)
    return allp.groupBy("id_a", "id_b").agg(
        F.count("*").alias("n_passes"))
