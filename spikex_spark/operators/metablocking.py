"""Meta-blocking — re-weight and prune a redundancy-positive block
collection before the quadratic scoring stage.

Overlapping block collections (LSH bands, multi-pass SNM, token
blocking) are *redundancy-positive*: the more blocks two records share,
the likelier they match. Meta-blocking (Papadakis et al., TKDE 2014)
exploits that: build the implicit pair graph, weight each candidate
pair by its co-occurrence evidence, and prune low-weight pairs — the
cheap recall/precision dial between blocking and scoring.

Implemented scheme: CBS weighting (Common Blocks Scheme — the count of
shared blocks) with Weighted Edge Pruning (keep pairs with weight ≥ the
global mean weight), preceded by *block purging* (drop blocks larger
than ``max_block_size`` outright — a hub/boilerplate guard; unlike
``blocking.cap_blocks`` this drops the whole block, because an
oversize block's CBS evidence is noise, not signal, while a capped
sample of it would still vote).

Reference parity: beyond-reference ER toolchain (SURVEY.md §2.11);
spikex's dictionary detector has no notion of block weighting.

Scale shape: one window count for purging (same exchange as the pair
join's build side), the per-block self-join bounded by
``max_block_size``², one map-side-combined groupBy for CBS, and a
SCALAR aggregate for the mean — the pruning comparison is pure integer
math (``cbs · n_pairs ≥ Σcbs``), so the DuckDB oracle reproduces it
bit-for-bit with no float-threshold edge cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def purge_blocks(blocks: DataFrame, block_col: str = "block_id",
                 id_col: str = "id",
                 max_block_size: int = 1000) -> DataFrame:
    """Drop every block with more than ``max_block_size`` members."""
    w = Window.partitionBy(block_col)
    return (blocks.withColumn("_bn", F.count("*").over(w))
            .where(F.col("_bn") <= max_block_size)
            .drop("_bn"))


def cbs_pairs(blocks: DataFrame, block_col: str = "block_id",
              id_col: str = "id",
              max_block_size: int = 1000) -> DataFrame:
    """``(id_a, id_b, cbs)`` — candidate pairs weighted by the number of
    blocks they co-occur in, after block purging."""
    b = purge_blocks(blocks, block_col, id_col, max_block_size)
    left = b.select(F.col(block_col).alias("_blk"),
                    F.col(id_col).alias("id_a"))
    right = b.select(F.col(block_col).alias("_blk"),
                     F.col(id_col).alias("id_b"))
    return (left.join(right, "_blk")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("cbs")))


def wep_prune(pairs: DataFrame, weight_col: str = "cbs") -> DataFrame:
    """Weighted Edge Pruning: keep pairs whose weight is ≥ the global
    mean weight. The comparison is exact integer arithmetic
    (``w · n ≥ Σw``), never a float mean."""
    stats = pairs.agg(
        F.count("*").alias("_n"),
        F.sum(F.col(weight_col)).alias("_sum"))
    return (pairs.crossJoin(F.broadcast(stats))
            .where(F.col(weight_col) * F.col("_n") >= F.col("_sum"))
            .drop("_n", "_sum"))


def meta_block_pairs(blocks: DataFrame, block_col: str = "block_id",
                     id_col: str = "id",
                     max_block_size: int = 1000) -> DataFrame:
    """Full CBS + WEP meta-blocking pass over a block collection."""
    return wep_prune(cbs_pairs(blocks, block_col, id_col,
                               max_block_size))


def blocking_cost(channels: dict, cap: int = 50) -> DataFrame:
    """Comparison-budget planner: how many pairwise comparisons each
    blocking channel will generate, BEFORE materializing a single pair
    — the number that decides whether a blocking config is even
    runnable at 10^12 documents, and what the per-block cap buys.

    ``channels`` maps name → keyed DataFrame with a ``key`` column
    (one row per record occurrence). Per channel: (channel, n_blocks,
    n_keyed_rows, pairs_uncapped, pairs_capped, cap_savings) where
    pairs = Σ s(s−1)/2 over block sizes s and the capped variant
    replaces s with min(s, cap) — all integer `div` arithmetic, one
    rounded division for the savings fraction.

    Scale shape: one map-side-combined groupBy per channel onto block
    sizes, then a scalar aggregate — the cost of PLANNING is one scan
    per channel, never a pair expansion.
    """
    out = None
    for name in sorted(channels):
        sz = channels[name].groupBy("key").agg(F.count("*").alias("s"))
        pairs = F.sum(F.expr("s * (s - 1) div 2"))
        capped = F.sum(F.expr(
            f"least(s, {cap}) * (least(s, {cap}) - 1) div 2"))
        row = (sz.agg(F.count("*").alias("n_blocks"),
                      F.sum("s").alias("n_keyed_rows"),
                      pairs.alias("pairs_uncapped"),
                      capped.alias("pairs_capped"))
               .select(F.lit(name).alias("channel"),
                       "n_blocks", "n_keyed_rows",
                       "pairs_uncapped", "pairs_capped",
                       F.round(F.when(
                           F.col("pairs_uncapped") > 0,
                           1 - F.col("pairs_capped")
                           / F.col("pairs_uncapped"))
                           .otherwise(F.lit(0.0)), 6)
                        .alias("cap_savings")))
        out = row if out is None else out.unionByName(row)
    return out
