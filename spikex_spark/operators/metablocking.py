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
