"""Mergeable quantile sketch: deterministic bottom-k hash sampling.

The quantile member of the sketch family (KMV for distincts, HLL for
cardinality, CMS for frequencies): a FIXED-SIZE per-group summary whose
merge is associative, so shard sketches union into the corpus sketch
without re-reading data. The mechanism is the bottom-k hash sample —
rank every row by an md5 of its row id and keep the k smallest ranks per
group. That is a uniform random sample WITHOUT replacement whose
randomness comes from the hash, making it fully deterministic,
bit-reproducible in the DuckDB oracle, and mergeable exactly:
``bottomk(A ∪ B) == bottomk(bottomk(A) ∪ bottomk(B))`` by the same
argument as KMV (the k smallest of a union are among each side's k
smallest). Quantile estimates are order statistics of the sample — no
interpolation, no floating accumulation; the estimate is an actual data
value. Sampling error is the usual ~1/√k; the companion exact order
statistic in the contract query shows it directly.

Scale shape: ranking is a narrow map; the top-k is one window per group
over k·groups rows after a map-side partial (Spark's TakeOrderedAndProject
path for small k); merge is union + the same window. The sample, k rows
per group, broadcasts.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _md5_60


def bottomk_sample(df: DataFrame, group_col: str, id_col: str,
                   value_col: str, k: int = 128) -> DataFrame:
    """(grp, rank, value): the k rows with the smallest md5 row ranks per
    group — the sketch. ``id_col`` must identify rows uniquely (ranks
    tie only if ids collide)."""
    ranked = df.select(
        F.col(group_col).alias("grp"),
        _md5_60(F.col(id_col).cast("string")).alias("rank"),
        F.col(value_col).alias("value"))
    win = Window.partitionBy("grp").orderBy("rank")
    return (ranked.withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") <= k).select("grp", "rank", "value"))


def bottomk_merge(a: DataFrame, b: DataFrame, k: int = 128) -> DataFrame:
    """Union two sketches and re-take the k smallest ranks per group —
    exactly the single-pass sketch of the union (gate-checked)."""
    win = Window.partitionBy("grp").orderBy("rank")
    return (a.unionByName(b).dropDuplicates(["grp", "rank"])
            .withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") <= k).select("grp", "rank", "value"))


def sample_quantiles(sample: DataFrame,
                     qs: Sequence[float] = (0.25, 0.5, 0.75, 0.95)
                     ) -> DataFrame:
    """(grp, q, est, n_sample): order-statistic quantile estimates from a
    bottom-k sample — est is the value at position ceil(q·n) of the
    value-ordered sample (no interpolation; the estimate is a real data
    value, which also makes it type-agnostic)."""
    win = Window.partitionBy("grp").orderBy("value", "rank")
    tot = Window.partitionBy("grp")
    pos = (sample.withColumn("_rn", F.row_number().over(win))
           .withColumn("n_sample", F.count("*").over(tot)))
    qdf = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    picked = (pos.select("grp", "value", "_rn", "n_sample", qdf)
              .where(F.col("_rn")
                     == F.greatest(
                         F.lit(1),
                         F.ceil(F.col("q") * F.col("n_sample")))))
    return picked.select("grp", "q", F.col("value").alias("est"),
                         "n_sample")
