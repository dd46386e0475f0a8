"""Windowed token co-occurrence with PMI — distributional statistics
over a corpus (collocation mining, word-vector preprocessing, alias
discovery for ER: surfaces that co-occur with the same contexts).

Shape: the naive formulation self-joins a positional postings table on
(doc, |pos_a - pos_b| ≤ w) — a shuffle carrying one row per token
instance, twice. Here pairs are extracted with NO join at all: for each
offset d in 1..w, zip the token array against itself shifted by d
(``arrays_zip`` over two ``slice``s — constant-folded, whole-stage
codegen), explode once, and count. The only shuffle carries (w1, w2)
pair keys with map-side partial aggregation. The oracle DOES run the
positional self-join — different plan, identical counts.

Array expressions are TOTAL: slice lengths are clamped with
``greatest(0, …)`` so documents shorter than the window can never fault
— Catalyst's InferFiltersFromGenerate clones generator-input expressions
below any ``where()`` guard, so partial expressions WILL be evaluated on
the very rows the guard excluded (re-confirmed live in this repo).

PMI = ln(P(x,y) / (P(x)·P(y))) with P from exact integer counts: the
single float expression ``ln((c_pair·T·T) / (T_pair·c_1·c_2))`` over
exact int64 counts, evaluated in the same operation order by both
engines (IEEE multiply/divide are correctly rounded; ln carries the same
last-ulp-at-a-rounding-boundary caveat as the idf operators — accepted
repo-wide). Pairs are unordered (least/greatest canonical), windows
never cross document boundaries, and ``min_count`` bounds the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .retrieval import _tokens


def token_cooccurrence(df: DataFrame, id_col: str, text_col: str,
                       window: int = 3, min_count: int = 5) -> DataFrame:
    """(w1, w2, c_pair, c_w1, c_w2, pmi): unordered token pairs
    co-occurring within ``window`` positions, with counts and PMI.
    """
    toks = df.select(F.col(id_col).alias("id"),
                     _tokens(F.col(text_col)).alias("ts"))

    # pair extraction, join-free: offset-d zips for d = 1..window
    def shifted(d: int) -> F.Column:
        n = F.greatest(F.lit(0), F.size("ts") - F.lit(d))
        return F.arrays_zip(F.slice("ts", 1, n),
                            F.slice("ts", d + 1, n))

    zipped = F.flatten(F.array(*[shifted(d) for d in range(1, window + 1)]))
    pairs = (toks.select(F.explode(zipped).alias("z"))
             .select(F.least(F.col("z.0"), F.col("z.1")).alias("w1"),
                     F.greatest(F.col("z.0"), F.col("z.1")).alias("w2")))
    c_pair = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c_pair"))
    c_pair = c_pair.where(F.col("c_pair") >= min_count)

    uni = (toks.select(F.explode("ts").alias("w"))
           .groupBy("w").agg(F.count("*").alias("c")))
    totals = (toks.agg(
        F.sum(F.size("ts")).alias("t_tok"),
        F.sum(sum((F.greatest(F.lit(0), F.size("ts") - F.lit(d))
                   for d in range(1, window + 1)),
                  F.lit(0))).alias("t_pair")))

    out = (c_pair
           .join(uni.select(F.col("w").alias("w1"),
                            F.col("c").alias("c_w1")), "w1")
           .join(uni.select(F.col("w").alias("w2"),
                            F.col("c").alias("c_w2")), "w2")
           .crossJoin(F.broadcast(totals)))
    d = "double"
    pmi = F.log(
        (F.col("c_pair").cast(d) * F.col("t_tok").cast(d)
         * F.col("t_tok").cast(d))
        / (F.col("t_pair").cast(d) * F.col("c_w1").cast(d)
           * F.col("c_w2").cast(d)))
    return out.select("w1", "w2", "c_pair", "c_w1", "c_w2",
                      F.round(pmi, 6).alias("pmi"))
