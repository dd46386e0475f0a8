"""Fellegi–Sunter probabilistic record linkage, relationally.

The classical ER decision model (Fellegi & Sunter 1969): for each
comparison field f, estimate

* ``m_f`` — P(field agrees | pair is a match)
* ``u_f`` — P(field agrees | pair is a non-match)

and score a pair by summing per-field log-likelihood ratios:
``ln(m/u)`` when the field agrees, ``ln((1-m)/(1-u))`` when it doesn't.
High total ⇒ link, low ⇒ non-link, middle ⇒ clerical review.

This implementation is count-based (supervised / self-labeled training
pairs), not EM: parameter estimation is ONE aggregate over the training
pairs — counts only, no iteration, no driver-side math. Weights are
int64-scaled (×1e7) before the per-pair sum, so scores are exact integer
arithmetic (the repo's BM25/LM determinism recipe) and the whole model
is reproducible bit-for-bit in the DuckDB oracle.

Scale shape: ``fs_weights`` is one map-side-combined aggregate reduced
to ONE row regardless of pair count; ``fs_score`` broadcasts that row
and scores pairs in a narrow map — zero shuffles beyond what produced
the candidate pairs. Add-one smoothing keeps ln() finite when a field
never (dis)agrees within a class.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_W_SCALE = 1e7


def fs_weights(pairs: DataFrame, match_col: str,
               agree_cols: Sequence[str]) -> DataFrame:
    """(field, m, u, w_agree, w_disagree): per-field match/unmatch
    agreement probabilities (add-one smoothed, rounded to 6) and
    int64-scaled log-likelihood weights."""
    match = F.col(match_col)
    aggs = [
        F.count(F.when(match, 1)).alias("_nm"),
        F.count(F.when(~match, 1)).alias("_nu"),
    ]
    for f in agree_cols:
        a = F.col(f)
        aggs.append(F.count(F.when(match & a, 1)).alias(f"_am_{f}"))
        aggs.append(F.count(F.when(~match & a, 1)).alias(f"_au_{f}"))
    one = pairs.agg(*aggs)

    def w(x: F.Column) -> F.Column:
        return F.round(F.log(x) * F.lit(_W_SCALE), 0).cast("long")

    rows = []
    for f in agree_cols:
        m = (F.col(f"_am_{f}") + 1) / (F.col("_nm") + 2)
        u = (F.col(f"_au_{f}") + 1) / (F.col("_nu") + 2)
        rows.append(F.struct(
            F.lit(f).alias("field"),
            F.round(m, 6).alias("m"),
            F.round(u, 6).alias("u"),
            w(m / u).alias("w_agree"),
            w((1 - m) / (1 - u)).alias("w_disagree"),
        ))
    return (one.select(F.explode(F.array(*rows)).alias("r"))
            .select("r.field", "r.m", "r.u", "r.w_agree", "r.w_disagree"))


def fs_score(pairs: DataFrame, weights: DataFrame,
             agree_cols: Sequence[str],
             id_cols: Sequence[str] = ("id_a", "id_b")) -> DataFrame:
    """Score pairs with trained weights: ids + agreement flags +
    (fs_scaled, fs_score). The weights table (|fields| rows) is pivoted
    to ONE row and broadcast — scoring is a narrow map."""
    wide_aggs = []
    for f in agree_cols:
        sel = F.col("field") == f
        wide_aggs.append(
            F.max(F.when(sel, F.col("w_agree"))).alias(f"_wa_{f}"))
        wide_aggs.append(
            F.max(F.when(sel, F.col("w_disagree"))).alias(f"_wd_{f}"))
    wide = weights.agg(*wide_aggs)
    total = None
    for f in agree_cols:
        term = F.when(F.col(f), F.col(f"_wa_{f}")).otherwise(F.col(f"_wd_{f}"))
        total = term if total is None else total + term
    return (pairs.crossJoin(F.broadcast(wide))
            .select(*id_cols, *agree_cols,
                    total.cast("long").alias("fs_scaled"),
                    (total.cast("long") / F.lit(_W_SCALE))
                    .alias("fs_score")))
