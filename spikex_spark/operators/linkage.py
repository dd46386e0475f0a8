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


# ---------------------------------------------------------------------------
# Unsupervised EM estimation (the Splink-style core): no labeled pairs,
# parameters learned from the agreement-pattern mixture itself.
# ---------------------------------------------------------------------------

_P_SCALE = 1e6     # int64 micro-units for exact posterior sums


def _snap_ratio(num: int, den: int) -> int:
    """Half-up-rounded ``num/den`` in integer micro-units, clamped to
    [1, 999999] — EXACT integer arithmetic (``(2·num·10⁶ + den) // 2den``),
    so parameter snapping never touches a float rounding mode: Python's
    banker's ``round()``, Spark's HALF_UP and DuckDB's half-away would
    otherwise disagree on decimal ties. The clamp keeps every mixture
    branch probability strictly inside (0, 1)."""
    micro = (2 * num * 1_000_000 + den) // (2 * den)
    return min(max(micro, 1), 999_999)


def fs_em(pairs: DataFrame, agree_cols: Sequence[str], rounds: int = 3,
          init_lambda: float = 0.1, init_m: float = 0.9,
          init_u: float = 0.1) -> dict:
    """EM-estimate Fellegi–Sunter parameters with NO labels: treat the
    agreement vectors as a two-component mixture (match / non-match) and
    iterate E (posterior match probability per pair from current
    λ, m_f, u_f) and M (probability-weighted re-estimates).

    Returns ``{"lambda": λ, "m": {field: m}, "u": {field: u}}`` after
    ``rounds`` iterations — driver-size by definition (2·|fields|+1
    scalars), which is why this returns a dict, not a DataFrame
    (``fs_em_params`` / ``fs_em_posteriors`` wrap it relationally).

    Determinism contract (what makes the DuckDB oracle able to replay
    the rounds exactly):

    * parameters are snapped to 6 decimals and clamped to
      [1e-6, 1−1e-6] after every M-step (``_clamp6``) — each E-step
      therefore evaluates a FIXED literal expression tree;
    * posteriors enter the M-step sums as ``round(p·1e6)`` int64
      micro-units, so the sums are exact integers and the re-estimates
      are single exact divisions — float reduction order can never move
      a digit;
    * the mixture weights are plain products of the (≤ fields+1)
      snapped decimals in declaration order — no exp/ln, whose libm
      implementations differ across engines.

    Scale shape: one map-side-combined aggregate per round reduced to
    ONE row (the same shape as ``fs_weights``); the pair table is never
    collected, sorted, or re-shuffled. ``rounds`` is small and fixed —
    this is k scans, not a convergence loop.
    """
    def as6(micro: int) -> float:
        return micro / _P_SCALE       # int/10⁶: identical double both engines

    lam = as6(_snap_ratio(int(round(init_lambda * 1_000_000)), 1_000_000))
    m = {f: as6(_snap_ratio(int(round(init_m * 1_000_000)), 1_000_000))
         for f in agree_cols}
    u = {f: as6(_snap_ratio(int(round(init_u * 1_000_000)), 1_000_000))
         for f in agree_cols}
    for _ in range(rounds):
        w_match = F.lit(lam)
        w_un = F.lit(1.0) - F.lit(lam)
        for f in agree_cols:
            g = F.col(f)
            w_match = w_match * F.when(g, F.lit(m[f])) \
                               .otherwise(F.lit(1.0) - F.lit(m[f]))
            w_un = w_un * F.when(g, F.lit(u[f])) \
                          .otherwise(F.lit(1.0) - F.lit(u[f]))
        p_u = F.round(w_match / (w_match + w_un) * F.lit(_P_SCALE), 0) \
               .cast("long")
        aggs = [F.count("*").alias("_n"), F.sum(p_u).alias("_sp")]
        for f in agree_cols:
            g = F.col(f)
            aggs.append(F.sum(F.when(g, p_u).otherwise(F.lit(0)))
                        .alias(f"_spa_{f}"))
            aggs.append(F.sum(F.when(g, F.lit(int(_P_SCALE)) - p_u)
                              .otherwise(F.lit(0))).alias(f"_sua_{f}"))
        row = pairs.agg(*aggs).collect()[0]
        n, sp = row["_n"], row["_sp"]
        su = n * int(_P_SCALE) - sp
        # λ = sp/(n·10⁶) → micro-units = round(sp/n); m = spa/sp; u = sua/su
        lam = as6(_snap_ratio(sp, n * 1_000_000))
        for f in agree_cols:
            if sp > 0:
                m[f] = as6(_snap_ratio(row[f"_spa_{f}"], sp))
            if su > 0:
                u[f] = as6(_snap_ratio(row[f"_sua_{f}"], su))
    return {"lambda": lam, "m": m, "u": u}


def fs_em_params(pairs: DataFrame, agree_cols: Sequence[str],
                 rounds: int = 3) -> DataFrame:
    """Relational wrapper over :func:`fs_em`: one row per field —
    (field, m, u, lam) — built as literals from the trained dict."""
    est = fs_em(pairs, agree_cols, rounds=rounds)
    spark = pairs.sparkSession
    return spark.createDataFrame(
        [(f, est["m"][f], est["u"][f], est["lambda"]) for f in agree_cols],
        "field string, m double, u double, lam double")


def fs_em_posteriors(pairs: DataFrame, agree_cols: Sequence[str],
                     rounds: int = 3,
                     id_cols: Sequence[str] = ("id_a", "id_b")) -> DataFrame:
    """Per-pair posterior match probability under the EM-trained model:
    (ids..., agreement flags..., p_match) — one extra E-step as a narrow
    map over literal parameters (zero joins, zero shuffles)."""
    est = fs_em(pairs, agree_cols, rounds=rounds)
    w_match = F.lit(est["lambda"])
    w_un = F.lit(1.0) - F.lit(est["lambda"])
    for f in agree_cols:
        g = F.col(f)
        w_match = w_match * F.when(g, F.lit(est["m"][f])) \
                           .otherwise(F.lit(1.0) - F.lit(est["m"][f]))
        w_un = w_un * F.when(g, F.lit(est["u"][f])) \
                      .otherwise(F.lit(1.0) - F.lit(est["u"][f]))
    p = F.round(w_match / (w_match + w_un), 6)
    return pairs.select(*id_cols, *agree_cols, p.alias("p_match"))


# ---------------------------------------------------------------------------
# Term-frequency adjustment (Winkler 1989; Splink's
# term_frequency_adjustments): agreement on a COMMON value is weak
# evidence, agreement on a RARE one is strong. The global u treats
# "both say 'en'" and "both say 'gd'" identically; the TF adjustment
# replaces u for an agreeing pair with the observed relative frequency
# of the agreed VALUE, so w_agree(v) = ln(m / tf_v).
# ---------------------------------------------------------------------------


def tf_table(records: DataFrame, value_col: str) -> DataFrame:
    """(value, cnt, n_total): exact integer term frequencies of
    ``value_col`` over the record table — one map-side-combined groupBy
    plus a one-row total crossJoined on (the nbmodel grand-total-grid
    shape). tf_v is carried as the exact pair (cnt, n_total), never a
    pre-divided float, so downstream weight math is reproducible."""
    cnt = (records.groupBy(F.col(value_col).alias("value"))
           .agg(F.count("*").alias("cnt")))
    tot = records.agg(F.count("*").alias("n_total"))
    return cnt.crossJoin(F.broadcast(tot))


def fs_score_tf(pairs: DataFrame, weights: DataFrame, tf: DataFrame,
                field: str, value_col: str = "value",
                id_cols: Sequence[str] = ("id_a", "id_b")) -> DataFrame:
    """TF-adjusted Fellegi–Sunter score for ONE comparison field.

    ``pairs`` must carry the boolean agreement column ``field`` and a
    ``value_col`` holding the agreed value (NULL when the pair
    disagrees). Agreeing pairs score ``round(ln(m · N / cnt_v)·1e7)``
    — the trained m over the value's own frequency as u — while
    disagreeing pairs keep the global ``w_disagree`` from ``weights``.
    m enters SNAPPED to 6 decimals (exactly as ``fs_weights`` emits it);
    the snap is part of the operator contract, the determinism recipe
    shared with ``fs_em``.

    Scale shape: the weights row and the tf table are broadcast (tf has
    one row per distinct VALUE of the field — languages, surnames,
    cities — small by construction relative to the pair table); scoring
    is a narrow map over the pairs, zero extra shuffles.
    """
    wide = weights.agg(
        F.max(F.when(F.col("field") == field, F.col("m"))).alias("_m"),
        F.max(F.when(F.col("field") == field,
                     F.col("w_disagree"))).alias("_wd"))
    w_tf = F.round(
        F.log(F.col("_m") * F.col("n_total") / F.col("cnt"))
        * F.lit(_W_SCALE), 0).cast("long")
    scored = (pairs.crossJoin(F.broadcast(wide))
              .join(F.broadcast(tf),
                    pairs[value_col] == tf["value"], "left")
              .select(*id_cols, F.col(field),
                      pairs[value_col].alias(value_col),
                      F.when(F.col(field), w_tf).otherwise(F.col("_wd"))
                       .alias("fs_tf_scaled")))
    return scored.withColumn(
        "fs_tf_score", F.col("fs_tf_scaled") / F.lit(_W_SCALE))


def fs_decide(scored: DataFrame, upper: float, lower: float,
              score_col: str = "fs_score") -> DataFrame:
    """The Fellegi–Sunter THREE-WAY decision the 1969 paper actually
    defines: score ≥ ``upper`` ⇒ 'link', ≤ ``lower`` ⇒ 'nonlink',
    between ⇒ 'possible' — the clerical-review band a production
    linkage system routes to humans (or to a costlier scorer) instead
    of forcing a binary call. A pure narrow map over the scored pairs."""
    d = (F.when(F.col(score_col) >= F.lit(upper), F.lit("link"))
         .when(F.col(score_col) <= F.lit(lower), F.lit("nonlink"))
         .otherwise(F.lit("possible")))
    return scored.withColumn("decision", d)


# ---------------------------------------------------------------------------
# Multi-level comparisons (Splink's "comparison levels"): the gamma of
# the 1969 paper is categorical, not binary — 'exact match' / 'close' /
# 'different' carry different evidence, and collapsing them to one bit
# throws the middle level's signal away.
# ---------------------------------------------------------------------------


def fs_weights_levels(pairs: DataFrame, match_col: str,
                      level_cols: dict) -> DataFrame:
    """(field, level, m, u, w): per-field per-level Fellegi–Sunter
    parameters from self-labeled pairs. ``level_cols`` maps each level
    column name to its number of levels L (values must be 0..L-1);
    ``m_l = P(gamma=l | match)`` with Laplace add-one smoothing over the
    L categories, ``w = round(ln(m_l/u_l)·1e7)`` int64-scaled. ONE
    map-side-combined aggregate reduced to one row, like fs_weights."""
    match = F.col(match_col)
    aggs = [
        F.count(F.when(match, 1)).alias("_nm"),
        F.count(F.when(~match, 1)).alias("_nu"),
    ]
    for f, n_levels in level_cols.items():
        for lv in range(n_levels):
            sel = F.col(f) == lv
            aggs.append(F.count(F.when(match & sel, 1))
                        .alias(f"_am_{f}_{lv}"))
            aggs.append(F.count(F.when(~match & sel, 1))
                        .alias(f"_au_{f}_{lv}"))
    one = pairs.agg(*aggs)

    rows = []
    for f, n_levels in level_cols.items():
        for lv in range(n_levels):
            m = ((F.col(f"_am_{f}_{lv}") + 1)
                 / (F.col("_nm") + F.lit(n_levels)))
            u = ((F.col(f"_au_{f}_{lv}") + 1)
                 / (F.col("_nu") + F.lit(n_levels)))
            rows.append(F.struct(
                F.lit(f).alias("field"),
                F.lit(lv).alias("level"),
                F.round(m, 6).alias("m"),
                F.round(u, 6).alias("u"),
                F.round(F.log(m / u) * F.lit(_W_SCALE), 0).cast("long")
                 .alias("w"),
            ))
    return (one.select(F.explode(F.array(*rows)).alias("r"))
            .select("r.field", "r.level", "r.m", "r.u", "r.w"))


def fs_score_levels(pairs: DataFrame, weights: DataFrame,
                    level_cols: dict,
                    id_cols: Sequence[str] = ("id_a", "id_b")) -> DataFrame:
    """Score pairs with multi-level weights: ids + level columns +
    (fs_scaled, fs_score). The weights table (Σ levels rows) is pivoted
    to ONE broadcast row; the per-pair sum is a CASE chain over the
    observed levels — a pure narrow map, exact int64 arithmetic."""
    wide_aggs = []
    for f, n_levels in level_cols.items():
        for lv in range(n_levels):
            sel = (F.col("field") == f) & (F.col("level") == lv)
            wide_aggs.append(
                F.max(F.when(sel, F.col("w"))).alias(f"_w_{f}_{lv}"))
    wide = weights.agg(*wide_aggs)
    total = None
    for f, n_levels in level_cols.items():
        term = None
        for lv in range(n_levels):
            cond = F.col(f) == lv
            branch = F.col(f"_w_{f}_{lv}")
            term = (F.when(cond, branch) if term is None
                    else term.when(cond, branch))
        total = term if total is None else total + term
    return (pairs.crossJoin(F.broadcast(wide))
            .select(*id_cols, *level_cols.keys(),
                    total.cast("long").alias("fs_scaled"),
                    (total.cast("long") / F.lit(_W_SCALE))
                    .alias("fs_score")))


def waterfall_pairs(det_pairs: DataFrame, prob_pairs: DataFrame,
                    id_cols: Sequence[str] = ("id_a", "id_b")) -> DataFrame:
    """(id_a, id_b, method): the MDM match waterfall — deterministic
    rules first, the probabilistic model only where they were silent.
    Pass-1 pairs (exact key agreement: same url, same normalized text)
    are authoritative and cheap; pass-2 pairs are kept only if not
    already matched in pass 1 (canonicalized least/greatest, one
    anti-join). The standard production shape: every pair the rules can
    settle never pays for scoring review downstream."""
    a, b = id_cols

    def _canon(df: DataFrame) -> DataFrame:
        return df.select(
            F.least(F.col(a), F.col(b)).alias(a),
            F.greatest(F.col(a), F.col(b)).alias(b)).distinct()

    det = _canon(det_pairs)
    prob = _canon(prob_pairs).join(det, [a, b], "left_anti")
    return (det.withColumn("method", F.lit("deterministic"))
            .unionByName(prob.withColumn("method", F.lit("probabilistic"))))


def logistic_train(feat: DataFrame, feature_cols: Sequence[str],
                   label_col: str = "y", rounds: int = 5) -> list:
    """Train a logistic-regression matcher IN the engine: full-batch
    gradient descent (lr = 1) over the pair feature matrix, the
    learned-matcher step after ``er_pair_features`` (Splink's "train a
    model on labeled pairs" stage, here as k deterministic scans).

    Returns ``[(name, w_micro)]`` — bias first — where weights live on
    the 1e-6 integer grid. Determinism contract (same discipline as
    :func:`fs_em`):

    * features and labels enter as 1e-6 micro-ints
      (``floor(x·1e6 + 0.5)``), so per-pair gradient terms
      ``(p_micro − y_micro) · f_micro`` are EXACT integers and the
      gradient sums are decimal(38,0) — reduction order can't move a
      digit;
    * the sigmoid is evaluated on grid doubles and immediately
      re-snapped to micro-ints; a 1-ulp libm ``exp`` divergence moves
      the snap only when p·1e6 lands within ~1e-10 of a boundary;
    * every rounding is ``floor(x + 0.5)`` in BOTH engines — Python's
      banker's ``round`` and SQL's half-away ``round`` disagree on
      exact ties, ``floor(x+0.5)`` never does;
    * weight updates subtract ``floor(S/(n·1e6) + 0.5)`` micro-units,
      so each round's weights are integers and the next round's z is
      a FIXED literal expression tree.

    Scale shape: one map-side-combined aggregate per round reduced to
    one row (weights are 1+|features| scalars — driver-size by
    definition); the pair table is scanned k times, never collected.
    Callers should checkpoint ``feat`` first when it is derived from
    an expensive chain.
    """
    import math

    names = ["bias"] + list(feature_cols)
    micro = {c: F.floor(F.col(c) * F.lit(1000000.0) + F.lit(0.5))
             .cast("long").alias(f"_m_{c}")
             for c in [label_col, *feature_cols]}
    fm = feat.select(*micro.values())
    w = [0] * len(names)                      # micro-int weights
    for _ in range(rounds):
        z = F.lit(w[0] / 1e6)
        for j, c in enumerate(feature_cols, start=1):
            z = z + F.lit(w[j] / 1e6) * (F.col(f"_m_{c}")
                                         / F.lit(1000000.0))
        pm = F.floor(F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
                     * F.lit(1000000.0) + F.lit(0.5)).cast("long")
        d = (pm - F.col(f"_m_{label_col}"))
        aggs = [F.count(F.lit(1)).alias("n"),
                F.sum((d * F.lit(1000000)).cast("decimal(38,0)"))
                .alias("s0")]
        aggs += [F.sum((d * F.col(f"_m_{c}")).cast("decimal(38,0)"))
                 .alias(f"s{j}")
                 for j, c in enumerate(feature_cols, start=1)]
        row = fm.agg(*aggs).collect()[0]
        n = row["n"]
        for j in range(len(names)):
            w[j] -= math.floor(float(row[f"s{j}"]) / (n * 1e6) + 0.5)
    return list(zip(names, w))


def logistic_contributions(feat: DataFrame, weights,
                           feature_cols: Sequence[str],
                           id_cols: Sequence[str] = ("id_a", "id_b"),
                           ) -> DataFrame:
    """(ids..., feature, f_micro, w_micro, contrib_p12) — exact additive
    decomposition of the matcher's logit: for a LINEAR model the Shapley
    attribution of feature j IS ``w_j·x_j`` (no sampling, no
    approximation), so ``z = Σ contrib_p12 / 1e12`` reconstructs the
    score bit-for-bit.  The clerical-review explanation row: WHY did the
    matcher call this pair a match — which similarity carried it, which
    arg against it.  All int64 (micro·micro = pico units); one narrow
    map + explode, zero shuffles."""
    w = dict(weights)
    entries = [F.struct(
        F.lit("bias").alias("feature"),
        F.lit(1_000_000).cast("long").alias("f_micro"),
        F.lit(int(w["bias"])).cast("long").alias("w_micro"))]
    for c in feature_cols:
        fm = F.floor(F.col(c) * F.lit(1000000.0)
                     + F.lit(0.5)).cast("long")
        entries.append(F.struct(
            F.lit(c).alias("feature"), fm.alias("f_micro"),
            F.lit(int(w[c])).cast("long").alias("w_micro")))
    return (feat.select(*id_cols, F.explode(F.array(*entries)).alias("e"))
            .select(*id_cols, "e.feature", "e.f_micro", "e.w_micro",
                    (F.col("e.w_micro") * F.col("e.f_micro"))
                    .cast("long").alias("contrib_p12")))


def logistic_score(feat: DataFrame, weights, feature_cols: Sequence[str],
                   id_cols: Sequence[str] = ("id_a", "id_b")) -> DataFrame:
    """Apply a :func:`logistic_train` model: (ids..., p_micro, p_match)
    as ONE narrow map over literal weights — the inference twin of the
    trainer, with the identical micro-grid snapping so the oracle
    reproduces every probability digit. Zero joins, zero shuffles."""
    w = dict(weights)
    z = F.lit(w["bias"] / 1e6)
    for c in feature_cols:
        fm = F.floor(F.col(c) * F.lit(1000000.0)
                     + F.lit(0.5)).cast("long")
        z = z + F.lit(w[c] / 1e6) * (fm / F.lit(1000000.0))
    pm = F.floor(F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
                 * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return feat.select(*id_cols, pm.alias("p_micro"),
                       (pm / F.lit(1000000.0)).alias("p_match"))
