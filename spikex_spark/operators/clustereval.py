"""Clustering-vs-clustering evaluation: B-cubed and Adjusted Rand Index.

``evaluation.pair_metrics`` scores a PAIR set; these two score a
CLUSTERING directly, which is how the ER literature actually reports
quality (Bagga & Baldwin '98 B-cubed; Hubert & Arabie '85 ARI). At corpus
scale both reduce to the (pred_cluster × gold_cluster) contingency table —
one groupBy over the item join, never a pair materialization, so a 10^9-item
clustering is scored with two shuffles.

Determinism contract (same recipe as the integer PageRank / FS-LLR):
float sums over many cells are reduction-order-dependent, so every
accumulated quantity here is an int64 (fixed-point for B-cubed, exact
binomial counts for ARI); the only float ops are single divisions of two
already-exact integers at the very end, which every engine rounds
identically. That is what lets the DuckDB oracle hash-match every digit.

Overflow bounds (documented, not checked): B-cubed's per-cluster term is
``Σ_g n_pg² · 10^9`` which fits int64 while the largest cluster is under
~3M members — a 3M-duplicate cluster means blocking is broken long before
arithmetic is. ARI's cross products are computed in decimal(38,0)
(Spark) / HUGEINT (DuckDB oracle), exact to N ≈ 4·10^9 items.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 10^9 fixed-point: precision/recall contributions are scaled-integer
# truncating divisions, so cross-engine sums agree bit-for-bit.
_BC_SCALE = 10**9


def _contingency(pred: DataFrame, gold: DataFrame,
                 id_col: str, pred_col: str, gold_col: str) -> DataFrame:
    """(p, g, n_pg): the contingency table over the inner-joined item set.

    Items present in only one clustering are dropped — both metrics are
    defined over a common item universe; the join makes that explicit.
    """
    base = (pred.select(F.col(id_col).alias("_it"),
                        F.col(pred_col).alias("p"))
            .join(gold.select(F.col(id_col).alias("_it"),
                              F.col(gold_col).alias("g")), "_it"))
    return base.groupBy("p", "g").agg(F.count("*").alias("n_pg"))


def bcubed_metrics(pred: DataFrame, gold: DataFrame, id_col: str = "id",
                   pred_col: str = "pred", gold_col: str = "gold") -> DataFrame:
    """One row (n_items, precision, recall, f1): B-cubed score of ``pred``
    against ``gold``.

    B-cubed precision = avg over items of |P(i) ∩ G(i)| / |P(i)|, which
    over the contingency table is ``Σ_cells n²/P_p / N`` — computed here
    as per-pred-cluster int64 terms ``(Σ_g n_pg²)·10^9 div P_p`` summed
    exactly, divided by N·10^9 once at the end. Recall is the transpose.
    Three shuffles total (item join, cell groupBy, two tiny rollups).
    """
    cells = _contingency(pred, gold, id_col, pred_col, gold_col)
    n2 = (F.col("n_pg") * F.col("n_pg")).alias("n2")

    # per-pred-cluster: size P_p and Σ_g n², then the fixed-point term
    per_p = cells.groupBy("p").agg(
        F.sum("n_pg").alias("sz"), F.sum(n2).alias("num"))
    prec_terms = per_p.select(
        (F.col("num") * F.lit(_BC_SCALE)).cast("long").alias("s_num"),
        F.col("sz").alias("s_den"))
    per_g = cells.groupBy("g").agg(
        F.sum("n_pg").alias("sz"), F.sum(n2).alias("num"))
    rec_terms = per_g.select(
        (F.col("num") * F.lit(_BC_SCALE)).cast("long").alias("s_num"),
        F.col("sz").alias("s_den"))

    def _scaled_sum(terms: DataFrame) -> DataFrame:
        # num·S div den per cluster, summed — true int64 division (`div`),
        # never float `/` (whose rounding would break exact truncation)
        return terms.agg(F.sum(
            F.expr("s_num div s_den")).alias("t"))

    p_sum = _scaled_sum(prec_terms).select(F.col("t").alias("p_t"))
    r_sum = _scaled_sum(rec_terms).select(F.col("t").alias("r_t"))
    n_row = cells.agg(F.sum("n_pg").alias("n_items"))

    out = n_row.crossJoin(p_sum).crossJoin(r_sum)
    denom = F.col("n_items").cast("double") * F.lit(float(_BC_SCALE))
    prec = F.when(F.col("n_items") > 0,
                  F.col("p_t") / denom).otherwise(F.lit(0.0))
    rec = F.when(F.col("n_items") > 0,
                 F.col("r_t") / denom).otherwise(F.lit(0.0))
    f1 = F.when(F.col("p_t") + F.col("r_t") > 0,
                (2.0 * F.col("p_t") * F.col("r_t"))
                / ((F.col("p_t") + F.col("r_t")).cast("double")
                   * denom)).otherwise(F.lit(0.0))
    return out.select(
        "n_items",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"))


def adjusted_rand_index(pred: DataFrame, gold: DataFrame, id_col: str = "id",
                        pred_col: str = "pred",
                        gold_col: str = "gold") -> DataFrame:
    """One row (n_items, s_cells, s_pred, s_gold, ari): Adjusted Rand
    Index of ``pred`` against ``gold``.

    With S_c = Σ_cells C(n,2), S_a = Σ_p C(P,2), S_b = Σ_g C(G,2),
    S_n = C(N,2)::

        ARI = (S_c - S_a·S_b/S_n) / ((S_a+S_b)/2 - S_a·S_b/S_n)

    cleared of fractions to one division of two exact integers::

        ARI = 2·(S_c·S_n - S_a·S_b) / (S_n·(S_a+S_b) - 2·S_a·S_b)

    The products can reach N⁴/4, past int64 — they are computed in
    decimal(38,0), exact; only the final ratio is floating. Identical
    clusterings score 1.0; a zero denominator (both sides all-singletons
    or one giant cluster each — agreement is total) also scores 1.0.
    """
    cells = _contingency(pred, gold, id_col, pred_col, gold_col)

    def _pairs(n: F.Column) -> F.Column:
        # n(n-1) is even and nonnegative, so shiftright 1 == exact /2
        # (float `/` would round; `div` needs expr-string plumbing)
        return F.shiftright(n * (n - F.lit(1)), 1)

    sc = cells.agg(F.sum(_pairs(F.col("n_pg"))).alias("s_cells"),
                   F.sum("n_pg").alias("n_items"))
    sa = (cells.groupBy("p").agg(F.sum("n_pg").alias("sz"))
          .agg(F.sum(_pairs(F.col("sz"))).alias("s_pred")))
    sb = (cells.groupBy("g").agg(F.sum("n_pg").alias("sz"))
          .agg(F.sum(_pairs(F.col("sz"))).alias("s_gold")))

    out = sc.crossJoin(sa).crossJoin(sb)
    dec = "decimal(38,0)"
    s_c = F.col("s_cells").cast(dec)
    s_a = F.col("s_pred").cast(dec)
    s_b = F.col("s_gold").cast(dec)
    s_n = _pairs(F.col("n_items").cast("long")).cast(dec)
    num2 = F.lit(2).cast(dec) * (s_c * s_n - s_a * s_b)
    den2 = s_n * (s_a + s_b) - F.lit(2).cast(dec) * s_a * s_b
    ari = F.when(den2 == 0, F.lit(1.0)).otherwise(
        num2.cast("double") / den2.cast("double"))
    return out.select("n_items", "s_cells", "s_pred", "s_gold",
                      F.round(ari, 6).alias("ari"))


# micro-nat fixed point for NMI terms: n·ln(·) ≤ n·ln(N) ≈ n·45 at
# N = 10^12 items, so per-term int64 holds while the largest cell is
# under ~2·10^11 — far past any clustering this engine would score.
_NMI_SCALE = 10**6


def nmi_metrics(pred: DataFrame, gold: DataFrame, id_col: str = "id",
                pred_col: str = "pred", gold_col: str = "gold") -> DataFrame:
    """One row (n_items, i_scaled, hu_scaled, hv_scaled, nmi):
    normalized mutual information of ``pred`` against ``gold``
    (Strehl & Ghosh '02, sqrt normalization) — the third leg of the
    clustering-eval triad beside B-cubed and ARI, and the one the
    community-detection literature reports.

    Everything reduces to the contingency table again:
    ``I = Σ_cells (n/N)·ln(N·n/(a·b))``, ``H(U) = Σ_p (a/N)·ln(N/a)``;
    the common 1/N cancels in ``I/√(H(U)·H(V))`` so it is never
    computed. Each term enters as ``round(n·ln(·)·1e6)`` int64
    micro-nats — the PMI/FS determinism recipe: float ln sums are
    reduction-order-dependent, per-term snapped integers are not. ln
    arguments are assembled double-first (``(N·n)`` would overflow
    int64 at ~10^9 items squared).

    Degenerate convention (sklearn's): both sides one single cluster →
    1.0; only one side degenerate (an entropy of zero) → 0.0.

    Scale shape: one item join + one cell groupBy + two tiny rollups —
    identical cost to ARI, no pair materialization ever.
    """
    cells = _contingency(pred, gold, id_col, pred_col, gold_col)
    per_p = cells.groupBy("p").agg(F.sum("n_pg").alias("a"))
    per_g = cells.groupBy("g").agg(F.sum("n_pg").alias("b"))
    nn = cells.agg(F.sum("n_pg").alias("n_items"))

    def _snap(x: F.Column) -> F.Column:
        return F.round(x * F.lit(float(_NMI_SCALE)), 0).cast("long")

    joined = (cells.join(per_p, "p").join(per_g, "g")
              .crossJoin(F.broadcast(nn)))
    ln_arg = ((F.col("n_items").cast("double") * F.col("n_pg"))
              / (F.col("a").cast("double") * F.col("b")))
    i_t = joined.agg(
        F.sum(_snap(F.col("n_pg") * F.log(ln_arg))).alias("i_scaled"))

    def _entropy(per: DataFrame, szcol: str, out: str) -> DataFrame:
        term = F.col(szcol) * F.log(
            F.col("n_items").cast("double") / F.col(szcol))
        return (per.crossJoin(F.broadcast(nn))
                .agg(F.sum(_snap(term)).alias(out)))

    hu = _entropy(per_p, "a", "hu_scaled")
    hv = _entropy(per_g, "b", "hv_scaled")
    out = nn.crossJoin(i_t).crossJoin(hu).crossJoin(hv)
    nmi = (F.when((F.col("hu_scaled") == 0) & (F.col("hv_scaled") == 0),
                  F.lit(1.0))
           .when((F.col("hu_scaled") == 0) | (F.col("hv_scaled") == 0),
                 F.lit(0.0))
           .otherwise(F.col("i_scaled") / F.sqrt(
               F.col("hu_scaled").cast("double")
               * F.col("hv_scaled").cast("double"))))
    return out.select("n_items", "i_scaled", "hu_scaled", "hv_scaled",
                      F.round(nmi, 6).alias("nmi"))


def muc_metrics(pred: DataFrame, gold: DataFrame, id_col: str = "id",
                pred_col: str = "pred", gold_col: str = "gold") -> DataFrame:
    """One row (n_items, p_num, p_den, r_num, r_den, precision, recall,
    f1): MUC link-based score of ``pred`` against ``gold`` (Vilain et
    al. '95) — the fourth leg of the clustering-eval suite beside
    B-cubed, ARI and NMI, and the original coreference metric: recall
    counts the links missing to re-join each gold cluster,
    ``Σ_g (|g| − partitions(g)) / Σ_g (|g| − 1)``, precision is the
    transpose over predicted clusters.

    Over the contingency table both reduce to exact int64 counts —
    ``partitions(g)`` is just the number of non-empty cells in gold
    cluster g's row — so the only float ops are the two final divisions
    and ``f1 = 2·p_num·r_num / (p_num·r_den + r_num·p_den)``, each a
    single division of exact integers (bit-identical cross-engine).
    Singleton clusters contribute 0 to numerator and denominator alike
    (the MUC convention: a metric over links, blind to singletons); an
    all-singleton side makes the ratio 0/0, reported as 0.0.

    Scale shape: the same one item join + one cell groupBy + two tiny
    rollups as ARI — never a pair or link materialization.
    """
    cells = _contingency(pred, gold, id_col, pred_col, gold_col)
    per_p = cells.groupBy("p").agg(
        F.sum("n_pg").alias("sz"), F.count("*").alias("k"))
    per_g = cells.groupBy("g").agg(
        F.sum("n_pg").alias("sz"), F.count("*").alias("k"))

    def _sums(per: DataFrame, num: str, den: str) -> DataFrame:
        return per.agg(
            F.sum(F.col("sz") - F.col("k")).cast("long").alias(num),
            F.sum(F.col("sz") - F.lit(1)).cast("long").alias(den))

    ps = _sums(per_p, "p_num", "p_den")
    rs = _sums(per_g, "r_num", "r_den")
    nn = cells.agg(F.sum("n_pg").alias("n_items"))
    out = nn.crossJoin(ps).crossJoin(rs)
    prec = F.when(F.col("p_den") > 0,
                  F.col("p_num") / F.col("p_den").cast("double"))\
        .otherwise(F.lit(0.0))
    rec = F.when(F.col("r_den") > 0,
                 F.col("r_num") / F.col("r_den").cast("double"))\
        .otherwise(F.lit(0.0))
    f1_den = (F.col("p_num") * F.col("r_den")
              + F.col("r_num") * F.col("p_den"))
    f1 = F.when(f1_den > 0,
                (2.0 * F.col("p_num") * F.col("r_num"))
                / f1_den.cast("double")).otherwise(F.lit(0.0))
    return out.select(
        "n_items", "p_num", "p_den", "r_num", "r_den",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"))


# silhouette distance snapping: pairwise distances enter as 1e4-unit
# int64 (matching the ANN oracles' round(cos, 4) convention), per-point
# silhouettes re-snap to 1e6 before the per-cluster mean — float sums
# are order-dependent, snapped-int sums are not.
_SIL_DUNIT = 10**4
_SIL_SCALE = 10**6


def silhouette_by_cluster(clusters: DataFrame, vectors: DataFrame,
                          id_col: str = "id",
                          cluster_col: str = "cluster_id",
                          vec_col: str = "emb",
                          sample_per_cluster: int = 20) -> DataFrame:
    """(cluster_id, n_sampled, mean_silhouette): mean silhouette
    coefficient per cluster (Rousseeuw '87) over cosine distance —
    the internal-validity companion to the external metrics (B-cubed /
    ARI / NMI / MUC need a gold clustering; silhouette needs none).

    Exact silhouette is O(N²); here each cluster contributes a
    DETERMINISTIC sample (its ``sample_per_cluster`` smallest ids — no
    RNG state), and a(i)/b(i) are computed over the sampled points, so
    the pair stage is (Σ samples)² — bounded by clusters×sample², not
    by corpus size. At 100 TB the sample table broadcasts and the
    quadratic stage is a few thousand rows regardless of input rows.

    Determinism: distances snap to 1e4-unit int64 on entry (the ANN
    oracle convention), all accumulations are integer, each point's
    silhouette re-snaps to 1e6 before the final mean — the NMI recipe.
    Conventions: singleton-sample clusters score 0; a point with no
    other cluster to compare against scores 0; max(a,b)=0 scores 0.
    """
    pts = (clusters.select(F.col(id_col).alias("id"),
                           F.col(cluster_col).alias("cl"))
           .join(vectors.select(F.col(id_col).alias("id"),
                                F.col(vec_col).alias("e")), "id"))
    from pyspark.sql import Window as W
    win = W.partitionBy("cl").orderBy("id")
    samp = (pts.withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") <= sample_per_cluster)
            .select("id", "cl", "e"))

    a = samp.select(F.col("id").alias("ia"), F.col("cl").alias("ca"),
                    F.col("e").alias("ea"))
    b = samp.select(F.col("id").alias("ib"), F.col("cl").alias("cb"),
                    F.col("e").alias("eb"))
    dot = F.aggregate(F.zip_with("ea", "eb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    nrm = (F.sqrt(F.aggregate("ea", F.lit(0.0), lambda ac, v: ac + v * v))
           * F.sqrt(F.aggregate("eb", F.lit(0.0), lambda ac, v: ac + v * v)))
    cos = F.when(nrm == 0, F.lit(0.0)).otherwise(dot / nrm)
    d_unit = F.round((F.lit(1.0) - cos) * _SIL_DUNIT, 0).cast("long")
    pair = (a.crossJoin(b).where(F.col("ia") != F.col("ib"))
            .select("ia", "ca", "cb", d_unit.alias("d")))

    per = pair.groupBy("ia", "ca", "cb").agg(
        F.sum("d").alias("sd"), F.count("*").alias("nd"))
    own = per.where(F.col("ca") == F.col("cb")).select(
        "ia", F.col("ca").alias("cl"),
        (F.col("sd") / F.col("nd")).alias("a_mean"))
    other = (per.where(F.col("ca") != F.col("cb"))
             .select("ia", (F.col("sd") / F.col("nd")).alias("m"))
             .groupBy("ia").agg(F.min("m").alias("b_mean")))

    base = (samp.select("id", "cl")
            .join(own.withColumnRenamed("ia", "id").drop("cl")
                  .withColumnRenamed("a_mean", "a_mean"), "id", "left")
            .join(other.withColumnRenamed("ia", "id"), "id", "left"))
    s = (F.when(F.col("a_mean").isNull() | F.col("b_mean").isNull(),
                F.lit(0.0))
         .when(F.greatest("a_mean", "b_mean") == 0, F.lit(0.0))
         .otherwise((F.col("b_mean") - F.col("a_mean"))
                    / F.greatest("a_mean", "b_mean")))
    s_micro = F.round(s * _SIL_SCALE, 0).cast("long")
    return (base.select("cl", s_micro.alias("sm"))
            .groupBy(F.col("cl").alias("cluster_id"))
            .agg(F.count("*").alias("n_sampled"),
                 F.round(F.sum("sm")
                         / (F.count("*") * F.lit(float(_SIL_SCALE))),
                         6).alias("mean_silhouette")))
