"""Evaluation operators: comparing pair/cluster outputs at corpus scale.

An ER pipeline ships with its measurements: when two dedup strategies (or
two releases of one) disagree over 10^9 candidate pairs, the comparison
itself must be a distributed job — collecting either side to a driver is
the anti-pattern. Both operators here are joins + counts with exactly one
floating division per metric, so the DuckDB oracle reproduces every digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_metrics(pred: DataFrame, ref: DataFrame,
                 id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """One row: (tp, fp, fn, precision, recall, f1) of predicted pairs
    against reference pairs.

    Pairs are undirected — both inputs are canonicalized to
    (min, max) and deduplicated before counting, so orientation and
    duplicates in either input cannot skew the counts. tp/fp/fn come from
    one full outer join of the two canonical pair sets (two shuffles
    total, each carrying only id pairs); the metrics are single exact
    divisions of those int64 counts. Empty sides yield 0.0 metrics, not
    nulls, so downstream gates can threshold directly.
    """
    def canon(df: DataFrame) -> DataFrame:
        return (df.select(
            F.least(F.col(id_a), F.col(id_b)).alias("a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct())

    p = canon(pred).withColumn("_p", F.lit(1))
    r = canon(ref).withColumn("_r", F.lit(1))
    joined = p.join(r, ["a", "b"], "full_outer")
    counts = joined.agg(
        F.count(F.when(F.col("_p").isNotNull()
                       & F.col("_r").isNotNull(), 1)).alias("tp"),
        F.count(F.when(F.col("_p").isNotNull()
                       & F.col("_r").isNull(), 1)).alias("fp"),
        F.count(F.when(F.col("_p").isNull()
                       & F.col("_r").isNotNull(), 1)).alias("fn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    prec = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
    rec = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
    f1 = F.when(2 * tp + fp + fn > 0,
                (2 * tp) / (2 * tp + fp + fn)).otherwise(F.lit(0.0))
    return counts.select(
        "tp", "fp", "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"))


def cluster_size_histogram(clusters: DataFrame,
                           cluster_col: str = "cluster_id") -> DataFrame:
    """(cluster_size, n_clusters): the size distribution of a clustering —
    the first thing to inspect after any ER run (a giant component means
    a too-loose threshold; all-singletons means a too-tight one).

    Two map-side-combined aggregates; the second one's input is one row
    per cluster, so the histogram costs ~nothing beyond the first count.
    """
    sizes = clusters.groupBy(cluster_col).agg(
        F.count("*").alias("cluster_size"))
    return (sizes.groupBy("cluster_size")
            .agg(F.count("*").alias("n_clusters")))


def topk_recall(exact: DataFrame, approx: DataFrame,
                query_col: str = "query_id",
                neighbor_col: str = "neighbor_id") -> DataFrame:
    """(query_id, n_exact, n_hit, recall): recall@k of an approximate
    top-k result against the exact one — THE quality number for an ANN
    index (IVF/LSH/PQ trade exactly this for sub-linear probing).
    One left equi-join on (query, neighbor) + one map-side-combined
    groupBy; recall is a single exact division."""
    a = approx.select(F.col(query_col).alias("_q"),
                      F.col(neighbor_col).alias("_n"),
                      F.lit(1).alias("_hit"))
    j = (exact.select(F.col(query_col).alias("_q"),
                      F.col(neighbor_col).alias("_n"))
         .join(a, ["_q", "_n"], "left"))
    per = j.groupBy("_q").agg(F.count(F.lit(1)).alias("n_exact"),
                              F.count("_hit").alias("n_hit"))
    return per.select(F.col("_q").alias(query_col), "n_exact", "n_hit",
                      F.round(F.col("n_hit") / F.col("n_exact"), 6)
                      .alias("recall"))


def chao1_estimate(clusters: DataFrame,
                   cluster_col: str = "cluster_id") -> DataFrame:
    """One row (n_items, c_observed, f1, f2, chao1, coverage): Chao's
    bias-corrected richness estimator over an ER clustering — treat
    entity clusters as species and their sizes as capture counts; the
    singleton/doubleton ratio then estimates how many entities the
    sample has NOT yet seen: ``chao1 = c + f1·(f1−1) / (2·(f2+1))``.
    This is the dedup-planning number: run ER on a 1% sample, read off
    what fraction of the full corpus's entity mass the sample already
    covers before committing the 100-TB job.

    Two map-side-combined aggregates over the cluster sizes; the
    estimator is exact integer arithmetic until one final division."""
    sizes = clusters.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("_sz"))
    agg = sizes.agg(
        F.sum("_sz").alias("n_items"),
        F.count(F.lit(1)).alias("c_observed"),
        F.sum(F.when(F.col("_sz") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("_sz") == 2, 1).otherwise(0)).alias("f2"))
    chao = (F.col("c_observed")
            + (F.col("f1") * (F.col("f1") - 1)).cast("double")
            / (2.0 * (F.col("f2") + 1)))
    return agg.select(
        "n_items", "c_observed", "f1", "f2",
        F.round(chao, 6).alias("chao1"),
        F.round(F.col("c_observed") / chao, 6).alias("coverage"))


def pair_metrics_by(pred: DataFrame, ref: DataFrame, slices: DataFrame,
                    id_col: str = "id", slice_col: str = "slice",
                    id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Per-slice linkage quality: ``pair_metrics`` broken down by a
    record attribute (language, source, crawl segment, …) — the
    monitoring view that catches a scorer quietly failing on ONE slice
    while the corpus-level F1 still looks fine.

    ``slices`` maps record id → slice label; each (pred ∪ ref) pair is
    attributed to the slice of its SMALLER id (deterministic; a
    cross-slice pair counts once), ids missing from ``slices`` land in
    'unknown'. Returns one row per slice: (slice, tp, fp, fn,
    precision, recall, f1) with the same exact-count core as
    ``pair_metrics``.

    Scale shape: one full outer join of canonical pair sets + one
    broadcast-size join to the slice map + one map-side groupBy.
    """
    def canon(df: DataFrame) -> DataFrame:
        return (df.select(
            F.least(F.col(id_a), F.col(id_b)).alias("a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct())

    p = canon(pred).withColumn("_p", F.lit(1))
    r = canon(ref).withColumn("_r", F.lit(1))
    s = slices.select(F.col(id_col).alias("a"),
                      F.col(slice_col).alias("_s"))
    g = (p.join(r, ["a", "b"], "full_outer")
         .join(s, "a", "left")
         .select(F.coalesce(F.col("_s"), F.lit("unknown")).alias("slice"),
                 "_p", "_r"))
    counts = g.groupBy("slice").agg(
        F.count(F.when(F.col("_p").isNotNull()
                       & F.col("_r").isNotNull(), 1)).alias("tp"),
        F.count(F.when(F.col("_p").isNotNull()
                       & F.col("_r").isNull(), 1)).alias("fp"),
        F.count(F.when(F.col("_p").isNull()
                       & F.col("_r").isNotNull(), 1)).alias("fn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    prec = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
    rec = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
    f1 = F.when(2 * tp + fp + fn > 0,
                (2 * tp) / (2 * tp + fp + fn)).otherwise(F.lit(0.0))
    return counts.select(
        "slice", "tp", "fp", "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"))


def ranking_auc(scored: DataFrame, score_col: str = "score",
                label_col: str = "y") -> DataFrame:
    """Exact ROC AUC of a pair scorer — the single-number ranking
    metric next to the threshold-curve view, computed as the
    tie-corrected Mann-Whitney rank-sum:

        AUC = (2·R⁺ − n⁺(n⁺+1)) / (2·n⁺·n⁻)

    where R⁺ is the positives' rank sum under AVERAGE ranks for ties.
    Grouping by distinct score makes the tie handling exact integer
    arithmetic: per score group (ascending), positives contribute
    cp·(2·B + c + 1) to 2·R⁺ (B = rows strictly below, c = group
    size), so everything is int64 until the one final division.

    Returns one row (n_pos, n_neg, auc, gini). Scale shape: one
    map-side groupBy onto DISTINCT SCORES (≤ 1e6+1 rows for micro-grid
    scores), one cumulative window over that score table — never over
    the pairs — and a scalar aggregate.
    """
    from pyspark.sql import Window

    g = (scored.groupBy(F.col(score_col).alias("_s"))
         .agg(F.count("*").alias("c"),
              F.sum(F.when(F.col(label_col) > 0, 1).otherwise(0))
               .alias("cp")))
    w = (Window.orderBy("_s")
         .rowsBetween(Window.unboundedPreceding, -1))
    cum = g.select(
        "c", "cp",
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("b"))
    tot = cum.agg(
        F.sum("cp").alias("n_pos"),
        (F.sum("c") - F.sum("cp")).alias("n_neg"),
        F.sum(F.col("cp") * (F.lit(2) * F.col("b") + F.col("c")
                             + F.lit(1))).alias("r2"))
    n_pos, n_neg, r2 = F.col("n_pos"), F.col("n_neg"), F.col("r2")
    auc = F.when(
        (n_pos > 0) & (n_neg > 0),
        F.round((r2 - n_pos * (n_pos + 1))
                / (F.lit(2.0) * n_pos * n_neg), 6))
    return tot.select(
        "n_pos", "n_neg", auc.alias("auc"),
        F.when((n_pos > 0) & (n_neg > 0),
               F.round((r2 - n_pos * (n_pos + 1))
                       / (F.lit(2.0) * n_pos * n_neg) * 2 - 1, 6))
         .alias("gini"))


def clusterer_shootout(pairs: DataFrame, gold: DataFrame,
                       labelings: "dict[str, DataFrame]") -> DataFrame:
    """(method, pred_pairs, tp_restricted, gold_cov, n_gold, precision,
    recall, f1) — one row per clustering method: pairwise quality vs the
    labeled gold pairs, the Hassanzadeh–Miller clusterer-comparison
    table as a single artifact.

    Definitions (the blocked-evaluation convention): ``pred_pairs`` =
    candidate pairs the method co-clusters (precision's denominator is
    RESTRICTED to the candidate universe — co-clustered pairs outside it
    are unobservable at scale and identical for every method);
    ``recall`` is EXACT: a gold pair counts as found iff the method
    co-labels its two ends, checked by direct label lookup — no pair
    enumeration, so giant clusters cost nothing.  Counts are exact
    int64; the three ratios are final rounded divisions.
    """
    spark = gold.sparkSession
    mp = pairs.select("id_a", "id_b").distinct()
    g = gold.select("id_a", "id_b").distinct()
    n_gold = g.count()
    rows = []
    for name, lab in sorted(labelings.items()):
        la = lab.select(F.col("id").alias("id_a"),
                        F.col("cluster_id").alias("_la"))
        lb = lab.select(F.col("id").alias("id_b"),
                        F.col("cluster_id").alias("_lb"))
        co = (mp.join(la, "id_a").join(lb, "id_b")
              .where(F.col("_la") == F.col("_lb"))
              .select("id_a", "id_b"))
        pred = co.count()
        tp = co.join(g, ["id_a", "id_b"], "semi").count()
        cov = (g.join(la, "id_a").join(lb, "id_b")
               .where(F.col("_la") == F.col("_lb")).count())
        rows.append((name, pred, tp, cov, n_gold))
    out = spark.createDataFrame(
        rows, "method string, pred_pairs long, tp_restricted long,"
              " gold_cov long, n_gold long")
    p = F.when(F.col("pred_pairs") > 0,
               F.round(F.col("tp_restricted") / F.col("pred_pairs"), 6)
               ).otherwise(F.lit(0.0))
    r = F.when(F.col("n_gold") > 0,
               F.round(F.col("gold_cov") / F.col("n_gold"), 6)
               ).otherwise(F.lit(0.0))
    return (out.withColumn("precision", p).withColumn("recall", r)
            .withColumn("f1", F.when(
                (F.col("precision") + F.col("recall")) > 0,
                F.round(2 * F.col("precision") * F.col("recall")
                        / (F.col("precision") + F.col("recall")), 6))
                .otherwise(F.lit(0.0))))


def pair_metrics_jackknife(pred: DataFrame, ref: DataFrame,
                           id_a: str = "id_a", id_b: str = "id_b",
                           buckets: int = 10) -> DataFrame:
    """(bucket, n_excluded, tp, fp, fn, precision, recall, f1): delete-
    one-bucket jackknife over the pairwise metrics — error bars for the
    headline F1 gate. Pairs are assigned to ``buckets`` deterministic
    folds by ``((a mod B)·31 + (b mod B)) mod B`` with each residue
    taken non-negative (plain integer arithmetic — NOT an engine hash,
    which would differ between Spark and the oracle). The double-mod
    construction is overflow-proof (terms bounded by 32·B, never the
    raw id·31) and sign-portable: Spark ``pmod`` is always
    non-negative while SQL ``%`` keeps the dividend's sign, so the
    residues are forced non-negative on both sides before combining.
    Ids must be integers — string ids would silently cast to NULL in
    the arithmetic, so they are rejected with a TypeError up front;
    row ``bucket=k`` reports the metrics with fold k REMOVED, so the
    spread across rows is the metric's sensitivity to any tenth of the
    evaluation pairs. A gate that demands min-over-folds F1 ≥ 0.99 is
    robust to a lucky fold in a way the point estimate is not.

    Same canonicalization/counting as ``pair_metrics``; the per-fold
    counts are one groupBy over the outer-joined pair set, the
    leave-one-out arithmetic is exact int64 subtraction from the fold
    totals — the whole jackknife costs one extra tiny aggregate, not
    ``buckets`` passes.
    """
    from pyspark.sql.types import (ByteType, IntegerType, LongType,
                                   ShortType)
    _INTEGRAL = (ByteType, ShortType, IntegerType, LongType)
    for df in (pred, ref):
        for c in (id_a, id_b):
            dt = df.schema[c].dataType
            if not isinstance(dt, _INTEGRAL):
                raise TypeError(
                    f"pair_metrics_jackknife: id column {c!r} must be "
                    f"integral for the deterministic fold arithmetic, "
                    f"got {dt.simpleString()}")

    def canon(df: DataFrame) -> DataFrame:
        return (df.select(
            F.least(F.col(id_a), F.col(id_b)).alias("a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct())

    p = canon(pred).withColumn("_p", F.lit(1))
    r = canon(ref).withColumn("_r", F.lit(1))
    fold = F.pmod(
        F.pmod(F.col("a"), F.lit(buckets)) * 31
        + F.pmod(F.col("b"), F.lit(buckets)), F.lit(buckets))
    joined = p.join(r, ["a", "b"], "full_outer").select(
        fold.cast("int").alias("bucket"),
        (F.col("_p").isNotNull() & F.col("_r").isNotNull())
        .cast("long").alias("is_tp"),
        (F.col("_p").isNotNull() & F.col("_r").isNull())
        .cast("long").alias("is_fp"),
        (F.col("_p").isNull() & F.col("_r").isNotNull())
        .cast("long").alias("is_fn"),
    )
    per = joined.groupBy("bucket").agg(
        F.count("*").alias("n_excluded"),
        F.sum("is_tp").alias("b_tp"), F.sum("is_fp").alias("b_fp"),
        F.sum("is_fn").alias("b_fn"))
    tot = joined.agg(F.sum("is_tp").alias("t_tp"),
                     F.sum("is_fp").alias("t_fp"),
                     F.sum("is_fn").alias("t_fn"))
    out = per.crossJoin(F.broadcast(tot)).select(
        "bucket", "n_excluded",
        (F.col("t_tp") - F.col("b_tp")).alias("tp"),
        (F.col("t_fp") - F.col("b_fp")).alias("fp"),
        (F.col("t_fn") - F.col("b_fn")).alias("fn"))
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    prec = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
    rec = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
    f1 = F.when(2 * tp + fp + fn > 0,
                (2 * tp) / (2 * tp + fp + fn)).otherwise(F.lit(0.0))
    return out.select(
        "bucket", "n_excluded", "tp", "fp", "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"))
