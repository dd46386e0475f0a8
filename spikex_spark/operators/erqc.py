"""ER quality control — the measurements that tune a linkage pipeline.

``evaluation.pair_metrics`` scores one fixed prediction set; the three
operators here answer the *tuning* questions asked before and after it:

* ``blocking_metrics`` — is the blocking stage keeping enough true
  pairs (pairs completeness) while killing enough of the quadratic
  space (reduction ratio)? The standard blocking triple (Christen,
  "Data Matching", ch. 7).
* ``threshold_sweep`` — the precision/recall/F1 curve of the scorer
  across match thresholds, in ONE distributed pass (not one job per
  threshold).
* ``cluster_cohesion`` — per-cluster edge density and score floor
  after transitive closure; a near-zero density on a big cluster is
  the signature of chain-merging (A~B~C where A≁C), the classic
  over-merge failure of connected-components ER.

All three are joins + counts with exact integer cores and one rounded
division per metric, so the DuckDB oracle reproduces every digit.
Beyond-reference toolchain (SURVEY.md §2.11).

Scale shape: every operator reduces to per-key or scalar aggregates
over pair tables — no driver-side loops, no per-threshold re-scans
(the sweep crossJoins a broadcast literal threshold list and
aggregates once), no collect beyond the one-row outputs Spark already
returns.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_U_SCALE = 1e6   # int64 micro-units for exact score sums


def _canon_pairs(df: DataFrame, id_a: str, id_b: str,
                 keep: Sequence[str] = ()) -> DataFrame:
    """Undirected-pair canonical form: (a, b) with a < b, deduplicated."""
    return (df.select(
        F.least(F.col(id_a), F.col(id_b)).alias("a"),
        F.greatest(F.col(id_a), F.col(id_b)).alias("b"),
        *[F.col(c) for c in keep])
        .where(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"]))


def blocking_metrics(candidates: DataFrame, gold: DataFrame,
                     records: DataFrame,
                     id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """One row: (n_records, n_candidates, n_gold, tp, reduction_ratio,
    pairs_completeness, pairs_quality).

    * reduction_ratio   = 1 − n_candidates / (n·(n−1)/2)
    * pairs_completeness = tp / n_gold        (blocking recall)
    * pairs_quality      = tp / n_candidates  (blocking precision)

    Three scalar aggregates crossJoined into one row (each is one
    map-side-combined count); ``tp`` comes from a semi-join of the two
    canonical pair sets.
    """
    cand = _canon_pairs(candidates, id_a, id_b)
    ref = _canon_pairs(gold, id_a, id_b)
    n_rec = records.agg(F.count("*").cast("long").alias("n_records"))
    counts = (cand.join(ref.withColumn("_g", F.lit(1)), ["a", "b"],
                        "left")
              .agg(F.count("*").alias("n_candidates"),
                   F.count("_g").alias("tp")))
    n_gold = ref.agg(F.count("*").alias("n_gold"))
    one = counts.crossJoin(n_gold).crossJoin(n_rec)
    n, nc, ng, tp = (F.col("n_records"), F.col("n_candidates"),
                     F.col("n_gold"), F.col("tp"))
    total_pairs = n * (n - 1) / 2
    rr = F.when(total_pairs > 0, 1 - nc / total_pairs).otherwise(F.lit(0.0))
    pc = F.when(ng > 0, tp / ng).otherwise(F.lit(0.0))
    pq = F.when(nc > 0, tp / nc).otherwise(F.lit(0.0))
    return one.select(
        "n_records", "n_candidates", "n_gold", "tp",
        F.round(rr, 6).alias("reduction_ratio"),
        F.round(pc, 6).alias("pairs_completeness"),
        F.round(pq, 6).alias("pairs_quality"))


def threshold_sweep(scored: DataFrame, gold: DataFrame,
                    thresholds: Sequence[float],
                    score_col: str = "score",
                    id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """(threshold, tp, fp, fn, precision, recall, f1) — one row per
    threshold, computed in ONE pass.

    Scored candidate pairs are full-outer-joined with the gold pairs
    (gold pairs the blocker never proposed count as fn at EVERY
    threshold — sweeping only over candidates would flatter recall),
    crossJoined with the broadcast literal threshold list, and
    aggregated once. The score must already be decimal-rounded (the
    repo convention: ``round(score, 6)`` hash-matches the oracle), so
    ``score ≥ t`` is engine-exact for decimal thresholds.
    """
    s = _canon_pairs(scored, id_a, id_b, keep=[score_col])
    g = _canon_pairs(gold, id_a, id_b).withColumn("_g", F.lit(1))
    joined = s.join(g, ["a", "b"], "full_outer")
    spark = scored.sparkSession
    tdf = F.broadcast(spark.createDataFrame(
        [(float(t),) for t in thresholds], "threshold double"))
    pred = F.col(score_col) >= F.col("threshold")   # null score → false
    is_gold = F.col("_g").isNotNull()
    agg = (joined.crossJoin(tdf).groupBy("threshold").agg(
        F.count(F.when(pred & is_gold, 1)).alias("tp"),
        F.count(F.when(pred & ~is_gold, 1)).alias("fp"),
        F.count(F.when(is_gold & (~pred | F.col(score_col).isNull()),
                       1)).alias("fn")))
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    prec = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(F.lit(0.0))
    rec = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(F.lit(0.0))
    f1 = F.when(2 * tp + fp + fn > 0,
                (2 * tp) / (2 * tp + fp + fn)).otherwise(F.lit(0.0))
    return agg.select(
        "threshold", "tp", "fp", "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"))


def cluster_cohesion(clusters: DataFrame, match_edges: DataFrame,
                     cluster_col: str = "cluster_id",
                     id_col: str = "doc_id",
                     score_col: str = "score",
                     id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """(cluster_id, n_members, n_edges, density, min_score, avg_score)
    — the over-merge diagnostic, one row per cluster.

    Only edges whose BOTH endpoints sit in the same cluster count
    (under transitive closure that is all of them, but the operator
    does not assume its input came from CC). density =
    n_edges / (n·(n−1)/2); singletons and edge-less clusters report
    0.0 metrics, not nulls. Scores are summed in int64 micro-units
    (``round(score·1e6)``) so ``avg_score`` is a single exact division
    — float sum order can never move a digit.
    """
    memb = clusters.select(F.col(id_col).alias("_m_id"),
                           F.col(cluster_col).alias("_m_cl"))
    e = _canon_pairs(match_edges, id_a, id_b, keep=[score_col])
    u = F.round(F.col(score_col) * _U_SCALE, 0).cast("long")
    e = (e.join(memb.withColumnsRenamed(
            {"_m_id": "a", "_m_cl": "_cl_a"}), "a")
         .join(memb.withColumnsRenamed(
            {"_m_id": "b", "_m_cl": "_cl_b"}), "b")
         .where(F.col("_cl_a").eqNullSafe(F.col("_cl_b")))
         .select(F.col("_cl_a").alias("_cl"),
                 u.alias("_u")))
    edge_stats = e.groupBy("_cl").agg(
        F.count("*").alias("n_edges"),
        F.min("_u").alias("_min_u"),
        F.sum("_u").alias("_sum_u"))
    sizes = clusters.groupBy(F.col(cluster_col).alias("_cl")).agg(
        F.count("*").alias("n_members"))
    j = sizes.join(edge_stats, "_cl", "left")
    n, ne = F.col("n_members"), F.coalesce(F.col("n_edges"), F.lit(0))
    dens = F.when(n > 1, ne / (n * (n - 1) / 2)).otherwise(F.lit(0.0))
    return j.select(
        F.col("_cl").alias(cluster_col), "n_members",
        ne.alias("n_edges"),
        F.round(dens, 6).alias("density"),
        F.round(F.coalesce(F.col("_min_u") / _U_SCALE, F.lit(0.0)),
                6).alias("min_score"),
        F.round(F.coalesce(
            (F.col("_sum_u").cast("double") / F.col("n_edges"))
            / _U_SCALE, F.lit(0.0)), 6).alias("avg_score"))


def channel_stats(channels: dict, gold: DataFrame | None = None) -> DataFrame:
    """(channel, n_pairs, n_unique, gold_hits): per-blocking-channel
    contribution audit over a dict of candidate-pair DataFrames
    (id_a, id_b). ``n_unique`` counts pairs NO other channel proposes —
    the channel's irreplaceable recall; with ``gold``, ``gold_hits``
    counts its true pairs. This is the number that justifies (or
    retires) each channel of a disjunctive blocking scheme.

    One union + two map-side-combined groupBys — the pair sets are
    blocking-sized, never corpus-sized."""
    from pyspark.sql import functions as F
    tagged = None
    for name, df in channels.items():
        t = (df.select(F.least("id_a", "id_b").alias("id_a"),
                       F.greatest("id_a", "id_b").alias("id_b"))
             .distinct()
             .withColumn("channel", F.lit(name)))
        tagged = t if tagged is None else tagged.unionByName(t)
    per_pair = (tagged.groupBy("id_a", "id_b")
                .agg(F.count(F.lit(1)).alias("_nch")))
    base = tagged.join(per_pair, ["id_a", "id_b"])
    if gold is not None:
        g = (gold.select(F.least("id_a", "id_b").alias("id_a"),
                         F.greatest("id_a", "id_b").alias("id_b"))
             .distinct().withColumn("_gold", F.lit(1)))
        base = base.join(g, ["id_a", "id_b"], "left")
        gold_hits = F.count("_gold").alias("gold_hits")
    else:
        gold_hits = F.lit(None).cast("long").alias("gold_hits")
    return (base.groupBy("channel")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.sum(F.when(F.col("_nch") == 1, 1).otherwise(0))
                 .alias("n_unique"),
                 gold_hits))


def score_calibration(scored: DataFrame, gold: DataFrame, bins: int = 10,
                      score_col: str = "score") -> DataFrame:
    """(bin, lo, n_pairs, n_gold, precision): empirical precision per
    score decile — IS a 0.8 actually 80% right? The calibration table
    that turns a similarity score into a trustworthy match probability
    (and exposes the miscalibrated middle the threshold sweep hides).
    One left join + one map-side-combined groupBy; bin = floor(s·bins)
    clamped so s=1.0 lands in the top bin."""
    g = (gold.select(F.least("id_a", "id_b").alias("id_a"),
                     F.greatest("id_a", "id_b").alias("id_b"))
         .distinct().withColumn("_g", F.lit(1)))
    s = scored.select(
        F.least("id_a", "id_b").alias("id_a"),
        F.greatest("id_a", "id_b").alias("id_b"),
        F.least(F.floor(F.col(score_col) * bins).cast("int"),
                F.lit(bins - 1)).alias("bin"))
    j = s.join(g, ["id_a", "id_b"], "left")
    return (j.groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.count("_g").alias("n_gold"))
            .select("bin",
                    F.round(F.col("bin") / F.lit(float(bins)), 6)
                    .alias("lo"),
                    "n_pairs", "n_gold",
                    F.round(F.col("n_gold") / F.col("n_pairs"), 6)
                    .alias("precision")))


def group_linkage(matched_pairs: DataFrame, members: DataFrame,
                  id_col: str = "id", group_col: str = "grp",
                  min_common: int = 1) -> DataFrame:
    """(grp_a, grp_b, n_matched, size_a, size_b, dice): GROUP-level
    linkage from record-level matches (On, Koudas et al.'s group
    linkage; for webtext: MIRROR-SITE detection — two sources sharing
    many near-dup documents are the same site crawled twice). Record
    matches aggregate to one row per group pair; dice =
    2·matched/(|A|+|B|) over group sizes. Two equi-joins + two
    map-side-combined groupBys — never a group cross product."""
    m = members.select(F.col(id_col).alias("_id"),
                       F.col(group_col).alias("_g"))
    sizes = m.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
    p = (matched_pairs
         .join(m.withColumnsRenamed({"_id": "id_a", "_g": "g_a"}), "id_a")
         .join(m.withColumnsRenamed({"_id": "id_b", "_g": "g_b"}), "id_b")
         .where(F.col("g_a") != F.col("g_b"))
         .select(F.least("g_a", "g_b").alias("grp_a"),
                 F.greatest("g_a", "g_b").alias("grp_b")))
    agg = (p.groupBy("grp_a", "grp_b")
           .agg(F.count(F.lit(1)).alias("n_matched"))
           .where(F.col("n_matched") >= min_common))
    return (agg
            .join(sizes.withColumnsRenamed({"_g": "grp_a", "_n": "size_a"}),
                  "grp_a")
            .join(sizes.withColumnsRenamed({"_g": "grp_b", "_n": "size_b"}),
                  "grp_b")
            .select("grp_a", "grp_b", "n_matched", "size_a", "size_b",
                    F.round(F.lit(2.0) * F.col("n_matched")
                            / (F.col("size_a") + F.col("size_b")), 6)
                    .alias("dice")))


def transitivity_violations(matched: DataFrame,
                            scored: DataFrame | None = None,
                            score_col: str = "score") -> DataFrame:
    """(id_a, id_center, id_c, score_ac): open match triangles — a–b
    and b–c matched but a–c NOT — the exact conflicts transitive CC
    papers over (it merges all three) and correlation clustering
    refuses. ``scored`` (optional) attaches the a–c pair's actual score
    (NULL if never even a candidate: a blocking miss, not a scoring
    disagreement). One self-join of the match edges on the shared
    center + one anti-check; match sets are pair-sized, never corpus-
    sized."""
    e = (matched.select(F.least("id_a", "id_b").alias("a"),
                        F.greatest("id_a", "id_b").alias("b"))
         .distinct())
    sym = e.unionByName(e.select(F.col("b").alias("a"),
                                 F.col("a").alias("b")))
    wedges = (sym.alias("l")
              .join(sym.alias("r"), F.col("l.b") == F.col("r.a"))
              .where(F.col("l.a") < F.col("r.b"))
              .select(F.col("l.a").alias("id_a"),
                      F.col("l.b").alias("id_center"),
                      F.col("r.b").alias("id_c")))
    open_w = wedges.join(
        e.withColumnsRenamed({"a": "id_a", "b": "id_c"}),
        ["id_a", "id_c"], "left_anti")
    if scored is None:
        return open_w.withColumn("score_ac",
                                 F.lit(None).cast("double"))
    s = scored.select(F.least("id_a", "id_b").alias("id_a"),
                      F.greatest("id_a", "id_b").alias("id_c"),
                      F.col(score_col).alias("score_ac"))
    return open_w.join(s, ["id_a", "id_c"], "left")


def progressive_recall(weighted_pairs: DataFrame, gold: DataFrame,
                       budgets, weight_col: str = "cbs") -> DataFrame:
    """(budget, n_found, n_gold, recall): pay-as-you-go / progressive ER
    (Whang, Marmaros & Garcia-Molina '13) — emit candidate pairs in
    EVIDENCE order (weight desc, ids as tiebreak) and measure gold
    recall at each comparison budget: the curve that tells you how much
    of the dedup value the first 1% of comparisons already buys, the
    planning number for any budgeted/early-stopping ER run.

    The global emission rank comes from snm.global_rank (two-phase
    range exchange — NEVER a one-partition window); gold hits are
    pair-sized, so the budget join is a small broadcast shape."""
    from .snm import global_rank
    w = weighted_pairs.select(
        "id_a", "id_b", (F.col(weight_col) * F.lit(-1)).alias("_negw"))
    ranked = global_rank(w, ["_negw", "id_a", "id_b"])
    g = (gold.select(F.least("id_a", "id_b").alias("id_a"),
                     F.greatest("id_a", "id_b").alias("id_b"))
         .distinct())
    n_gold = g.agg(F.count(F.lit(1)).alias("n_gold"))
    hits = ranked.join(g, ["id_a", "id_b"]).select(F.col("rank").alias("rk"))
    spark = weighted_pairs.sparkSession
    bud = spark.createDataFrame([(int(b),) for b in budgets],
                                "budget long")
    counts = (bud.join(F.broadcast(hits),
                       F.col("rk") <= F.col("budget"), "left")
              .groupBy("budget").agg(F.count("rk").alias("n_found")))
    recall = F.when(F.col("n_gold") > 0,
                    F.round(F.col("n_found") / F.col("n_gold"), 6))
    return (counts.crossJoin(F.broadcast(n_gold))
            .select("budget", "n_found", "n_gold",
                    recall.alias("recall")))


def otsu_threshold(scored: DataFrame, score_col: str = "score",
                   bins: int = 100) -> DataFrame:
    """Unsupervised match-threshold chooser: Otsu's method over the
    score histogram (Otsu '79, the standard bimodal-split picker).

    ``threshold_sweep`` needs gold labels; in a cold-start linkage
    there are none. Match scores are bimodal (a non-match mass near 0,
    a match mode near 1), and Otsu picks the split k maximizing the
    between-class variance σ²_B(k) = (s0·N − S·w0)² / (w0·w1) over the
    binned histogram — all integer counts until one final division, so
    the oracle reproduces every digit (the squared term is built from
    an int64 difference, then squared in IEEE double identically by
    both engines).

    Returns one row per VALID split (both classes non-empty, at a
    non-empty bin): (bin, c, w0, w1, between_var, chosen, threshold) —
    ``chosen`` marks the argmax (ties → smallest bin; classify as a
    match when score > bin/bins) and ``threshold`` carries
    (bin+1)/bins on that row (NULL elsewhere).

    Scale shape: one groupBy onto ≤``bins`` rows, then windows over
    that bin table only — the single-partition window is over ≤100
    rows by construction, never over the pair table.
    """
    h = (scored.select(
            F.least(F.floor(F.col(score_col) * bins).cast("bigint"),
                    F.lit(bins - 1)).alias("bin"))
         .groupBy("bin").agg(F.count("*").alias("c")))
    cum_w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.select(
        "bin", "c",
        F.sum("c").over(cum_w).alias("w0"),
        F.sum(F.col("c") * F.col("bin")).over(cum_w).alias("s0"))
    tot = h.agg(F.sum("c").alias("n"),
                F.sum(F.col("c") * F.col("bin")).alias("s"))
    j = cum.crossJoin(F.broadcast(tot)).where(
        (F.col("w0") > 0) & (F.col("n") - F.col("w0") > 0))
    diff = (F.col("s0") * F.col("n") - F.col("s") * F.col("w0"))
    w1 = (F.col("n") - F.col("w0"))
    between_col = F.round(
        (diff.cast("double") * diff.cast("double"))
        / (F.col("w0") * w1).cast("double"), 6)
    scored_bins = j.select("bin", "c", "w0", w1.alias("w1"),
                           between_col.alias("between_var"))
    pick_w = Window.orderBy(F.desc("between_var"), F.asc("bin"))
    return (scored_bins
            .withColumn("_rk", F.row_number().over(pick_w))
            .select("bin", "c", "w0", "w1", "between_var",
                    (F.col("_rk") == 1).alias("chosen"),
                    F.when(F.col("_rk") == 1,
                           F.round((F.col("bin") + 1)
                                   / F.lit(float(bins)), 6))
                     .alias("threshold")))


def review_sample(scored: DataFrame, lo: float = 0.70, hi: float = 0.90,
                  strata: int = 4, k: int = 10,
                  score_col: str = "score") -> DataFrame:
    """Clerical-review batch selection: the pairs a human should look
    at, chosen deterministically.

    Pairs scoring inside the uncertainty band [lo, hi) — the region
    where the scorer is least sure — are stratified into ``strata``
    equal score slices (so the review budget covers the WHOLE band
    instead of only its densest sliver) and ``k`` pairs per stratum
    are drawn in md5 order of the pair key (a stable pseudo-random
    shuffle; "first k in storage order" would bias toward old crawl
    segments). The labeled batch feeds threshold_sweep / the FS
    trainer — the active-learning loop of Splink-style pipelines.

    Returns (id_a, id_b, score, stratum, sample_rank). Bounds are
    compared as given (pass exact literals; deriving them by float
    arithmetic on the caller side risks engine-mismatched bounds).

    Scale shape: one filter, then the same per-stratum md5 row_number
    as ``corpus.stratified_sample`` — the window partitions on the
    stratum id (≤``strata`` keys over the already-filtered band, a
    tiny fraction of the pair table).
    """
    width = F.lit(float(strata)) / (F.lit(hi) - F.lit(lo))
    stratum = F.least(
        F.floor((F.col(score_col) - F.lit(lo)) * width).cast("bigint"),
        F.lit(strata - 1))
    band = (scored
            .where((F.col(score_col) >= lo) & (F.col(score_col) < hi))
            .select("id_a", "id_b", F.col(score_col).alias("score"),
                    stratum.alias("stratum")))
    h = F.md5(F.concat_ws(":", F.col("id_a").cast("string"),
                          F.col("id_b").cast("string")))
    w = Window.partitionBy("stratum").orderBy(h, "id_a", "id_b")
    return (band.withColumn("sample_rank", F.row_number().over(w))
            .where(F.col("sample_rank") <= k))


def pair_provenance(channels: dict,
                    id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Per-pair blocking provenance: which channels proposed each
    candidate pair — the explainability row behind channel_stats'
    aggregates ("why is this pair even being scored?"), and the input
    for provenance-weighted scoring (pairs proposed by several
    independent channels are prior-likelier matches).

    Returns (id_a, id_b, channels, n_channels) with ``channels`` a
    lexicographically sorted array. Pairs are canonicalized
    (min, max) and deduplicated per channel first, so orientation or
    duplicates in any channel cannot inflate the counts.

    Scale shape: one union of the channel pair tables tagged with a
    literal, one distinct + groupBy on the pair key — all map-side
    combinable; output rows = distinct candidate pairs.
    """
    tagged = None
    for name in sorted(channels):
        t = (channels[name].select(
                F.least(F.col(id_a), F.col(id_b)).alias("id_a"),
                F.greatest(F.col(id_a), F.col(id_b)).alias("id_b"),
                F.lit(name).alias("channel"))
             .where(F.col("id_a") != F.col("id_b")))
        tagged = t if tagged is None else tagged.unionByName(t)
    return (tagged.distinct()
            .groupBy("id_a", "id_b")
            .agg(F.sort_array(F.collect_list("channel")).alias("channels"),
                 F.count("*").alias("n_channels")))
