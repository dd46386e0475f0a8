"""Survivorship — collapse each entity cluster to one golden record.

After blocking → scoring → clustering, an MDM/ER pipeline ends by
*merging*: pick, per cluster and per attribute, the value to publish.
``dedup.canonical_docs`` keeps one whole SURVIVOR ROW (longest text);
``golden_records`` instead fuses attribute-wise — each attribute takes
its modal value across the cluster's members (most frequent, ties to
the smallest value), which is the standard majority-vote fusion rule
and is deliberately NOT always any single member's row.

Reference parity: beyond-reference ER toolchain (SURVEY.md §2.11) —
spikex stops at linking, it never fuses.

Scale shape: one groupBy per attribute over (cluster, value) plus one
row_number window on the grouped output (already one row per distinct
value — tiny), then 1-row-per-cluster joins. Attribute votes are
map-side combined; nothing touches the driver. NULLs never vote (a
cluster whose attribute is all-NULL publishes NULL), and the tie-break
orders values ascending with an explicit cast to string-stable
ordering in both engines.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def modal_value(df: DataFrame, group_col: str, value_col: str,
                out_col: str | None = None) -> DataFrame:
    """(group, modal value): most frequent non-NULL value per group,
    ties broken by the smallest value. Groups with no non-NULL values
    are absent (callers left-join)."""
    out = out_col or value_col
    votes = (df.where(F.col(value_col).isNotNull())
             .groupBy(F.col(group_col).alias("_g"),
                      F.col(value_col).alias("_v"))
             .agg(F.count("*").alias("_n")))
    w = Window.partitionBy("_g").orderBy(F.col("_n").desc(), F.col("_v"))
    return (votes.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select(F.col("_g").alias(group_col), F.col("_v").alias(out)))


def golden_records(clusters: DataFrame, records: DataFrame,
                   attr_cols: Sequence[str],
                   cluster_col: str = "cluster_id",
                   id_col: str = "doc_id",
                   size_col: str | None = None) -> DataFrame:
    """One golden row per cluster: (cluster_id, n_members, keep_id,
    <modal attr columns>).

    ``keep_id`` is the representative member (largest ``size_col``,
    ties to the smallest id; smallest id when ``size_col`` is None) —
    the row a consumer dereferences for payload columns that cannot be
    majority-voted (full text, binary blobs). Modal attributes are
    fused independently per column.
    """
    base = (clusters.select(F.col(id_col).alias("_id"),
                            F.col(cluster_col).alias("_cl"))
            .join(records.withColumnRenamed(id_col, "_id"), "_id"))
    order = ([F.col(size_col).desc(), F.col("_id")]
             if size_col else [F.col("_id")])
    w = Window.partitionBy("_cl").orderBy(*order)
    keep = (base.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select(F.col("_cl"), F.col("_id").alias("keep_id")))
    sizes = base.groupBy("_cl").agg(F.count("*").alias("n_members"))
    out = sizes.join(keep, "_cl")
    for a in attr_cols:
        out = out.join(modal_value(base, "_cl", a), "_cl", "left")
    return out.select(F.col("_cl").alias(cluster_col), "n_members",
                      "keep_id", *attr_cols)


def field_conflicts(clusters: DataFrame, records: DataFrame,
                    attr_cols: Sequence[str],
                    cluster_col: str = "cluster_id",
                    id_col: str = "doc_id",
                    digits: int = 6) -> DataFrame:
    """Per-field conflict report over the multi-member clusters — the
    data-fusion diagnostic (Bleiholder & Naumann, "Data fusion", ACM
    CS 2009) that says how much ``golden_records``' majority vote
    actually threw away.

    One row per attribute: (field, n_multi_clusters, n_conflicted,
    conflict_rate, majority_agreement) where ``n_conflicted`` counts
    multi-member clusters holding >1 distinct value for the field and
    ``majority_agreement`` is the member-weighted fraction that agrees
    with the modal value (1.0 = the vote was unanimous everywhere; low
    values mean the published golden value misrepresents many members).

    Exact integer counts until two rounded divisions. Scale shape: the
    melt is a narrow per-row explode (rows × |attr_cols|), then two
    map-side-combined groupBys down to (cluster, field) and (field) —
    no windows, no driver state.
    """
    base = (clusters.select(F.col(id_col).alias("_id"),
                            F.col(cluster_col).alias("_cl"))
            .join(records.withColumnRenamed(id_col, "_id"), "_id"))
    stack_args = ", ".join(
        f"'{a}', cast(`{a}` as string)" for a in attr_cols)
    melted = base.select(
        "_cl",
        F.expr(f"stack({len(attr_cols)}, {stack_args})")
         .alias("field", "value"))
    vc = (melted.groupBy("_cl", "field", "value")
          .agg(F.count("*").alias("_c")))
    pc = (vc.groupBy("_cl", "field")
          .agg(F.sum("_c").alias("_n"),
               F.count("*").alias("_ndv"),
               F.max("_c").alias("_modal"))
          .where(F.col("_n") >= 2))
    conflicted = F.sum(F.when(F.col("_ndv") > 1, 1).otherwise(0))
    return (pc.groupBy("field").agg(
        F.count("*").alias("n_multi_clusters"),
        conflicted.cast("bigint").alias("n_conflicted"),
        F.round(conflicted.cast("double") / F.count("*"),
                digits).alias("conflict_rate"),
        F.round(F.sum("_modal").cast("double") / F.sum("_n"),
                digits).alias("majority_agreement")))


def cluster_medoids(clusters: DataFrame, matched: DataFrame,
                    id_col: str = "doc_id",
                    cluster_col: str = "cluster_id",
                    id_a: str = "id_a", id_b: str = "id_b",
                    score_col: str = "score") -> DataFrame:
    """Medoid representative per cluster: the member with the highest
    summed match score to its co-members (ties → smallest id) — the
    evidence-centred alternative to golden_records' keep-row rules
    (longest text picks verbosity; the medoid picks the record every
    other member actually agrees with).

    Scores enter as ``round(score·1e4)`` int64 so the per-member sums
    are exact (float reduction order can never move the argmax).
    Members with no intra-cluster edges (singletons, stragglers) carry
    sum 0 and lose ties by id. Returns (cluster_id, medoid_id,
    score_sum_scaled) — one row per cluster, singletons included.

    Scale shape: one symmetric edge expansion joined to the membership
    table on each endpoint, a map-side-combined (cluster, member)
    groupBy, and a per-cluster argmax window over the MEMBER table
    (rows = records, keys = clusters — the same shape golden_records
    already runs).
    """
    mem = clusters.select(F.col(id_col).alias("node"),
                          F.col(cluster_col).alias("_cl"))
    scaled = F.round(F.col(score_col) * F.lit(10000.0)).cast("long")
    sym = (matched.select(F.col(id_a).alias("node"),
                          F.col(id_b).alias("peer"),
                          scaled.alias("s"))
           .union(matched.select(F.col(id_b).alias("node"),
                                 F.col(id_a).alias("peer"),
                                 scaled.alias("s"))))
    intra = (sym.join(mem, "node")
             .join(mem.select(F.col("node").alias("peer"),
                              F.col("_cl").alias("_cl2")), "peer")
             .where(F.col("_cl") == F.col("_cl2")))
    per = intra.groupBy("_cl", "node").agg(F.sum("s").alias("ssum"))
    base = (mem.join(per, ["_cl", "node"], "left")
            .fillna(0, ["ssum"]))
    w = Window.partitionBy("_cl").orderBy(F.desc("ssum"), F.asc("node"))
    return (base.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") == 1)
            .select(F.col("_cl").alias(cluster_col),
                    F.col("node").alias("medoid_id"),
                    F.col("ssum").alias("score_sum_scaled")))


def truth_discovery(claims: DataFrame, rounds: int = 3,
                    init_trust_micro: int = 800_000):
    """Iterative weighted-vote truth discovery (the TruthFinder /
    Dong–Srivastava data-fusion recipe, linearized): fuse conflicting
    per-entity claims by trusting sources in proportion to how often
    their past claims matched the consensus.

    ``claims`` = (entity, src, value) — one row per source assertion.
    Per round: each candidate value's score is the exact int64 sum of
    its supporting sources' micro-int trusts; the fused value is the
    (score DESC, value ASC) argmax; each source's trust becomes the
    half-up micro ratio of its matching claims (``(2n·10⁶+d) div 2d``,
    the linkage._snap_ratio discipline — no float rounding mode ever
    decides a trust), clamped to [1, 999999].  A fixed round count makes
    both outputs total deterministic functions of the claims — the
    oracle unrolls the rounds.

    Returns ``(fused, trust)``: fused = (entity, fused_value,
    score_micro, n_votes); trust = (src, trust_micro, n_claims,
    n_correct) at the final round.

    Scale: per round one (entity, value) groupBy-sum against a
    broadcast-size trust table, one per-entity argmax window, one
    per-source ratio agg.  Majority voting (golden_records) is the
    rounds=0 degenerate case; this is what to run when sources have
    systematic quality differences a flat vote hides.
    """
    c = claims.select("entity", "src", "value").where(
        F.col("value").isNotNull()).localCheckpoint(eager=False)
    srcs = c.select("src").distinct()
    trust = srcs.withColumn(
        "trust_micro", F.lit(int(init_trust_micro)).cast("long"))
    chosen = None
    for _ in range(rounds):
        scored = (
            c.join(F.broadcast(trust), "src")
            .groupBy("entity", "value")
            .agg(F.sum("trust_micro").cast("long").alias("score_micro"),
                 F.count("*").cast("long").alias("n_votes"))
        )
        w = Window.partitionBy("entity").orderBy(
            F.col("score_micro").desc(), F.col("value").asc())
        chosen = (scored.withColumn("_rk", F.row_number().over(w))
                  .where(F.col("_rk") == 1)
                  .select("entity", F.col("value").alias("fused_value"),
                          "score_micro", "n_votes")
                  .localCheckpoint(eager=False))
        per_src = (
            c.join(chosen.select("entity", "fused_value"), "entity")
            .groupBy("src")
            .agg(F.count("*").cast("long").alias("n_claims"),
                 F.sum(F.when(F.col("value") == F.col("fused_value"), 1)
                       .otherwise(0)).cast("long").alias("n_correct"))
        )
        trust = per_src.select(
            "src",
            F.greatest(F.lit(1), F.least(F.lit(999_999), F.expr(
                "(2 * n_correct * 1000000 + n_claims) div (2 * n_claims)")
            )).cast("long").alias("trust_micro"),
            "n_claims", "n_correct",
        ).localCheckpoint(eager=False)
    return chosen, trust
