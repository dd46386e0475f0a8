"""Persistent entity identifiers across ER runs.

Connected-components cluster ids are an artifact of one run (the min
member id of the component): re-resolving after new documents arrive
renumbers entities arbitrarily, which breaks every downstream system
that keyed on the entity id. ``stable_entity_ids`` implements the
standard max-overlap id carry-over (the "persistent id" step of
production MDM/linkage systems, cf. Christen "Data Matching" ch. 6 on
cluster comparison):

* each NEW cluster claims the PREVIOUS cluster it shares the most
  members with (ties → smallest previous id);
* when several new clusters claim the same previous id (a split),
  only the largest-overlap claimant inherits it (ties → smallest new
  id) — entity ids stay unique;
* unclaimed new clusters (genuinely new entities, or split losers)
  mint a fresh id from their smallest member.

Ids are namespaced strings — ``p:<prev>`` for inherited, ``n:<min
member>`` for minted — so inherited and fresh ids can never collide.

Beyond-reference (SURVEY.md §2.11): the reference resolves once per
dump and has no run-over-run identity story; at 10^12-document scale
re-runs are continuous and id churn is the failure users see first.

Scale shape: one equi-join on the record id (both sides partitioned by
it), two groupBy counts, two per-key window argmaxes over the CLUSTER
table (rows = number of clusters, not records), and one broadcast-size
join back to members. No cross products, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stable_entity_ids(prev: DataFrame, nxt: DataFrame,
                      id_col: str = "id",
                      cluster_col: str = "cluster_id") -> DataFrame:
    """(id_col, entity_id) for every record of ``nxt``.

    ``prev`` and ``nxt`` are (id_col, cluster_col) assignments from two
    ER runs over overlapping corpora. Deterministic: ties break on the
    smaller id at both argmaxes.
    """
    p = prev.select(F.col(id_col), F.col(cluster_col).alias("pc"))
    n = nxt.select(F.col(id_col), F.col(cluster_col).alias("nc"))

    ov = n.join(p, id_col).groupBy("nc", "pc").agg(
        F.count("*").alias("cnt"))

    claim_w = Window.partitionBy("nc").orderBy(F.desc("cnt"), F.asc("pc"))
    claims = (ov.withColumn("rk", F.row_number().over(claim_w))
                .where(F.col("rk") == 1).drop("rk"))

    award_w = Window.partitionBy("pc").orderBy(F.desc("cnt"), F.asc("nc"))
    awards = (claims.withColumn("rk", F.row_number().over(award_w))
                    .where(F.col("rk") == 1).select("nc", "pc"))

    fresh = n.groupBy("nc").agg(F.min(id_col).alias("min_id"))
    ids = fresh.join(awards, "nc", "left").select(
        "nc",
        F.when(F.col("pc").isNotNull(),
               F.concat(F.lit("p:"), F.col("pc").cast("string")))
         .otherwise(F.concat(F.lit("n:"), F.col("min_id").cast("string")))
         .alias("entity_id"),
    )
    return n.join(ids, "nc").select(id_col, "entity_id")


def run_diff(prev: DataFrame, nxt: DataFrame,
             id_col: str = "id",
             cluster_col: str = "cluster_id") -> DataFrame:
    """One-row churn summary between two ER runs — the review gate a
    production linkage team reads before shipping a re-resolve.

    (prev_clusters, next_clusters, identical, split_prev, merged_next,
    new_records, departed_records):

    * ``identical`` — clusters whose FULL member set is unchanged
      (set-hash equality: md5 over the sorted member list);
    * ``split_prev`` — previous clusters whose surviving members are
      spread over ≥2 next clusters;
    * ``merged_next`` — next clusters absorbing members of ≥2
      previous clusters;
    * ``new_records`` / ``departed_records`` — ids present in only
      one run.

    All exact integer counts. Scale shape: one shared-id equi-join,
    per-cluster set-hash groupBys (sorted member digest, no driver
    state), and scalar aggregates; the only wide rows are one per
    CLUSTER, not per record.
    """
    p = prev.select(F.col(id_col).alias("id"),
                    F.col(cluster_col).alias("pc"))
    n = nxt.select(F.col(id_col).alias("id"),
                   F.col(cluster_col).alias("nc"))

    def set_hash(df: DataFrame, cl: str) -> DataFrame:
        return df.groupBy(cl).agg(
            F.md5(F.concat_ws(
                ",", F.array_sort(F.collect_list(F.col("id").cast("string")))
            )).alias("h"))

    ph, nh = set_hash(p, "pc"), set_hash(n, "nc")
    identical = ph.join(nh, "h").agg(F.count("*").alias("identical"))

    ov = n.join(p, "id").groupBy("nc", "pc").agg(F.count("*").alias("c"))
    split_prev = (ov.groupBy("pc").agg(F.count("*").alias("k"))
                  .where(F.col("k") >= 2)
                  .agg(F.count("*").alias("split_prev")))
    merged_next = (ov.groupBy("nc").agg(F.count("*").alias("k"))
                   .where(F.col("k") >= 2)
                   .agg(F.count("*").alias("merged_next")))

    new_r = (n.join(p, "id", "left_anti")
             .agg(F.count("*").alias("new_records")))
    gone_r = (p.join(n, "id", "left_anti")
              .agg(F.count("*").alias("departed_records")))
    pc_n = p.agg(F.count_distinct("pc").alias("prev_clusters"))
    nc_n = n.agg(F.count_distinct("nc").alias("next_clusters"))

    out = (pc_n.crossJoin(nc_n).crossJoin(identical)
           .crossJoin(split_prev).crossJoin(merged_next)
           .crossJoin(new_r).crossJoin(gone_r))
    return out.select("prev_clusters", "next_clusters", "identical",
                      "split_prev", "merged_next",
                      "new_records", "departed_records")
