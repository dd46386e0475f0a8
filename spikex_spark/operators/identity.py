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
