"""Collective (relational-evidence) entity resolution rescoring.

Attribute similarity alone misses the matches the RELATIONS prove:
two noisy page records of the same entity often score just under the
threshold while both confidently match a third copy. Collective ER
(Bhattacharya & Getoor, "Collective entity resolution in relational
data", TKDD 2007) propagates that evidence — a candidate pair's score
is boosted by the Jaccard overlap of the two records' already-matched
neighborhoods in the match graph.

``collective_rescore`` is one propagation round over a scored pair
table:

* matches = pairs scoring ≥ ``match_thr`` (the evidence graph);
* for each CANDIDATE pair (a, b): ``common`` = third records matched
  to both a and b, ``union`` = |N(a) ∪ N(b)| over matched neighbors
  (endpoints included when (a, b) itself matched — the plain set
  union, no carve-outs, so both engines compute the same number);
* ``collective_score = min(1, score + boost · common/union)``
  (unchanged where the union is empty — no evidence, no boost).

Re-thresholding ``collective_score`` admits the under-threshold pairs
whose neighborhoods agree, and is the input to the next round when
iterating.

Beyond-reference (SURVEY.md §2.11): the reference scores pairs
independently and has no evidence propagation.

Scale shape: the evidence graph is a filter of the candidate pairs, so
per-record matched degree is bounded by the upstream blocking caps
(DOC_BUCKET_CAP) — the common-neighbor join fans out at most
candidates × capped-degree rows, never a hub blow-up. Two groupBy
counts + three equi-joins back to the pair table; no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def collective_rescore(pairs: DataFrame, match_thr: float = 0.80,
                       boost: float = 0.2, digits: int = 6) -> DataFrame:
    """One evidence-propagation round over ``(id_a, id_b, score)``.

    Returns every input pair with ``common_matches`` / ``union_matches``
    (exact int64 evidence counts) and ``collective_score``. Deterministic:
    pure counts + one IEEE round; the boosted score is capped at 1.0.
    """
    m = pairs.where(F.col("score") >= match_thr).select("id_a", "id_b")
    sym = m.union(m.select(F.col("id_b").alias("id_a"),
                           F.col("id_a").alias("id_b"))) \
           .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))

    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    common = (
        pairs.select("id_a", "id_b")
        .join(sym.select(F.col("src").alias("id_a"), F.col("dst").alias("c")),
              "id_a")
        .join(sym.select(F.col("src").alias("id_b"), F.col("dst").alias("c")),
              ["id_b", "c"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )

    out = (
        pairs
        .join(common, ["id_a", "id_b"], "left")
        .join(deg.select(F.col("src").alias("id_a"),
                         F.col("deg").alias("deg_a")), "id_a", "left")
        .join(deg.select(F.col("src").alias("id_b"),
                         F.col("deg").alias("deg_b")), "id_b", "left")
        .fillna(0, ["common", "deg_a", "deg_b"])
    )
    union_c = (F.col("deg_a") + F.col("deg_b") - F.col("common"))
    boosted = F.least(
        F.lit(1.0),
        F.col("score") + F.lit(boost) * F.col("common") / union_c)
    return out.select(
        "id_a", "id_b", "score",
        F.col("common").alias("common_matches"),
        union_c.cast("bigint").alias("union_matches"),
        F.round(F.when(union_c > 0, boosted).otherwise(F.col("score")),
                digits).alias("collective_score"),
    )
