"""Stage 6 — transitive clustering: connected components on match edges.

Reference parity: spikex merges overlapping "balls" transitively via repeated
set scans (``pipes/clusters.py:154-212``, G3/U3). At cluster scale that
becomes connected components over the match-edge graph, computed with the
alternating large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond" — the PAPERS.md reference), which
converges in O(log n) rounds of hash-join + partial-agg steps.

Algorithm (node ids must be orderable; we map arbitrary ids to longs first):

* large-star: for every node u, link every STRICTLY LARGER neighbor v to
  m(u) = min(N(u) ∪ {u}).
* small-star: for every node u, link every neighbor v ≤ u (and u itself) to
  m(u) = min(N≤(u) ∪ {u}).
* repeat until the edge set is stable → edges form stars rooted at component
  minima.

Scale notes:

* Each round = 2 shuffles (groupBy min + join); AQE coalesces.
* ``localCheckpoint`` every round truncates lineage — without it the plan
  doubles per round and the driver OOMs on plan strings long before data
  hurts (SURVEY.md §7 risk #3).
* Convergence check is a cheap count of changed edges (a scalar agg, no
  collect of data rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = und.groupBy("a").agg(F.min("b").alias("m"))
    mins = mins.select("a", F.least("m", F.col("a")).alias("m"))
    out = (
        und.join(mins, "a")
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("src"), F.col("m").alias("dst"))
    )
    return _canon(out)


def _small_star(e: DataFrame) -> DataFrame:
    # direct edges from larger to smaller: u = max, v = min
    d = e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    linked = (
        d.join(mins, "u")
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .union(mins.select(F.col("u").alias("src"), F.col("m").alias("dst")))
    )
    return _canon(linked)


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iter: int = 25) -> DataFrame:
    """Return (id, component) — component = min node id reachable.

    ``edges`` may use any orderable id type; isolated nodes don't appear
    (callers union them back with component = own id).
    """
    e = _canon(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    e = e.localCheckpoint()
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint()
        # converged when edge sets are identical (both are canonical+distinct)
        changed = (
            e2.join(e, ["a", "b"], "left_anti").limit(1).count()
            + e.join(e2, ["a", "b"], "left_anti").limit(1).count()
        )
        e = e2
        if changed == 0:
            break
    # converged stars are rooted at the component MIN, so in canonical
    # (a < b) form the root is `a` and members are `b`
    members = e.select(F.col("b").alias("id"), F.col("a").alias("component"))
    roots = e.select(F.col("a").alias("id"), F.col("a").alias("component")).distinct()
    return members.unionByName(roots).groupBy("id").agg(
        F.min("component").alias("component")
    )


def cluster_assignments(edges: DataFrame, all_ids: DataFrame,
                        id_col: str = "id") -> DataFrame:
    """(id, cluster_id) for EVERY id — singletons get their own id."""
    comp = connected_components(edges)
    ids = all_ids.select(F.col(id_col).alias("id")).distinct()
    return ids.join(comp, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("cluster_id")
    )
