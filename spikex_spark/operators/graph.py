"""Graph operators: d-hop neighborhoods over edge DataFrames.

Reference parity (SURVEY.md §2.7):

* G1 — the CSR adjacency (``wikigraph/wikigraph.py:379-419``) is replaced by
  the edge DataFrame itself.
* G2 — ``get_categories``/``get_neighbors`` recursive expansion
  (``wikigraph.py:151-189``) becomes an iterative frontier⋈edges loop,
  ``distinct()`` per round; d is small (1-2) in the reference.
* U2 — undirected view = union of edges with reversed edges
  (``wikigraph.py:161-171``).

Scale notes: each hop is one shuffle join on src; the frontier stays small
relative to the edge table, so broadcast the frontier when it fits (we hint
it — d-hop frontiers from a single root are tiny). Visited-set dedup per
round bounds growth on cyclic graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """U2: symmetrize the edge set."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    return fwd.union(rev).distinct()


def d_hop_neighbors(edges: DataFrame, roots: DataFrame, d: int = 1,
                    directed: bool = True, include_roots: bool = False) -> DataFrame:
    """G2: nodes reachable from ``roots`` within d hops.

    ``roots``: single column ``id``. Output: (id, dist) with the MINIMUM
    distance (1..d) per reached node; roots excluded unless asked.
    """
    e = edges.select("src", "dst") if directed else undirected(edges)
    frontier = roots.select(F.col("id").alias("node")).distinct()
    visited = frontier.withColumn("dist", F.lit(0))
    for depth in range(1, d + 1):
        nxt = (
            F.broadcast(frontier)
            .join(e, frontier.node == e.src)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        nxt = nxt.join(visited.select("node"), "node", "left_anti")
        if depth < d:
            nxt = nxt.localCheckpoint(eager=False)
        visited = visited.union(nxt.withColumn("dist", F.lit(depth)))
        frontier = nxt
    out = visited.groupBy("node").agg(F.min("dist").alias("dist"))
    if not include_roots:
        out = out.where(F.col("dist") > 0)
    return out.select(F.col("node").alias("id"), "dist")
