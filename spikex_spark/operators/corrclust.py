"""Correlation clustering via parallel pivots (serializable KwikCluster).

Connected components (``cc.py``) answers transitive reachability: one
spurious a–b edge merges two otherwise-unrelated near-dup groups, and a
chain a–b–c clusters a with c despite no a–c evidence. Correlation
clustering instead minimizes DISAGREEMENTS (missing edges inside
clusters + present edges across clusters); KwikCluster (Ailon, Charikar
& Newman '08) is its classical 3-approximation: walk a random
permutation, each still-unclustered node becomes a pivot and grabs its
still-unclustered positive neighbors. A pivot cluster is a star — every
member is directly linked to the pivot — so a weak bridge can pull in
at most the bridge endpoint, never a whole second group.

Parallelization follows the serializable C4 rule (Pan et al. NIPS'15;
the lexicographically-first-MIS argument of Blelloch, Fineman & Shun):
a node acts only when it holds the permutation MINIMUM of its live
neighborhood — unclustered neighbors plus already-pivoted neighbors.
If the node itself is the minimum it pivots; if the minimum is a pivot
it joins that pivot; otherwise it waits for the smaller unclustered
neighbor to resolve first. Run to quiescence this reproduces the SERIAL
KwikCluster clustering exactly (pytest-pinned against a sequential
reference), so the 3-approximation guarantee carries over; two adjacent
pivots are impossible by antisymmetry of the minimum.

Determinism contract: the "random" permutation is
``md5(id) : zero-padded id`` — fixed by the data, collision-free via the
id tiebreak, uniform enough for the O(log n) expected rounds of the
KDD'14/NIPS'15 analyses. ``rounds`` is a FIXED parameter; nodes still
unclustered after the last round become singletons (documented
bounded-round semantics) so the DuckDB oracle can unroll the exact same
rounds as CTEs (the integer-PageRank / LPA recipe) and hash-match.

Scale shape: each round is two equi-joins of the edge table against the
unclustered and pivot node sets plus map-side-combined min aggregates —
no driver round-trips, no pair explosion; ``localCheckpoint`` cuts
lineage between rounds (the cc.py star-round pattern). The unclustered
set shrinks every round (its minimum always pivots), and dense blocks —
the ER case — resolve almost entirely in round 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _perm_key(idc: F.Column) -> F.Column:
    """The deterministic permutation key: md5 of the id's decimal string,
    id zero-padded as tiebreak (total order even under md5 collision)."""
    s = idc.cast("string")
    return F.concat(F.md5(s), F.lit(":"), F.lpad(s, 20, "0"))


def correlation_clusters(edges: DataFrame, nodes: DataFrame | None = None,
                         src: str = "src", dst: str = "dst",
                         id_col: str = "id", rounds: int = 3) -> DataFrame:
    """(id, cluster_id): bounded-round parallel KwikCluster over the
    positive-edge graph. ``edges`` may be directed or undirected — it is
    symmetrized and self-loop-stripped here. ``nodes`` (optional, one
    ``id_col`` column) adds isolated nodes, which pivot to singletons in
    round 1. Nodes unclustered after ``rounds`` become singletons."""
    e0 = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # eager checkpoint: sym is joined TWICE PER ROUND — without the cut,
    # every round re-derives whatever pipeline produced the edges (the
    # er_one_to_one pathology: the LSH+scoring chain re-ran 2R times)
    sym = (e0.unionByName(e0.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
           .where(F.col("src") != F.col("dst")).distinct()
           .localCheckpoint())
    if nodes is None:
        base = sym.select(F.col("src").alias("id")).distinct()
    else:
        base = (nodes.select(F.col(id_col).alias("id")).distinct()
                .unionByName(sym.select(F.col("src").alias("id")))
                .distinct())
    u = base.select("id", _perm_key(F.col("id")).alias("k"))
    # (id, k) of every pivot so far — joiners must see pivots from ALL
    # earlier rounds, not just this one (a node waits out a smaller
    # unclustered neighbor, then joins a pivot that fired rounds ago)
    pivots = u.where(F.lit(False))
    assigned = None

    for _ in range(rounds):
        # min permutation key among still-unclustered neighbors
        numin = (sym
                 .join(u.select(F.col("id").alias("src")), "src")
                 .join(u.select(F.col("id").alias("dst"),
                                F.col("k").alias("k_dst")), "dst")
                 .groupBy("src").agg(F.min("k_dst").alias("u_min")))
        # smallest pivot neighbor (id + key) among all pivots so far
        pmin = (sym
                .join(u.select(F.col("id").alias("src")), "src")
                .join(pivots.select(F.col("id").alias("dst"),
                                    F.col("k").alias("k_dst")), "dst")
                .groupBy("src")
                .agg(F.min("k_dst").alias("p_min"),
                     F.min_by("dst", "k_dst").alias("p_id")))
        st = (u.join(numin, u["id"] == numin["src"], "left").drop("src")
              .join(pmin, u["id"] == pmin["src"], "left").drop("src"))
        live_min = F.least(F.col("u_min"), F.col("p_min"))  # null-skipping
        is_pivot = live_min.isNull() | (F.col("k") < live_min)
        # the live minimum is a pivot -> join it; an unclustered
        # neighbor -> wait for it to resolve
        joins_now = (~is_pivot) & F.col("p_min").isNotNull() & (
            F.col("u_min").isNull() | (F.col("p_min") < F.col("u_min")))
        new_pivots = st.where(is_pivot).select("id", "k")
        joiners = st.where(joins_now).select(
            "id", F.col("p_id").alias("cluster_id"))
        round_asg = (new_pivots.select("id", F.col("id").alias("cluster_id"))
                     .unionByName(joiners))
        assigned = (round_asg if assigned is None
                    else assigned.unionByName(round_asg))
        # eager checkpoints: each round's joins otherwise re-derive every
        # earlier round (the plan grows multiplicatively with R, unlike
        # LPA's fixed 3 rounds); u shrinks monotonically so these
        # materializations are small and let us stop early when done
        pivots = pivots.unionByName(new_pivots).localCheckpoint()
        u = (st.where(~is_pivot & ~joins_now).select("id", "k")
             .localCheckpoint())
        if u.isEmpty():
            break

    leftovers = u.select("id", F.col("id").alias("cluster_id"))
    return assigned.unionByName(leftovers)


def canopy_assign(edges_loose: DataFrame, edges_tight: DataFrame,
                  nodes: DataFrame | None = None,
                  src: str = "src", dst: str = "dst",
                  id_col: str = "id", rounds: int = 3) -> DataFrame:
    """(center_id, member_id): canopy clustering (McCallum, Nigam &
    Ungar KDD'00) — OVERLAPPING coarse groups from a cheap similarity,
    the classic pre-blocking step before expensive pairwise scoring.

    Canopy centers are a greedy maximal independent set over the TIGHT
    (T2) graph: walking the permutation, each record not within T2 of
    an earlier center becomes one. That is exactly the KwikCluster
    pivot set, so centers are computed by :func:`correlation_clusters`
    on the tight edges (``id == cluster_id`` rows — bounded-round
    leftovers become centers too, keeping every record covered).
    Membership is then one equi-join: every record within the LOOSE
    (T1) threshold of a center joins that canopy — records may join
    SEVERAL canopies (that overlap is the point: near-boundary records
    are compared in both neighborhoods instead of being cut by a hard
    partition). Every center is a member of its own canopy.

    Scale shape: the pivot rounds of correlation_clusters plus one
    symmetrized T1-edge join against the (smaller) center set.
    """
    centers = (correlation_clusters(edges_tight, nodes, src=src, dst=dst,
                                    id_col=id_col, rounds=rounds)
               .where(F.col("id") == F.col("cluster_id"))
               .select(F.col("id").alias("center_id")))
    e0 = edges_loose.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = (e0.unionByName(e0.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
           .where(F.col("src") != F.col("dst")).distinct())
    near = (sym.join(centers, sym["src"] == centers["center_id"])
            .select("center_id", F.col("dst").alias("member_id")))
    self_rows = centers.select("center_id",
                               F.col("center_id").alias("member_id"))
    return near.unionByName(self_rows).distinct()
