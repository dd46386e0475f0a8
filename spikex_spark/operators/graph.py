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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PR_SCALE = 10**12


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


def pagerank(edges: DataFrame, iterations: int = 5,
             damping_pct: int = 85) -> DataFrame:
    """Integer-exact PageRank: (id, rank_scaled, rank).

    All arithmetic is int64 in a 10^12 fixed-point space — float PageRank
    sums are reduction-order-dependent, so two runs (or two engines)
    disagree in the last ulps; scaled-integer ranks with truncating
    division are bit-reproducible, which makes the result oracle-checkable
    and the job idempotent for lineage gating::

        r0       = SCALE div N                          (uniform)
        contrib  = r div outdeg          per out-edge   (trunc division)
        r_{t+1}  = ((100-d)·r0) div 100 + (d·Σ contrib) div 100

    Dangling nodes (no out-edges) leak their mass — the standard
    simplification; ranks are a fixed multiple short of summing to 1 and
    ordering is unaffected for ranking use.

    Scale shape: each iteration is ONE shuffle join of the rank table
    against the (edge ⋈ outdeg) table — precomputed once — plus ONE
    map-side-combined groupBy on dst. The rank table is |V| rows, edges
    |E|; nothing driver-side except the scalar node count. Lineage is
    truncated per iteration (lazy localCheckpoint) so the unrolled plan
    stays flat at high iteration counts; a cluster run would checkpoint
    to reliable storage every ~10 rounds instead.
    """
    e = edges.select("src", "dst").distinct()
    nodes = (e.select(F.col("src").alias("id"))
             .union(e.select(F.col("dst").alias("id"))).distinct()
             .localCheckpoint(eager=False))
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    ewd = e.join(outdeg, "src").localCheckpoint(eager=False)
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "id", F.lit(0).cast("long").alias("rank_scaled"),
            F.lit(0.0).alias("rank"))
    init = _PR_SCALE // n
    base = ((100 - damping_pct) * init) // 100
    ranks = nodes.withColumn("r", F.lit(init).cast("long"))
    for _ in range(iterations):
        contrib = (
            ranks.join(ewd, ranks.id == ewd.src)
            .select(F.col("dst").alias("id"),
                    F.expr("r div outdeg").alias("c"))
            .groupBy("id").agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (F.lit(base)
                 + F.expr(f"({damping_pct} * coalesce(s, 0)) div 100")
                 ).cast("long").alias("r"))
            .localCheckpoint(eager=False)
        )
    return ranks.select(
        "id", F.col("r").alias("rank_scaled"),
        (F.col("r") / F.lit(float(_PR_SCALE))).alias("rank"))


def personalized_pagerank(edges: DataFrame, seeds: DataFrame,
                          iterations: int = 5,
                          damping_pct: int = 85) -> DataFrame:
    """Integer-exact PERSONALIZED PageRank: (id, rank_scaled, rank) with
    teleport mass restricted to ``seeds`` (one ``id`` column) — "related
    to THESE entities", the recommendation/expansion twin of the global
    :func:`pagerank` (same int64 fixed-point discipline, same
    truncating-division reproducibility contract)::

        r0   = SCALE div |S|   on seeds, 0 elsewhere
        r_t+1 = seed·((100-d)·(SCALE div |S|)) div 100
                + (d·Σ contrib) div 100

    Used over the alias/link graph it answers "which pages are in this
    entity's neighborhood" without a global ranking ever being computed.
    Scale shape identical to pagerank: one join + one map-side-combined
    groupBy per iteration, |V|-row rank table, per-iteration lineage
    truncation.
    """
    e = edges.select("src", "dst").distinct()
    nodes = (e.select(F.col("src").alias("id"))
             .union(e.select(F.col("dst").alias("id"))).distinct()
             .localCheckpoint(eager=False))
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    ewd = e.join(outdeg, "src").localCheckpoint(eager=False)
    sd = (seeds.select(F.col("id")).distinct()
          .join(nodes, "id", "semi").localCheckpoint(eager=False))
    ns = sd.count()
    if ns == 0:
        return nodes.select(
            "id", F.lit(0).cast("long").alias("rank_scaled"),
            F.lit(0.0).alias("rank"))
    init = _PR_SCALE // ns
    base = ((100 - damping_pct) * init) // 100
    flag = sd.withColumn("_seed", F.lit(1))
    ranks = (nodes.join(flag, "id", "left")
             .select("id", F.when(F.col("_seed") == 1, F.lit(init))
                     .otherwise(F.lit(0)).cast("long").alias("r")))
    for _ in range(iterations):
        contrib = (
            ranks.join(ewd, ranks.id == ewd.src)
            .select(F.col("dst").alias("id"),
                    F.expr("r div outdeg").alias("c"))
            .groupBy("id").agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(flag, "id", "left")
            .join(contrib, "id", "left")
            .select(
                "id",
                (F.when(F.col("_seed") == 1, F.lit(base))
                 .otherwise(F.lit(0))
                 + F.expr(f"({damping_pct} * coalesce(s, 0)) div 100")
                 ).cast("long").alias("r"))
            .localCheckpoint(eager=False)
        )
    return ranks.select(
        "id", F.col("r").alias("rank_scaled"),
        (F.col("r") / F.lit(float(_PR_SCALE))).alias("rank"))


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation: (id, triangles), zero-inclusive.

    Triangles measure local closure — the spam/link-farm and community
    signal over a web graph. The naive 3-way self-join enumerates every
    wedge at every hub (a degree-d node contributes O(d²) wedges: one
    viral page breaks the job). This is the degree-ordered node-iterator
    instead (Suri & Vassilvitskii's MapReduce formulation): orient every
    undirected edge from the (degree, id)-smaller endpoint to the larger,
    build wedges only at each edge's SMALLEST endpoint, and close them
    with one semi-join back on the oriented edge set. Wedge count is
    bounded by O(m^1.5) total and O(√m) per node regardless of hub
    degree — the skew is structurally removed, not salted around.

    Input may contain duplicates, self-loops, or both orientations; each
    triangle is counted exactly once.
    """
    ue = (edges.where(F.col("src") != F.col("dst"))
          .select(F.least("src", "dst").alias("a"),
                  F.greatest("src", "dst").alias("b"))
          .distinct())
    deg = (ue.select(F.col("a").alias("id"))
           .union(ue.select(F.col("b").alias("id")))
           .groupBy("id").agg(F.count("*").alias("deg")))
    da, db = [deg.select(F.col("id").alias(c),
                         F.struct(F.col("deg"), F.col("id")).alias(f"rk_{c}"))
              for c in ("a", "b")]
    with_rk = ue.join(da, "a").join(db, "b")
    o = with_rk.select(
        F.when(F.col("rk_a") < F.col("rk_b"), F.col("a"))
        .otherwise(F.col("b")).alias("src"),
        F.when(F.col("rk_a") < F.col("rk_b"), F.col("b"))
        .otherwise(F.col("a")).alias("dst"),
        F.when(F.col("rk_a") < F.col("rk_b"), F.col("rk_b"))
        .otherwise(F.col("rk_a")).alias("rk_dst"),
    )
    e1, e2 = o.alias("e1"), o.alias("e2")
    wedges = (e1.join(e2, F.col("e1.src") == F.col("e2.src"))
              .where(F.col("e1.rk_dst") < F.col("e2.rk_dst"))
              .select(F.col("e1.src").alias("x"),
                      F.col("e1.dst").alias("y"),
                      F.col("e2.dst").alias("z")))
    closing = o.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    tris = wedges.join(closing, ["y", "z"], "left_semi")
    per_node = (tris.select(F.explode(F.array("x", "y", "z")).alias("id"))
                .groupBy("id").agg(F.count("*").alias("triangles")))
    return (deg.select("id").join(per_node, "id", "left")
            .select("id", F.coalesce("triangles", F.lit(0))
                    .cast("long").alias("triangles")))


def common_neighbor_similarity(edges: DataFrame,
                               max_center_degree: int = 64) -> DataFrame:
    """Link prediction / graph-ER features: (id_a, id_b, common, deg_a,
    deg_b, jaccard) for every node pair sharing ≥1 neighbor.

    Common-neighbor counts and neighborhood Jaccard are the classic
    link-prediction scores (Liben-Nowell & Kleinberg '03) and, over an
    ER similarity graph, the "do these two records co-occur with the
    same witnesses" feature. Wedges are built at the shared neighbor
    (one self-join of the edge list on the CENTER column, map-side
    count); a degree-d center emits O(d²) wedges, so centers above
    ``max_center_degree`` are excluded — the standard hub cut (a viral
    node's neighborhood says nothing discriminative, and the cut is part
    of the metric's definition so the oracle applies it identically).
    Degrees (for the Jaccard denominator) are computed over the FULL
    graph, not the hub-cut one. All counts are exact integers; jaccard
    is the single division common/(deg_a + deg_b - common), rounded 6.

    ``edges`` must be undirected (both directions present).
    """
    e = edges.select("src", "dst").where(
        F.col("src") != F.col("dst")).distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("deg")) \
           .withColumnRenamed("src", "id")
    centers_ok = deg.where(F.col("deg") <= max_center_degree) \
                    .select(F.col("id").alias("c"))
    # wedges at each kept center: (neighbor_a, neighbor_b) with a < b
    by_center = e.select(F.col("src").alias("c"), F.col("dst").alias("n")) \
                 .join(centers_ok, "c")
    l, r = by_center.alias("l"), by_center.alias("r")
    pairs = (l.join(r, "c")
             .where(F.col("l.n") < F.col("r.n"))
             .groupBy(F.col("l.n").alias("id_a"),
                      F.col("r.n").alias("id_b"))
             .agg(F.count("*").alias("common")))
    da = deg.select(F.col("id").alias("id_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("id_b"), F.col("deg").alias("deg_b"))
    out = pairs.join(da, "id_a").join(db, "id_b")
    union = F.col("deg_a") + F.col("deg_b") - F.col("common")
    return out.select(
        "id_a", "id_b", "common", "deg_a", "deg_b",
        F.round(F.col("common").cast("double") / union.cast("double"),
                6).alias("jaccard"))


def mutual_knn_edges(matched: DataFrame, k: int = 3,
                     score_col: str = "score",
                     id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Giant-component prevention: keep a match edge only when each
    endpoint ranks the other among its ``k`` strongest matches.

    Transitive closure over ALL matches chain-merges boilerplate hubs
    into one giant entity (the classic web-ER failure); mutual-kNN
    sparsification (the graph-clustering standard, cf. Maier et al.
    NIPS'09 on kNN-graph cluster identification) bounds every node's
    degree at ``k`` BEFORE clustering, so no component can outgrow
    what genuine pairwise evidence supports.

    Rank ties break on the partner id ascending (scores arrive
    decimal-rounded, so ties are real and the order must be total).
    Returns undirected (src, dst) with src < dst.

    Scale shape: one per-node window over the matched edges (degree
    already bounded by the blocking caps) + one self-equi-join on the
    reversed key to test mutuality — both shuffle on node ids, no
    driver state, output degree ≤ k by construction.
    """
    sym = (matched.select(F.col(id_a).alias("src"),
                          F.col(id_b).alias("dst"),
                          F.col(score_col).alias("_s"))
           .union(matched.select(F.col(id_b).alias("src"),
                                 F.col(id_a).alias("dst"),
                                 F.col(score_col).alias("_s"))))
    w = Window.partitionBy("src").orderBy(F.desc("_s"), F.asc("dst"))
    kept = (sym.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= k).select("src", "dst"))
    rev = kept.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (kept.join(rev, ["src", "dst"])
            .where(F.col("src") < F.col("dst"))
            .select("src", "dst"))


def kcore_nodes(edges: DataFrame, k: int = 2, rounds: int = 6,
                src: str = "src", dst: str = "dst") -> DataFrame:
    """Nodes of the k-core after ``rounds`` peeling iterations — the
    dense-evidence core of a match graph (every member keeps ≥ k
    matched neighbors AFTER all weakly-attached records are peeled),
    the standard "which entities are solid" cut (Seidman '83).

    Each round removes every node whose current degree is < k together
    with its edges; ``rounds`` is FIXED so both engines replay the
    identical peeling prefix (at match-graph densities peeling
    converges in a handful of rounds; an unconverged prefix is still
    the same deterministic set in both engines). Returns (node,) —
    the nodes whose degree in the surviving graph is still ≥ k.

    Scale shape: per round one symmetric groupBy degree count + two
    semi-joins of the edge list against surviving nodes, checkpointed
    so the lineage stays one round deep; no driver state.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    for _ in range(rounds):
        sym = e.select(F.col("s").alias("n")).union(
            e.select(F.col("d").alias("n")))
        keep = (sym.groupBy("n").agg(F.count("*").alias("deg"))
                .where(F.col("deg") >= k).select("n"))
        e = (e.join(keep.select(F.col("n").alias("s")), "s", "left_semi")
             .join(keep.select(F.col("n").alias("d")), "d", "left_semi")
             .select("s", "d").localCheckpoint())
    sym = e.select(F.col("s").alias("n")).union(
        e.select(F.col("d").alias("n")))
    return (sym.groupBy("n").agg(F.count("*").alias("deg"))
            .where(F.col("deg") >= k).select(F.col("n").alias("node")))


def wl_fingerprints(edges: DataFrame, rounds: int = 2,
                    src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, degree, wl_label) — Weisfeiler–Lehman structural
    fingerprints: iterative neighborhood-label refinement (Weisfeiler &
    Lehman 1968; the WL-subtree kernel of Shervashidze et al., JMLR
    2011).  Round 0 labels every node with its degree; each round
    relabels a node with ``md5(own || '|' || sorted neighbor labels)``,
    so after R rounds two nodes share a label iff their radius-R
    neighborhood trees are isomorphic (up to hash collision).

    Web-ER use: WL colors are STRUCTURAL blocking keys — templated
    mirror sites reproduce their link topology, so mirror candidates
    share colors even when every URL and anchor differs (the
    structure-only complement to the content and alias channels), and
    color histograms fingerprint whole site subgraphs for graph-level
    dedup.

    Scale shape: one round = one equi-join (labels onto the edge list,
    shuffled on node) + one groupBy(node) with a sorted-array agg —
    both partitioned on the node key, so AQE reuses the exchange across
    rounds; ``rounds`` is small and fixed (WL stabilizes in O(diameter)
    rounds, 2–3 in practice).  The collected neighbor-label array is
    bounded by max degree — the same hub-cap discipline as every other
    channel applies upstream if hubs are unbounded.
    """
    und = undirected(edges, src, dst)  # both orientations, deduped
    labels = und.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("degree"))
    labels = labels.withColumn("lab", F.col("degree").cast("string"))
    for _ in range(rounds):
        nb = (und.join(labels.select(F.col("node").alias("dst"),
                                     F.col("lab").alias("nlab")), "dst")
              .groupBy(F.col("src").alias("node"))
              .agg(F.array_join(F.array_sort(F.collect_list("nlab")), ",")
                   .alias("njoin")))
        labels = (labels.join(nb, "node")
                  .select("node", "degree",
                          F.substring(
                              F.md5(F.concat_ws("|", "lab", "njoin")),
                              1, 16).alias("lab")))
    return labels.select("node", "degree", F.col("lab").alias("wl_label"))


_NF_HASH_BITS = 48  # 12 hex chars: (k-1)·2^48 stays inside int64 for k ≤ 32


def neighborhood_function(edges: DataFrame, rounds: int = 3, k: int = 32,
                          src: str = "src", dst: str = "dst") -> DataFrame:
    """(t, n_nodes, reachable_pairs, n_saturated) for t = 0..rounds — the
    neighborhood function N(t) = Σ_v |ball(v, t)|: how many (source,
    destination) pairs are within t hops, the curve behind effective-
    diameter / average-distance estimates (HyperBall, Boldi & Vigna
    2013 — here with BOTTOM-K/KMV sketches instead of HyperLogLog, the
    same mergeable-sketch idea but with an integer-exact estimator:
    ``(k-1)·2^48 // θ_k``, no harmonic float sum, so the oracle can
    reproduce every bit; same trade made in sketch.kmv_distinct).

    Per node, the sketch is the k smallest 48-bit md5 hashes of the node
    ids reachable so far; one round merges each node's sketch with its
    neighbors' (flatten → distinct → sort → first k). Balls smaller than
    k are counted EXACTLY (the sketch holds the whole ball); larger
    balls use the KMV estimate and are reported in ``n_saturated``.

    Scale shape — the reason this exists next to d_hop_neighbors: exact
    d-hop materialization shuffles O(Σ|ball|) rows, which explodes on a
    web graph (balls reach the giant component within 3–4 hops).  Here
    every round shuffles exactly O(E·k) hash values regardless of ball
    size: one equi-join of fixed-width sketches onto the edge list +
    one groupBy(node) merge, both partitioned on the node key.  k
    trades accuracy for bytes; rounds is the max radius probed.
    """
    und = undirected(edges, src, dst)
    nodes = und.select(F.col("src").alias("node")).distinct()
    h = F.conv(F.substring(F.md5(F.col("node").cast("string")), 1, 12),
               16, 10).cast("long")
    sk = nodes.select("node", F.array(h).alias("sk"))

    def _round_stats(sk_df: DataFrame, t: int) -> DataFrame:
        # exact int64 division (`div`, not float floor-division): the
        # oracle's `//` must match bit-for-bit
        numer = (k - 1) * (1 << _NF_HASH_BITS)
        est = F.when(
            F.size("sk") < k, F.size("sk").cast("long")
        ).otherwise(
            F.expr(f"CAST({numer} AS BIGINT) div element_at(sk, {k})"))
        sat = F.when(F.size("sk") >= k, F.lit(1)).otherwise(F.lit(0))
        return sk_df.agg(
            F.count("*").alias("n_nodes"),
            F.sum(est).alias("reachable_pairs"),
            F.sum(sat).cast("long").alias("n_saturated"),
        ).select(F.lit(t).cast("int").alias("t"), "n_nodes",
                 "reachable_pairs", "n_saturated")

    out = _round_stats(sk, 0)
    for t in range(1, rounds + 1):
        nb = (und.join(sk.select(F.col("node").alias("dst"),
                                 F.col("sk").alias("nsk")), "dst")
              .select(F.col("src").alias("node"), F.col("nsk").alias("sk")))
        merged = (sk.unionByName(nb)
                  .groupBy("node")
                  .agg(F.slice(
                      F.array_sort(
                          F.array_distinct(F.flatten(F.collect_list("sk")))),
                      1, k).alias("sk")))
        # barrier per round: each round's stats AND the next round read
        # the merged sketches — materialize once instead of re-running
        # the whole join chain per consumer
        sk = merged.localCheckpoint()
        out = out.unionByName(_round_stats(sk, t))
    return out


def cluster_bfs_depth(clusters: DataFrame, edges: DataFrame,
                      id_col: str = "id", cluster_col: str = "cluster_id",
                      a_col: str = "id_a", b_col: str = "id_b",
                      max_depth: int = 6) -> DataFrame:
    """(cluster_id, n_members, depth, n_unreached): per-cluster BFS
    eccentricity of the canonical seed — the chain-merge detector. A
    transitively-closed cluster whose members all match the canonical
    directly has depth 1; depth ≥3 means members were welded in through
    chains of pairwise matches and deserve QC review (the weak-bridge
    pathology ``er_unsupported_edges`` flags edge-wise, measured here
    cluster-wise).

    Requires the min-id cluster convention (cluster_id IS a member id —
    the engine's CC output contract). BFS runs ``max_depth`` frontier
    ⋈ edges rounds restricted to within-cluster edges; unreached >0 can
    only appear when ``max_depth`` truncates (every cluster is connected
    by construction), so it doubles as the truncation flag.

    Scale shape: each round is one join on the frontier key + an
    anti-join against the visited set — the d-hop recipe with the same
    per-round ``localCheckpoint`` plan-linearization; no pair or path
    materialization (paths dedup to min-depth per node every round).
    """
    m = clusters.select(F.col(id_col).alias("node"),
                        F.col(cluster_col).alias("cl"))
    sym = undirected(edges.select(F.col(a_col).alias("src"),
                                  F.col(b_col).alias("dst")))
    e = (sym.join(m.withColumnsRenamed({"node": "src", "cl": "ca"}), "src")
         .join(m.withColumnsRenamed({"node": "dst", "cl": "cb"}), "dst")
         .where(F.col("ca") == F.col("cb"))
         .select("src", "dst", F.col("ca").alias("cl"))
         .localCheckpoint(eager=False))
    dist = (m.where(F.col("node") == F.col("cl"))
            .select("cl", "node", F.lit(0).alias("d")))
    frontier = dist
    for r in range(1, max_depth + 1):
        nxt = (frontier.join(e, (frontier["node"] == e["src"])
                             & (frontier["cl"] == e["cl"]))
               .select(e["cl"].alias("cl"), F.col("dst").alias("node"),
                       F.lit(r).alias("d"))
               .distinct())
        newly = (nxt.join(dist.select("cl", "node"), ["cl", "node"],
                          "left_anti")
                 .localCheckpoint(eager=False))
        dist = dist.unionByName(newly).localCheckpoint(eager=False)
        frontier = newly
    sizes = m.groupBy(F.col("cl").alias("cluster_id")).agg(
        F.count("*").alias("n_members"))
    reach = dist.groupBy(F.col("cl").alias("cluster_id")).agg(
        F.max("d").alias("depth"), F.count("*").alias("n_reached"))
    return (sizes.join(reach, "cluster_id")
            .select("cluster_id", "n_members",
                    F.col("depth").cast("int").alias("depth"),
                    (F.col("n_members") - F.col("n_reached"))
                    .cast("long").alias("n_unreached")))
