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


# Driver-path bound, in EDGES (the collect is bounded at threshold+1 rows
# by construction — `limit(threshold+1).toArrow()`). Memory math for 8M:
# int64 ids = 8M x 2 x 8 B = 256 MB Arrow (+~2x for the dictionary-encode
# scratch); ~32 B string ids = ~768 MB — single-digit-GB driver headroom
# either way, and the distributed large-star/small-star path still takes
# over above it. Raised from 2M after an A/B on a real 2.2M-edge match
# graph (200k-doc corpus): distributed 9.4 s vs Arrow union-find 1.6 s,
# identical assignments (diff: 0) — below ~10M edges the per-round
# shuffles + checkpoints are pure overhead.
SMALL_GRAPH_EDGES = 8_000_000


def _driver_union_find(rows: list) -> list[tuple]:
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so the representative IS the component min
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return [(n, find(n)) for n in parent]


def _numpy_components(pdf) -> "tuple":
    """(ids, component_ids) for the small-graph driver path — vectorized
    min-label propagation with pointer jumping over numpy arrays.

    The dict/loop union-find (kept above as the semantics reference and
    property-test twin) spends ~10s of pure-Python time at 2M edges — a
    SERIAL fraction that caps strong-scaling of the whole pipeline.

    Ids are mapped to dense ints with ``pd.factorize`` (hash-based, O(n) —
    ``np.unique`` lexicographically SORTS, which costs 10× on millions of
    URL strings). Propagation then runs in code space; the propagated label
    is a consistent per-component representative but NOT the min id, so a
    final groupby maps each component to its true min original id.
    """
    import numpy as np
    import pandas as pd

    a = pdf["a"].to_numpy()
    b = pdf["b"].to_numpy()
    codes, ids = pd.factorize(np.concatenate([a, b]))
    ids = np.asarray(ids)
    ia, ib = codes[: len(a)], codes[len(a):]
    lab = _propagate_labels(ia, ib, len(ids))
    # code-space roots -> true component min id, via ONE argsort of the ids
    # and integer rank minima (pandas groupby('root').transform('min') on
    # string ids measured 17s at 2.4M nodes; this path ~2s)
    perm = np.argsort(ids, kind="stable")
    rank = np.empty(len(ids), dtype=np.int64)
    rank[perm] = np.arange(len(ids))
    min_rank = np.full(len(ids), len(ids), dtype=np.int64)
    np.minimum.at(min_rank, lab, rank)
    return ids, ids[perm[min_rank[lab]]]


def _propagate_labels(ia, ib, n_nodes):
    """Min-label propagation with pointer jumping over edge code arrays —
    the numpy core shared by the pandas and Arrow driver paths. Returns the
    converged label array (a consistent per-component representative in code
    space, NOT yet the min original id)."""
    import numpy as np

    lab = np.arange(n_nodes)
    while True:
        prev = lab
        nxt = lab.copy()
        np.minimum.at(nxt, ia, lab[ib])
        np.minimum.at(nxt, ib, lab[ia])
        while True:
            jumped = nxt[nxt]
            if np.array_equal(jumped, nxt):
                break
            nxt = jumped
        lab = nxt
        if np.array_equal(prev, lab):
            break
    return lab


def _arrow_components(tbl) -> "tuple":
    """(ids, components) as pyarrow Arrays for the small-graph driver path.

    Same propagation as ``_numpy_components`` (kept as the semantics twin
    for property tests), but the string-heavy steps stay in Arrow C++:
    ``dictionary_encode`` replaces ``pd.factorize`` (no object-dtype
    conversion of millions of URLs) and ``sort_indices`` over the unique
    dictionary replaces the row-space argsort. Measured at 1.1M url-string
    edges: 4.0s -> 1.6s, ALL of it serial driver time the rest of the
    cluster spends idle on — the single largest Amdahl term in the
    strong-scaling profile at bench scale.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    a = tbl.column("a").combine_chunks()
    b = tbl.column("b").combine_chunks()
    enc = pc.dictionary_encode(pa.concat_arrays([a, b]))
    codes = enc.indices.to_numpy()          # int32, null-free -> zero-copy
    uniq = enc.dictionary
    ia, ib = codes[: len(a)], codes[len(a):]
    lab = _propagate_labels(ia, ib, len(uniq))
    # code-space roots -> true component min id, ranked via ONE Arrow sort
    # of the ~n_unique dictionary (not the 2x-edges row space)
    sort_idx = pc.sort_indices(uniq).to_numpy().astype(np.int64)
    rank = np.empty(len(uniq), dtype=np.int64)
    rank[sort_idx] = np.arange(len(uniq))
    min_rank = np.full(len(uniq), len(uniq), dtype=np.int64)
    np.minimum.at(min_rank, lab, rank)
    comps = pc.take(uniq, pa.array(sort_idx[min_rank[lab]]))
    return uniq, comps


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iter: int = 25,
                         small_graph_threshold: int = SMALL_GRAPH_EDGES) -> DataFrame:
    """Return (id, component) — component = min node id reachable.

    Adaptive physical strategy: the match-edge graph after blocking+scoring
    is usually TINY relative to the corpus (most pages are singletons), so
    when the deduped edge count fits comfortably on the driver we run
    union-find there in one job — large-star/small-star pays ~4 shuffles +
    a checkpoint PER ROUND, which is pure overhead below millions of edges.
    Above the threshold the O(log n)-round distributed algorithm runs.
    ``edges`` may use any orderable id type; isolated nodes don't appear
    (callers union them back with component = own id).
    """
    spark = edges.sparkSession
    e = _canon(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    # ONE job decides the strategy AND loads the small-graph edges:
    # limit(threshold+1).toArrow() returns every edge when the graph is
    # small (the common case) — the previous checkpoint + count() + collect
    # sequence was three serial driver-side jobs per run, a fixed cost that
    # eats strong-scaling headroom (same fusion as pipeline._mentions'
    # dictionary probe)
    head = e.limit(small_graph_threshold + 1).toArrow()
    if head.num_rows == 0:
        return spark.createDataFrame([], schema=e.select(
            F.col("a").alias("id"), F.col("a").alias("component")).schema)
    if head.num_rows <= small_graph_threshold:
        # Arrow END TO END: toArrow in (py4j row collect of 100k+ rows is
        # 30-60s and wildly variable; toPandas adds an object-dtype copy of
        # every string), dictionary-encoded numpy label propagation in the
        # middle, and createDataFrame(pa.Table) back out
        import pyarrow as pa

        ids, comps = _arrow_components(head)
        out_schema = e.select(
            F.col("a").alias("id"), F.col("a").alias("component")).schema
        return spark.createDataFrame(
            pa.table({"id": ids, "component": comps}), schema=out_schema)
    # distributed large-star/small-star path: checkpoint so each round's
    # input is materialized, not the whole history recomputed
    e = e.localCheckpoint()
    prev_sig = None
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint()
        # convergence: (count, order-insensitive hash) fingerprint — one
        # cheap agg instead of two anti-joins per round
        sig = tuple(
            e2.agg(
                F.count("*"),
                # decimal sum: int64 would overflow under ANSI mode
                F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")),
            ).collect()[0]
        )
        e = e2
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged stars are rooted at the component MIN, so in canonical
    # (a < b) form the root is `a` and members are `b`
    members = e.select(F.col("b").alias("id"), F.col("a").alias("component"))
    roots = e.select(F.col("a").alias("id"), F.col("a").alias("component")).distinct()
    return members.unionByName(roots).groupBy("id").agg(
        F.min("component").alias("component")
    )


def cluster_assignments(edges: DataFrame, all_ids: DataFrame,
                        id_col: str = "id",
                        ids_unique: bool = False) -> DataFrame:
    """(id, cluster_id) for EVERY id — singletons get their own id.

    ``ids_unique``: skip the defensive ``distinct()`` (one exchange +
    aggregate over the full id set) when the caller passes a primary-key
    column — e.g. ``resolve_documents``' doc_id contract. Values are
    identical by definition for unique inputs; block-membership callers
    (ids repeated per block) keep the default."""
    comp = connected_components(edges)
    ids = all_ids.select(F.col(id_col).alias("id"))
    if not ids_unique:
        ids = ids.distinct()
    return ids.join(comp, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("cluster_id")
    )


def refine_oversized(clusters: DataFrame, matched: DataFrame,
                     max_size: int = 50,
                     id_col: str = "doc_id",
                     cluster_col: str = "cluster_id",
                     id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Giant-entity breaker: re-cluster every cluster exceeding
    ``max_size`` over only the STRONGER edges the caller passes
    (``matched`` pre-filtered to a higher threshold), leaving small
    clusters untouched.

    Transitive closure occasionally welds a mega-cluster out of
    boilerplate chains; production MDM systems cap entity size and
    re-resolve the oversized ones under stricter evidence (the
    complement of ``graph.mutual_knn_edges``, which prevents; this
    repairs). Refined sub-cluster ids are the min member id, which
    cannot collide with any untouched cluster's id (ids are min
    members of disjoint record sets).

    Scale shape: one size groupBy, two member equi-joins restricting
    the strong edges to intra-big-cluster pairs, then
    ``cluster_assignments`` over ONLY the oversized membership — the
    re-clustering never touches the (typically overwhelming) small
    majority.
    """
    sizes = clusters.groupBy(cluster_col).agg(F.count("*").alias("_n"))
    cl = clusters.select(id_col, cluster_col).join(sizes, cluster_col)
    small = (cl.where(F.col("_n") <= max_size)
             .select(id_col, cluster_col))
    bigm = (cl.where(F.col("_n") > max_size)
            .select(id_col, cluster_col))
    e = (matched.select(id_a, id_b)
         .join(bigm.select(F.col(id_col).alias(id_a),
                           F.col(cluster_col).alias("_ca")), id_a)
         .join(bigm.select(F.col(id_col).alias(id_b),
                           F.col(cluster_col).alias("_cb")), id_b)
         .where(F.col("_ca") == F.col("_cb"))
         .select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")))
    refined = (cluster_assignments(e, bigm.select(id_col), id_col=id_col)
               .select(F.col("id").alias(id_col),
                       F.col("cluster_id").alias(cluster_col)))
    return small.unionByName(refined)
