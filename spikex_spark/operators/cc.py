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


SMALL_GRAPH_EDGES = 2_000_000


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
    lab = np.arange(len(ids))
    while True:
        prev = lab
        nxt = lab.copy()
        # pull the smaller label across each edge, both directions
        np.minimum.at(nxt, ia, lab[ib])
        np.minimum.at(nxt, ib, lab[ia])
        # pointer-jump until flat: components converge in O(log n) passes
        while True:
            jumped = nxt[nxt]
            if np.array_equal(jumped, nxt):
                break
            nxt = jumped
        lab = nxt
        if np.array_equal(prev, lab):
            break
    # code-space roots -> true component min id, via ONE argsort of the ids
    # and integer rank minima (pandas groupby('root').transform('min') on
    # string ids measured 17s at 2.4M nodes; this path ~2s)
    perm = np.argsort(ids, kind="stable")
    rank = np.empty(len(ids), dtype=np.int64)
    rank[perm] = np.arange(len(ids))
    min_rank = np.full(len(ids), len(ids), dtype=np.int64)
    np.minimum.at(min_rank, lab, rank)
    return ids, ids[perm[min_rank[lab]]]


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
    e = e.localCheckpoint()
    n_edges = e.count()
    if n_edges == 0:
        return spark.createDataFrame([], schema=e.select(
            F.col("a").alias("id"), F.col("a").alias("component")).schema)
    if n_edges <= small_graph_threshold:
        # Arrow BOTH ways: toPandas in (py4j row collect of 100k+ rows is
        # 30-60s and wildly variable), numpy label propagation in the
        # middle, and createDataFrame(pandas) back out — the pickled
        # list-of-tuples return path alone cost ~15s at 2M assignments
        import pandas as pd

        pdf = e.toPandas()
        ids, comps = _numpy_components(pdf)
        out_schema = e.select(
            F.col("a").alias("id"), F.col("a").alias("component")).schema
        return spark.createDataFrame(
            pd.DataFrame({"id": ids, "component": comps}), schema=out_schema)
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
                        id_col: str = "id") -> DataFrame:
    """(id, cluster_id) for EVERY id — singletons get their own id."""
    comp = connected_components(edges)
    ids = all_ids.select(F.col(id_col).alias("id")).distinct()
    return ids.join(comp, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("cluster_id")
    )
