"""Similarity search over embedding columns (array<float>).

Reference parity: spikex kNN = gensim ``most_similar`` (J7,
``pipes/clusters.py:111``) — a full-scan cosine top-k. Two paths:

* ``cosine_topk``      — brute-force: query rows × corpus, native
  ``F.zip_with``/``F.aggregate`` dot products (JVM, no UDF), window top-k.
  The correctness baseline; O(Q·N) — fine when Q is small or N is blocked.
* ``lsh_cosine_topk``  — scale path: random-hyperplane signs (deterministic,
  md5-seeded projections) bucket the corpus; candidates come from matching
  buckets (multi-probe = all bands), then exact cosine re-rank. Sub-linear
  candidate sets at 100 TB; recall tunable via bands×bits.
* ``ivf_cosine_topk``  — IVF-flat inverted lists (k-means / k-means‖
  trained centroids), nprobe probing, exact re-rank.
* ``pq_cosine_topk``   — product quantization (Jégou et al. 2011): per-
  subspace k-means codebooks compress each vector to m bytes; ADC LUT
  scan + exact re-rank — the memory-bound path at 10^12 vectors.

Scores are computed in float64 from the float32 column (cast first so the
DuckDB oracle — which must also cast — matches bit-for-bit).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine over array<double> columns; 0.0 when either norm is 0."""
    na, nb = _norm(a), _norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(
        _dot(a, b) / (na * nb)
    )


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda v: v.cast("double"))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_digits: int = 4) -> DataFrame:
    """(query_id, neighbor_id, rank, cos) — brute-force top-k per query.

    ``queries``: same schema as corpus (typically a filtered subset).
    Self-matches excluded. The corpus side is the big side — Catalyst
    broadcasts the (small) query side.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), round_digits))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _banded_signs(df: DataFrame, label: str, dim: int, bits: int,
                  bands: int, id_col: str, vec_col: str) -> DataFrame:
    """(label, band, bval): sign-signature bands for LSH candidate joins."""
    width = bits // bands
    mask = (1 << width) - 1
    s = lsh_signs(df, dim, bits, id_col, vec_col)
    return s.select(
        F.col("id").alias(label),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("sig"), b * width)
                    .bitwiseAND(F.lit(mask)).alias("bval"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(label, F.col("bb.band").alias("band"),
             F.col("bb.bval").alias("bval"))


def cosine_near_dups(df: DataFrame, dim: int, min_cos: float = 0.35,
                     bits: int = 16, bands: int = 4,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     round_digits: int = 4) -> DataFrame:
    """Embedding-cosine near-dup channel (the dedup family's fifth member):
    (id_a, id_b, cos) pairs with cosine ≥ ``min_cos``.

    Candidates = pairs sharing ≥1 random-hyperplane sign band (similar
    vectors agree on most signs, so they share a band with high
    probability); verification = exact cosine. No all-pairs join anywhere —
    the self-join runs on (band, bval), the same skew surface as MinHash
    buckets (cap with blocking.cap_blocks on pathological inputs).
    """
    banded = _banded_signs(df, "vid", dim, bits, bands, id_col, vec_col)
    left = banded.select("band", "bval", F.col("vid").alias("id_a"))
    right = banded.select("band", "bval", F.col("vid").alias("id_b"))
    cands = (
        left.join(right, ["band", "bval"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    v = df.select(F.col(id_col).alias("vid"),
                  _as_double(F.col(vec_col)).alias("e"))
    scored = (
        cands.join(v.withColumnsRenamed({"vid": "id_a", "e": "ea"}), "id_a")
        .join(v.withColumnsRenamed({"vid": "id_b", "e": "eb"}), "id_b")
        .withColumn("cos", F.round(cosine(F.col("ea"), F.col("eb")),
                                   round_digits))
    )
    return (
        scored.where(F.col("cos") >= min_cos)
        .select("id_a", "id_b", "cos")
    )


def _unit_seq(vals: list[float]) -> list[float]:
    """Unit-normalize with a SEQUENTIAL fold (matches DuckDB's
    list_dot_product accumulation order bit-for-bit)."""
    import math

    acc = 0.0
    for x in vals:
        acc += x * x
    n = math.sqrt(acc)
    return [x / n for x in vals] if n else list(vals)


def first_nlist_units(corpus: DataFrame, nlist: int,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> list[tuple[int, list[float]]]:
    """Deterministic IVF seed centroids: the first ``nlist`` corpus vectors
    by id, unit-normalized. The zero-training baseline."""
    seeds = (
        corpus.orderBy(id_col).limit(nlist)
        .select(id_col, _as_double(F.col(vec_col)).alias("e"))
        .collect()
    )
    return [(r[id_col], _unit_seq(r["e"])) for r in seeds]


def _dot_lit(vec: Column, unit: list[float]) -> Column:
    lit_arr = F.array(*[F.lit(float(x)) for x in unit])
    return F.aggregate(
        F.zip_with(vec, lit_arr, lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def _best_lists(df: DataFrame, units: list[tuple[int, list[float]]],
                label: str, n_keep: int, id_col: str,
                vec_col: str) -> DataFrame:
    """(label, list_id): the ``n_keep`` best centroids per vector by dot
    product with the unit centroid (= cosine ranking)."""
    v = df.select(F.col(id_col).alias(label),
                  _as_double(F.col(vec_col)).alias("e"))
    scores = F.array(*[
        F.struct(_dot_lit(F.col("e"), u).alias("s"),
                 F.lit(sid).alias("sid"))
        for sid, u in units
    ])
    # lexicographic struct sort: score desc, then sid desc on ties —
    # mirrored in the oracle's ORDER BY s DESC, sid DESC
    ranked = F.reverse(F.array_sort(scores))
    return v.select(
        label,
        F.explode(
            F.transform(F.slice(ranked, 1, n_keep), lambda x: x["sid"])
        ).alias("list_id"),
    )


def train_ivf_centroids(corpus: DataFrame, nlist: int = 8, iters: int = 1,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        round_digits: int = 6) -> list[tuple[int, list[float]]]:
    """Lloyd-refined spherical k-means centroids for IVF, deterministic and
    oracle-reproducible.

    Init = ``first_nlist_units`` (no RNG — resumable); each iteration
    assigns every vector to its best centroid (argmax dot, ties to the
    larger id) and replaces each centroid with the element-wise MEAN of its
    members, rounded to ``round_digits`` (the rounding pins the value
    against float summation-order differences between engines, so a DuckDB
    oracle recomputing avg() per dimension lands on the same doubles), then
    unit-normalizes with the same sequential fold as the seeds. Empty lists
    keep their previous centroid.

    Scale shape: per iteration ONE corpus scan (narrow assignment map) +
    a groupBy(list_id, pos) partial-agg shuffle of nlist×dim rows; only the
    nlist×dim centroid table is collected. At 10^12 docs you train on a
    sampled fraction (pass ``corpus.sample`` / ``limit`` output here) —
    centroid quality needs samples, not the full corpus.
    """
    units = first_nlist_units(corpus, nlist, id_col, vec_col)
    v = corpus.select(F.col(id_col).alias("_vid"),
                      _as_double(F.col(vec_col)).alias("e"))
    for _ in range(iters):
        assign = _best_lists(corpus, units, "_vid", 1, id_col, vec_col)
        cent_rows = (
            assign.join(v, "_vid")
            .select("list_id", F.posexplode("e").alias("pos", "val"))
            .groupBy("list_id", "pos")
            .agg(F.round(F.avg("val"), round_digits).alias("m"))
            .collect()
        )
        by_list: dict = {}
        for r in cent_rows:
            by_list.setdefault(r["list_id"], {})[r["pos"]] = r["m"]
        units = [
            (sid,
             _unit_seq([by_list[sid][p] for p in range(len(old))])
             if sid in by_list else old)
            for sid, old in units
        ]
    return units


def _round_half_away(a: "np.ndarray", digits: int) -> "np.ndarray":
    """Round half AWAY from zero (SQL ``round`` / Spark ``F.round``
    semantics); ``np.round`` is banker's and would diverge on exact .5."""
    p = 10.0 ** digits
    return np.copysign(np.floor(np.abs(a) * p + 0.5), a) / p


def _kmeans_parallel_select(corpus: DataFrame, oversample: int, rounds: int,
                            id_col: str, vec_col: str,
                            ) -> tuple[list[list[float]], "np.ndarray"]:
    """The DISTRIBUTED phase of k-means‖ init: farthest-point candidate
    rounds + one attraction-weighting pass. Returns (candidate unit
    vectors in selection order, per-candidate weight array).

    All cosine scores are rounded to 7 digits BEFORE the min/argmax
    selections: the matmul's SIMD/pairwise summation and a sequential-fold
    dot product can differ in the last ulps, and the selection (order-by /
    argmax with id tiebreaks) must land on identical rows in any engine
    recomputing it — this is what makes ``kmeans_parallel_candidates``
    oracle-mirrorable in ANSI SQL while staying deterministic here.
    """
    def _best_vs(cands_mat: "np.ndarray", what: str):
        """pandas_udf: per-vector max cosine (or argmax index) against the
        candidate matrix — ONE numpy matmul per Arrow batch. Inline
        Catalyst literal-array aggregates (one per candidate) hit the same
        whole-stage-codegen wall lsh_signs documents (~40s for 500 rows at
        16 aggregates); the matmul path is flat in candidate count."""
        Ct = cands_mat.T

        @pandas_udf(T.DoubleType() if what == "max" else T.IntegerType())
        def udf(vecs: pd.Series) -> pd.Series:
            m = np.vstack(vecs.to_numpy()).astype(np.float64)
            # half-away rounding to match SQL round() — np.round is
            # banker's and flips the argmax/order-by on an exact .5 tie
            sim = _round_half_away(m @ Ct, 7)
            if what == "max":
                return pd.Series(sim.max(axis=1))
            return pd.Series(sim.argmax(axis=1).astype(np.int32))

        return udf

    # selection operates on UNIT vectors so max-dot IS max-cosine: the
    # farthest-point criterion must be magnitude-blind (a small-norm clone
    # of a covered direction is NOT far), and a picked row self-scores 1.0
    # so it is never re-selected; zero-norm rows are excluded outright
    norm = F.sqrt(F.aggregate(F.col("_e0"), F.lit(0.0),
                              lambda a, x: a + x * x))
    v = (corpus.select(F.col(id_col).alias("_vid"),
                       _as_double(F.col(vec_col)).alias("_e0"))
         .withColumn("_n", norm)
         .where(F.col("_n") > 0)
         .select("_vid", F.transform("_e0", lambda x: x / F.col("_n"))
                 .alias("e"))
         .localCheckpoint(eager=False))
    first = v.orderBy("_vid").limit(1).collect()[0]
    cands: list[list[float]] = [list(first["e"])]
    for _ in range(rounds):
        best = _best_vs(np.array(cands), "max")(F.col("e"))
        far = (
            v.select("_vid", "e", best.alias("_s"))
            .orderBy(F.asc("_s"), F.asc("_vid"))
            .limit(oversample)
            .collect()
        )
        cands.extend(list(r["e"]) for r in far)
    # weight candidates by attraction (argmax ties -> lowest index)
    w_rows = (
        v.select(_best_vs(np.array(cands), "argmax")(F.col("e")).alias("ci"))
        .groupBy("ci").count().collect()
    )
    weights = np.zeros(len(cands))
    for r in w_rows:
        weights[r["ci"]] = r["count"]
    return cands, weights


def kmeans_parallel_candidates(corpus: DataFrame, nlist: int = 8,
                               oversample: int | None = None,
                               rounds: int = 2,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               round_digits: int = 6) -> DataFrame:
    """Contract-query face of the k-means‖ distributed phase: DataFrame of
    (ci, weight, pos, val) — candidate index in selection order, its
    attraction weight, and the rounded components of its unit vector.

    This is everything the CLUSTER computes for k-means‖ init; only the
    O(candidates) driver-side weighted Lloyd (``kmeans_parallel_units``)
    sits on top. The farthest-point rounds and the weighting pass are
    recomputed end-to-end by an unrolled ANSI-SQL oracle (same rounded-
    score selection, same id/index tiebreaks)."""
    spark = corpus.sparkSession
    cands, weights = _kmeans_parallel_select(
        corpus, oversample or 2 * nlist, rounds, id_col, vec_col)
    rows = [
        (ci, int(weights[ci]), pos, float(val))
        for ci, vec in enumerate(cands)
        for pos, val in enumerate(vec)
    ]
    df = spark.createDataFrame(
        rows, "ci int, weight bigint, pos int, val double")
    # JVM-side F.round (HALF_UP) == DuckDB round(); Python round() is
    # banker's and would diverge on exact .5 boundaries
    return df.select("ci", "weight", "pos",
                     F.round("val", round_digits).alias("val"))


def kmeans_parallel_units(corpus: DataFrame, nlist: int = 8,
                          oversample: int | None = None, rounds: int = 2,
                          lloyd_iters: int = 5,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> list[tuple[int, list[float]]]:
    """k-means‖-style IVF initialization, fully deterministic.

    The first-nlist seed init degenerates when the leading ids share a
    cluster. This is the scale-path fix, shaped like Bahmani et al.'s
    k-means‖: a few DISTRIBUTED rounds oversample a candidate set, then a
    cheap driver-side weighted Lloyd reduces the candidates to ``nlist``
    centroids. Determinism: instead of probability-proportional sampling,
    each round takes the ``oversample`` vectors FARTHEST from the current
    candidate set (farthest-point/k-center flavor — same coverage goal, no
    RNG, resumable). Weights = how many corpus vectors each candidate
    attracts, from one assignment pass.

    Cost: ``rounds`` corpus scans for the top-m selection + one assignment
    scan for weights; only O(rounds·oversample·dim) floats ever reach the
    driver. Returns (list_id, unit_vector) for ``ivf_cosine_topk``; refine
    further with ``train_ivf_centroids`` if desired.

    The weighted Lloyd is specified with explicit rounding points (candidate
    entry, assignment scores, weighted means, unit components — all to 7
    digits, half away from zero like SQL ``round``) so an ANSI-SQL oracle
    recomputing it group-by-group lands on bit-identical centroids despite
    float summation-order differences (numpy pairwise vs SQL sequential).
    """
    cands, weights = _kmeans_parallel_select(
        corpus, oversample or 2 * nlist, rounds, id_col, vec_col)
    C = _round_half_away(np.array(cands), 7)
    # deterministic Lloyd on the weighted candidate set: init = the nlist
    # heaviest candidates (ties by index), kept in index order
    order = np.lexsort((np.arange(len(cands)), -weights))
    cents = C[np.sort(order[:nlist])].copy()
    for _ in range(lloyd_iters):
        sim = _round_half_away(C @ cents.T, 7)
        assign = np.argmax(sim, axis=1)          # ties -> lowest j
        for j in range(len(cents)):
            m = assign == j
            wsum = weights[m].sum()
            if wsum > 0:
                c = _round_half_away(
                    (C[m] * weights[m, None]).sum(axis=0) / wsum, 7)
                # sequential fold for the norm (matches list_dot_product)
                acc = 0.0
                for x in c:
                    acc += float(x) * float(x)
                n = float(np.sqrt(acc))
                if n:
                    cents[j] = _round_half_away(c / n, 7)
    return [(i, [float(x) for x in cents[i]]) for i in range(len(cents))]


def ivf_assignments(corpus: DataFrame,
                    units: list[tuple[int, list[float]]],
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """(id, list_id): inverted-list membership at FIXED unit centroids
    (argmax dot, ties to the larger centroid id — same selection as
    ``ivf_cosine_topk``'s internal assignment).

    This is the IVF index's persistent state. Because each row's list
    depends only on its own vector and the centroids, assignment commutes
    with union: assigning only NEW vectors and appending to a stored
    assignment table equals reassigning the whole corpus — the exactness
    basis of ``lineage.ivf_assign_incremental``."""
    return _best_lists(corpus, units, "id", 1, id_col, vec_col)


def ivf_cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    nlist: int = 8, nprobe: int = 2,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    round_digits: int = 4,
                    centroids: list[tuple[int, list[float]]] | None = None,
                    assignments: DataFrame | None = None) -> DataFrame:
    """IVF-flat ANN: coarse-quantize the corpus into ``nlist`` inverted
    lists, probe the ``nprobe`` nearest lists per query, exact cosine
    re-rank inside the probed lists.

    ``centroids``: (id, unit_vector) coarse centroids — pass
    ``train_ivf_centroids(...)`` for k-means quality; default falls back to
    the first ``nlist`` corpus vectors (``first_nlist_units``). Assignment
    is argmax of dot(v, unit), computed JVM-side with sequential folds so
    the DuckDB oracle reproduces it bit-for-bit; at cluster scale the
    assignment matmul moves into an Arrow batch exactly like ``lsh_signs``.

    Scale shape: assignment is a narrow map; candidate generation is an
    equi-join on list_id (each query touches nprobe/nlist of the corpus);
    no all-pairs anywhere.

    ``assignments``: optional prebuilt (id, list_id) inverted-list table
    (``ivf_assignments`` / a ledgered index from
    ``lineage.ivf_assign_incremental``) — at 10^12 vectors the index is
    maintained incrementally, not recomputed per query.
    """
    units = centroids if centroids is not None else first_nlist_units(
        corpus, nlist, id_col, vec_col)

    assign = (assignments.select(F.col("id").alias("neighbor_id"), "list_id")
              if assignments is not None
              else _best_lists(corpus, units, "neighbor_id", 1, id_col,
                               vec_col))
    probes = _best_lists(queries, units, "query_id", nprobe, id_col, vec_col)
    cands = (
        probes.join(assign, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(F.col(vec_col)).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("qv"))
    scored = (
        cands.join(c, "neighbor_id").join(F.broadcast(q), "query_id")
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), round_digits))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _unit_df(df: DataFrame, id_col: str, vec_col: str,
             label: str = "id") -> DataFrame:
    """(label, u): unit-normalized double vectors; zero-norm rows pass
    through unchanged. Norm = sequential fold (DuckDB parity)."""
    e = _as_double(F.col(vec_col))
    n = F.sqrt(F.aggregate(e, F.lit(0.0), lambda a, x: a + x * x))
    return df.select(
        F.col(id_col).alias(label),
        F.when(n > 0, F.transform(e, lambda x: x / n)).otherwise(e)
        .alias("u"))


def _pq_code_udf(cb: "np.ndarray"):
    """pandas_udf: PQ codes per vector — per subspace, argmin of the
    squared L2 distance to the ``ksub`` codewords, ONE numpy matmul per
    Arrow batch per subspace (the inline-Catalyst alternative is the
    lsh_signs codegen wall). d² is rounded to 7 digits HALF-AWAY before
    the argmin so the selection lands on the same codeword as an ANSI-SQL
    oracle recomputing it with sequential folds; ties → lowest code
    (np.argmin) mirroring ORDER BY d2, cid."""
    m, ksub, sd = cb.shape
    cc = np.einsum("skj,skj->sk", cb, cb)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def udf(vecs: pd.Series) -> pd.Series:
        M = np.vstack(vecs.to_numpy()).astype(np.float64)
        codes = np.empty((M.shape[0], m), dtype=np.int32)
        for s in range(m):
            S = M[:, s * sd:(s + 1) * sd]
            d2 = _round_half_away(
                np.einsum("ij,ij->i", S, S)[:, None]
                - 2 * (S @ cb[s].T) + cc[s][None, :], 7)
            codes[:, s] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return udf


def pq_train(corpus: DataFrame, m: int = 4, ksub: int = 8, iters: int = 1,
             id_col: str = "vec_id", vec_col: str = "embedding",
             round_digits: int = 6) -> "np.ndarray":
    """Product-quantization codebooks (Jégou et al. 2011), deterministic
    and oracle-reproducible: the vector is split into ``m`` subspaces and
    each subspace gets its own ``ksub``-codeword k-means codebook.

    Init = subvectors of the first ``ksub`` corpus rows by id (no RNG —
    resumable); each Lloyd iteration assigns every subvector to its
    nearest codeword (rounded d², ties → lowest code) and replaces each
    codeword with the per-dimension MEAN of its members rounded to
    ``round_digits`` (pins the value against float summation-order
    differences so a DuckDB oracle recomputing avg() lands on the same
    doubles); empty cells keep their previous codeword. Runs on UNIT
    vectors so ADC dot-sums approximate cosine.

    Scale shape per iteration: one corpus scan (Arrow-batch assignment) +
    a groupBy(s, cid, j) partial-agg shuffle of m·ksub·subdim rows; only
    the codebook (m·ksub·subdim floats) reaches the driver. At 10^12
    vectors train on a sample — codebooks need samples, not the corpus.

    Returns codebook array of shape (m, ksub, dim/m).
    """
    u_df = _unit_df(corpus, id_col, vec_col).localCheckpoint(eager=False)
    seeds = u_df.orderBy("id").limit(ksub).collect()
    dim = len(seeds[0]["u"])
    sd = dim // m
    cb = np.array([[list(r["u"][s * sd:(s + 1) * sd]) for r in seeds]
                   for s in range(m)])          # m × ksub × sd
    for _ in range(iters):
        codes = u_df.select("id", _pq_code_udf(cb)(F.col("u")).alias("codes"))
        rows = (
            codes.join(u_df, "id")
            .select("codes", F.posexplode("u").alias("p", "val"))
            .select(F.floor(F.col("p") / sd).cast("int").alias("s"),
                    (F.col("p") % sd + 1).alias("j"), "val", "codes")
            .withColumn("cid", F.element_at("codes", F.col("s") + 1))
            .groupBy("s", "cid", "j")
            .agg(F.round(F.avg("val"), round_digits).alias("mval"))
            .collect()
        )
        new = cb.copy()
        for r in rows:
            new[r["s"], r["cid"], r["j"] - 1] = r["mval"]
        cb = new
    return cb


def pq_codes(df: DataFrame, cb: "np.ndarray", id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """(id, codes): the PQ index — m uint codes per vector, the 100-TB
    compressed representation (dim·4 bytes → m bytes per vector)."""
    u_df = _unit_df(df, id_col, vec_col)
    return u_df.select("id", _pq_code_udf(cb)(F.col("u")).alias("codes"))


def _pq_luts(spark, queries: DataFrame, cb: "np.ndarray", ksub: int,
             id_col: str, vec_col: str) -> DataFrame:
    """(query_id, lut) — driver-side ADC lookup tables for the (few)
    queries: lut[s][c] = dot(query_subvector_s, codeword_{s,c}) rounded
    to 7 digits, sequential folds throughout (list_dot_product parity)."""
    m, sd = cb.shape[0], cb.shape[2]
    q_rows = queries.select(F.col(id_col).alias("qid"),
                            _as_double(F.col(vec_col)).alias("e")).collect()

    def _seq_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    lut_rows = []
    for r in q_rows:
        qu = _unit_seq(list(r["e"]))
        lut = [[float(_round_half_away(
            np.array(_seq_dot(qu[s * sd:(s + 1) * sd], cb[s][c])), 7))
            for c in range(ksub)] for s in range(m)]
        lut_rows.append((r["qid"], lut))
    return spark.createDataFrame(
        lut_rows, "query_id long, lut array<array<double>>")


def _adc_score(m: int) -> F.Column:
    """Ordered m-term LUT sum over a `codes`+`lut` row pair, rounded to 6
    (the rounding that makes both engines' float orders agree)."""
    return F.round(
        F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)), F.lit(0.0),
            lambda acc, s: acc + F.element_at(
                F.element_at("lut", s + 1),
                F.element_at("codes", s + 1) + 1)),
        6)


def pq_cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                   m: int = 4, ksub: int = 8, rerank: int = 50,
                   iters: int = 1, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   round_digits: int = 4) -> DataFrame:
    """PQ-ADC ANN top-k: asymmetric-distance scan over the compressed
    codes, exact cosine re-rank of the best ``rerank`` candidates.

    ADC: per query, a LUT of dot(query_sub, codeword) per (subspace,
    code) — m·ksub doubles, rounded to 7 digits; the approximate score of
    a corpus row is the ordered sum of its m LUT entries (rounded to 6).
    Both roundings make the scan oracle-mirrorable: each engine sums the
    SAME m doubles in the same subspace order.

    Scale shape: the corpus side is scanned as codes only (m bytes/row) —
    a narrow map against a broadcast LUT, no shuffle until the per-query
    top-``rerank`` window; the exact re-rank touches ``rerank`` vectors
    per query. This is the memory-bound path brute-force cosine cannot
    take at 10^12 vectors.
    """
    spark = corpus.sparkSession
    cb = pq_train(corpus, m=m, ksub=ksub, iters=iters,
                  id_col=id_col, vec_col=vec_col)
    codes = pq_codes(corpus, cb, id_col, vec_col)
    luts = _pq_luts(spark, queries, cb, ksub, id_col, vec_col)

    approx = (
        codes.crossJoin(F.broadcast(luts))
        .where(F.col("id") != F.col("query_id"))
        .select(F.col("query_id"), F.col("id").alias("neighbor_id"),
                _adc_score(m).alias("ap"))
    )
    wa = Window.partitionBy("query_id").orderBy(F.desc("ap"),
                                                F.asc("neighbor_id"))
    cands = (approx.withColumn("arn", F.row_number().over(wa))
             .where(F.col("arn") <= rerank)
             .select("query_id", "neighbor_id"))

    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(F.col(vec_col)).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("qv"))
    scored = (
        cands.join(c, "neighbor_id").join(F.broadcast(q), "query_id")
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")),
                                   round_digits))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos"))


def ivfpq_cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                      nlist: int = 8, nprobe: int = 2,
                      m: int = 4, ksub: int = 8, rerank: int = 50,
                      iters: int = 1, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      round_digits: int = 4) -> DataFrame:
    """IVF-PQ ANN top-k — the FAISS-standard composition: coarse-quantize
    into ``nlist`` inverted lists (seed centroids = first corpus vectors,
    as ivf_cosine_topk's default), probe ``nprobe`` lists per query, ADC
    scan the PQ codes of ONLY the probed lists, exact cosine re-rank of
    the best ``rerank``.

    At 10^12 vectors neither parent suffices alone: IVF-flat still reads
    dim·4 bytes/row inside probed lists; flat PQ still scans every row's
    codes.  Composed, the scan touches ``nprobe/nlist`` of the corpus at
    m bytes/row — the memory budget that actually fits.  Candidate
    generation is the IVF equi-join on list_id; the ADC scan is a narrow
    map against the broadcast LUTs; the only per-query windows are the
    top-``rerank`` and top-``k`` partitions.
    """
    units = first_nlist_units(corpus, nlist, id_col, vec_col)
    assign = _best_lists(corpus, units, "neighbor_id", 1, id_col, vec_col)
    probes = _best_lists(queries, units, "query_id", nprobe, id_col,
                         vec_col)
    cand_lists = (
        probes.join(assign, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    spark = corpus.sparkSession
    cb = pq_train(corpus, m=m, ksub=ksub, iters=iters,
                  id_col=id_col, vec_col=vec_col)
    codes = pq_codes(corpus, cb, id_col, vec_col).withColumnRenamed(
        "id", "neighbor_id")
    luts = _pq_luts(spark, queries, cb, ksub, id_col, vec_col)
    approx = (
        cand_lists.join(codes, "neighbor_id")
        .join(F.broadcast(luts), "query_id")
        .select("query_id", "neighbor_id", _adc_score(m).alias("ap"))
    )
    wa = Window.partitionBy("query_id").orderBy(F.desc("ap"),
                                                F.asc("neighbor_id"))
    cands = (approx.withColumn("arn", F.row_number().over(wa))
             .where(F.col("arn") <= rerank)
             .select("query_id", "neighbor_id"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(F.col(vec_col)).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("qv"))
    scored = (
        cands.join(c, "neighbor_id").join(F.broadcast(q), "query_id")
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")),
                                   round_digits))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos"))


def _hyperplane(dim: int, bit: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from md5 — stable across
    sessions/machines (no RNG state, resumable)."""
    import hashlib
    out = []
    for d in range(dim):
        h = hashlib.md5(f"hp:{bit}:{d}".encode()).hexdigest()
        out.append((int(h[:8], 16) / 0xFFFFFFFF) * 2.0 - 1.0)
    return out


def lsh_signs(df: DataFrame, dim: int, bits: int = 16,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, sig): random-hyperplane sign signature (bits wide) per vector.

    Computed as one numpy matmul per Arrow batch (N×dim @ dim×bits) inside a
    pandas UDF — building the projection as 16 inline Catalyst aggregates
    over 64-literal arrays was codegen-bound (~40s for 500 rows)."""
    planes = np.array([_hyperplane(dim, b) for b in range(bits)]).T  # dim×bits
    weights = (1 << np.arange(bits)).astype(np.int64)

    @pandas_udf(T.LongType())
    def sig_udf(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())            # N×dim (float32 -> float64)
        proj = m.astype(np.float64) @ planes      # N×bits
        return pd.Series(((proj > 0).astype(np.int64) * weights).sum(axis=1))

    return df.select(F.col(id_col).alias("id"), sig_udf(F.col(vec_col)).alias("sig"))


def lsh_cosine_topk(corpus: DataFrame, queries: DataFrame, dim: int,
                    k: int = 5, bits: int = 16, bands: int = 4,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    round_digits: int = 4) -> DataFrame:
    """ANN top-k: candidates share ≥1 sign-band with the query, exact cosine
    re-rank. Bands of bits//bands bits each; recall rises with bands."""
    cands = (
        _banded_signs(corpus, "neighbor_id", dim, bits, bands, id_col, vec_col)
        .join(F.broadcast(
            _banded_signs(queries, "query_id", dim, bits, bands, id_col,
                          vec_col)), ["band", "bval"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(F.col(vec_col)).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("qv"))
    scored = (
        cands.join(c, "neighbor_id").join(F.broadcast(q), "query_id")
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), round_digits))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def lsh_multiprobe_topk(corpus: DataFrame, queries: DataFrame, dim: int,
                        k: int = 5, bits: int = 16, bands: int = 4,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        round_digits: int = 4) -> DataFrame:
    """Multi-probe LSH ANN (Lv et al. VLDB'07): the query probes its
    exact sign-band bucket AND every bucket at Hamming distance 1 in
    each band — a near neighbor that flipped one hyperplane sign is
    still found WITHOUT adding hash tables (the memory-for-recall trade
    plain banding forces). Candidate recall is a strict superset of
    :func:`lsh_cosine_topk`'s per construction; cost rises only on the
    (small, broadcast) query side — width+1 probe rows per band per
    query — while the corpus side is hashed exactly once.

    Same exact-cosine re-rank and deterministic (cos desc, id) ties as
    the single-probe path."""
    width = bits // bands
    qb = _banded_signs(queries, "query_id", dim, bits, bands, id_col,
                       vec_col)
    probes = F.explode(F.array(
        F.col("bval"),
        *[F.col("bval").bitwiseXOR(F.lit(1 << j)) for j in range(width)]))
    qb = qb.select("query_id", "band", probes.alias("bval"))
    cands = (
        _banded_signs(corpus, "neighbor_id", dim, bits, bands, id_col,
                      vec_col)
        .join(F.broadcast(qb), ["band", "bval"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(F.col(vec_col)).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("qv"))
    scored = (
        cands.join(c, "neighbor_id").join(F.broadcast(q), "query_id")
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")),
                                   round_digits))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
