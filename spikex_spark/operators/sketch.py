"""Distributed cardinality / frequency sketches with exact oracles.

Corpus statistics a 100-TB pipeline needs without exact shuffles:

* **KMV (k-minimum-values / theta) distinct-count sketch** — the
  DataSketches-theta recipe: hash every value to a 60-bit integer, keep
  the k smallest distinct hashes, estimate ``D ≈ (k-1) · 2^60 / h_k``.
  One map + one top-k; the sketch is k longs, mergeable across groups
  (union = k smallest of the concatenation). Unlike HyperLogLog there is
  no harmonic float sum, so the estimate is bit-for-bit reproducible in
  the DuckDB oracle — integer hashes in, one double division out.
* **Count-min sketch** — ``depth`` rows of ``width`` counters; the
  estimate for a key is the min over rows of counter[row, h_row(key)].
  Built relationally: the (row, col, count) table IS the sketch (at
  cluster scale: ``depth·width`` longs, broadcastable), counts come from
  one map-side-combined groupBy — never a per-key shuffle of the corpus.

Hashes are md5-derived (same convention as dedup/blocking), so both
engines reproduce every position exactly. Pure Catalyst throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# the ONE md5-60 hash / tokenizer convention — imported, not copied, so
# the cross-operator determinism contract has a single definition
from .dedup import _md5_60
from .retrieval import _tokens

_SCALE = 1 << 60  # md5_60 hash space


def _kmv_topk(hashed: DataFrame, k: int) -> DataFrame:
    """(grp, h): the k smallest distinct hashes per group — the sketch."""
    win = Window.partitionBy("grp").orderBy("h")
    return (hashed.distinct()
            .withColumn("rk", F.row_number().over(win))
            .where(F.col("rk") <= k).select("grp", "h"))


def _kmv_estimate(topk: DataFrame, k: int) -> DataFrame:
    """(grp, n_hashes, theta_hash, est_distinct) from sketch rows."""
    agg = topk.groupBy("grp").agg(
        F.count("*").alias("n_hashes"),
        F.max("h").alias("theta_hash"))
    est = F.when(
        F.col("n_hashes") < k, F.col("n_hashes").cast("double")
    ).otherwise(
        F.round((F.lit(float(k - 1)) * F.lit(float(_SCALE)))
                / F.col("theta_hash").cast("double"), 4))
    return agg.select("grp", "n_hashes", "theta_hash",
                      est.alias("est_distinct"))


def kmv_distinct(df: DataFrame, group_col: str, value_col: str,
                 k: int = 256) -> DataFrame:
    """(group, n_hashes, theta_hash, est_distinct, true_distinct) — per-group
    KMV distinct-count estimate alongside the exact count.

    When a group holds fewer than ``k`` distinct values the sketch IS the
    exact distinct set and the estimate equals ``n_hashes`` (the standard
    KMV exact regime). ``true_distinct`` is included for verification —
    a production run at scale drops it (that column is the exact
    countDistinct the sketch exists to avoid).

    Shape at scale: hash is a narrow map; the k-smallest per group is one
    shuffle on the group key where the map side can pre-prune to its local
    k minima; the sketch that crosses the wire is k longs per group.
    """
    hashed = df.select(
        F.col(group_col).alias("grp"),
        _md5_60(F.col(value_col)).alias("h"),
    )
    exact = (df.select(F.col(group_col).alias("grp"),
                       F.col(value_col).alias("v"))
             .groupBy("grp").agg(F.countDistinct("v").alias("true_distinct")))
    return (_kmv_estimate(_kmv_topk(hashed, k), k)
            .join(exact, "grp")
            .select("grp", "n_hashes", "theta_hash", "est_distinct",
                    "true_distinct"))


def kmv_distinct_tokens(df: DataFrame, group_col: str, text_col: str,
                        k: int = 256) -> DataFrame:
    """KMV over the token stream of a text column, grouped (e.g. per lang):
    the per-shard vocabulary-size estimator."""
    toks = df.select(
        F.col(group_col).alias("g"),
        F.explode(_tokens(F.col(text_col))).alias("tok"),
    )
    return kmv_distinct(toks, "g", "tok", k=k)


def kmv_distinct_bigrams(df: DataFrame, group_col: str, text_col: str,
                         k: int = 256) -> DataFrame:
    """KMV over token BIGRAMS per group — the bigram space is large enough
    to exercise the estimate regime (single tokens on a capped vocabulary
    sit in the exact-set regime where the sketch is just the distinct set).
    zip_with over slices keeps the bigram expression total w.r.t.
    indexing, and the ``when(size >= 2, …)`` wrapper keeps slice() total
    too — a token-less or one-token doc would pass slice a NEGATIVE
    length and fail the stage. The guard must live INSIDE the expression,
    not in a ``.where()`` above it: InferFiltersFromGenerate copies the
    explode's input expression into filters BELOW any row guard (the
    repetition_stats lesson), so only a total expression is safe."""
    return kmv_distinct(_bigram_stream(df, group_col, text_col),
                        "g", "v", k=k)


def _bigram_stream(df: DataFrame, group_col: str,
                   text_col: str) -> DataFrame:
    """(g, v) — one row per token-bigram instance, the shared stream
    under kmv_distinct_bigrams and the intersection estimator."""
    bg = F.when(
        F.size("w") >= 2,
        F.expr(
            "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),"
            " (a, b) -> concat(a, ' ', b))"),
    ).otherwise(F.array().cast("array<string>"))
    base = (df.select(
        F.col(group_col).alias("g"),
        _tokens(F.col(text_col)).alias("w"),
    ).select("g", bg.alias("bg")))
    return base.select("g", F.explode("bg").alias("v"))


def kmv_intersection(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """(grp, theta_hash, n_common, n_union_sample, est_intersection,
    est_jaccard) — theta-sketch INTERSECTION over two per-group KMV row
    tables (the ``(grp, h)`` shape of :func:`kmv_hashes`), the
    DataSketches set-operation recipe: the effective sampling threshold
    is ``theta = least(theta_a, theta_b)`` (a sketch that is still exact
    — fewer than k hashes — contributes theta = the full hash space);
    the intersection estimate is ``|common hashes < theta| ·
    SCALE / theta`` and the Jaccard estimate is the common share of the
    below-theta union sample.

    This answers "how much does crawl snapshot B overlap snapshot A?"
    from two k-long sketches — no join of the corpora, shippable across
    clusters.  When BOTH sketches are exact the formula degrades to the
    exact intersection count (theta = SCALE).  Only groups present in
    both inputs appear.  One float multiply-divide per group at the very
    end; everything before it is integer (oracle-exact).
    """
    def _theta(df: DataFrame, out: str) -> DataFrame:
        return df.groupBy("grp").agg(
            F.count("*").alias("_n"), F.max("h").alias("_mx")
        ).select(
            "grp",
            F.when(F.col("_n") < k, F.lit(_SCALE))
            .otherwise(F.col("_mx")).alias(out),
        )

    th = (
        _theta(a, "th_a").join(_theta(b, "th_b"), "grp")
        .select("grp", F.least("th_a", "th_b").alias("theta_hash"))
    )
    uni = (
        a.select("grp", "h").unionByName(b.select("grp", "h")).distinct()
        .join(th, "grp")
        .where(F.col("h") < F.col("theta_hash"))
    )
    common = (
        a.select("grp", "h")
        .join(b.select("grp", "h"), ["grp", "h"], "semi")
        .join(th, "grp")
        .where(F.col("h") < F.col("theta_hash"))
        .groupBy("grp")
        .agg(F.count("*").alias("n_common"))
    )
    agg = (
        uni.groupBy("grp", "theta_hash")
        .agg(F.count("*").alias("n_union_sample"))
        .join(common, "grp", "left")
        .na.fill({"n_common": 0})
    )
    est_i = F.round(
        (F.col("n_common").cast("double") * F.lit(float(_SCALE)))
        / F.col("theta_hash").cast("double"),
        4,
    )
    est_j = F.when(
        F.col("n_union_sample") > 0,
        F.round(
            F.col("n_common").cast("double")
            / F.col("n_union_sample").cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "grp", "theta_hash",
        F.col("n_common").cast("long").alias("n_common"),
        F.col("n_union_sample").cast("long").alias("n_union_sample"),
        est_i.alias("est_intersection"), est_j.alias("est_jaccard"),
    )


def cms_build(df: DataFrame, value_col: str, depth: int = 4,
              width: int = 2048) -> DataFrame:
    """(row, col, c) — count-min sketch of the value stream, relationally.

    ``h_row(v) = md5_60(v || '#' || row) % width``. One explode over the
    ``depth`` rows and one map-side-combined groupBy; the result is at
    most ``depth·width`` rows regardless of corpus size.
    """
    rows = F.sequence(F.lit(0), F.lit(depth - 1))
    return (df.select(F.col(value_col).alias("v"))
            .select(F.explode(rows).alias("row"), "v")
            .select("row", F.pmod(
                _md5_60(F.concat(F.col("v"), F.lit("#"),
                                 F.col("row").cast("string"))),
                F.lit(width)).alias("col"))
            .groupBy("row", "col").agg(F.count("*").alias("c")))


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                 depth: int = 4, width: int = 2048) -> DataFrame:
    """(key, est) — min-over-rows CMS point estimate for each probe key.

    Keys absent from every counter they hash to would join nothing; the
    left join + coalesce keeps them at their floor (0 only if some counter
    cell is empty — with a built sketch the min cell count is the bound).
    """
    rows = F.sequence(F.lit(0), F.lit(depth - 1))
    probes = (keys.select(F.col(key_col).alias("key")).distinct()
              .select("key", F.explode(rows).alias("row"))
              .select("key", "row", F.pmod(
                  _md5_60(F.concat(F.col("key"), F.lit("#"),
                                   F.col("row").cast("string"))),
                  F.lit(width)).alias("col")))
    joined = probes.join(F.broadcast(sketch), ["row", "col"], "left")
    return (joined.groupBy("key")
            .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est")))


def cms_heavy_hitters(df: DataFrame, text_col: str, top: int = 20,
                      depth: int = 4, width: int = 2048) -> DataFrame:
    """(token, true_count, est) — CMS estimates for the corpus's ``top``
    most frequent tokens (deterministic probe set: count desc, token asc),
    with the exact counts alongside for verification. est >= true_count
    always (CMS never underestimates)."""
    toks = df.select(F.explode(_tokens(F.col(text_col))).alias("tok"))
    truth = (toks.groupBy("tok").agg(F.count("*").alias("true_count"))
             .orderBy(F.col("true_count").desc(), F.col("tok").asc())
             .limit(top))
    sketch = cms_build(toks, "tok", depth=depth, width=width)
    est = cms_estimate(sketch, truth, "tok", depth=depth, width=width)
    return (truth.withColumnRenamed("tok", "token")
            .join(est.withColumnRenamed("key", "token"), "token")
            .select("token", "true_count", "est"))


def kmv_union(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Merge two per-group KMV sketch ROW tables — the ``(grp, h)`` shape
    ``kmv_hashes`` produces (NOT the aggregate rows of ``kmv_distinct``):
    the union sketch is the k smallest DISTINCT hashes of the concatenated
    inputs — exactly what makes KMV shippable: each shard sketches locally,
    one tiny merge answers the global distinct count. theta/n_hashes are
    recomputed from the merged rows, so merging is associative and
    idempotent.
    """
    hashes = a.unionByName(b).select("grp", "h")
    return _kmv_estimate(_kmv_topk(hashes, k), k)


def kmv_hashes(df: DataFrame, group_col: str, value_col: str,
               k: int = 256) -> DataFrame:
    """(grp, h): the mergeable representation — each group's k smallest
    distinct hashes (the sketch itself, k longs per group)."""
    return _kmv_topk(df.select(
        F.col(group_col).alias("grp"),
        _md5_60(F.col(value_col)).alias("h")), k)


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two count-min sketches (schema of ``cms_build``) by cell-wise
    addition — CMS is a linear sketch, so the merged table answers queries
    over the union stream exactly as a single-pass build would."""
    return (a.unionByName(b).groupBy("row", "col")
            .agg(F.sum("c").alias("c")))
