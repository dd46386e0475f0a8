"""Exact tf-idf cosine similarity self-join via norm-bound prefix filtering.

The weighted sibling of ``dedup.jaccard_prefix_pairs``: AllPairs (Bayardo
et al., WWW'07) for cosine over tf·idf-weighted token vectors — THE
similarity that separates "same boilerplate template" (high Jaccard on
stopwords) from "same content" (high weight on rare terms). Exact, no
LSH recall loss; the oracle runs the naive all-shared-token join and
must agree pair-for-pair.

Determinism contract — everything before the last expression is int64:

* weights: ``w_t = tf_t · idf_q(t)`` with ``idf_q = round(ln(1+N/df)·10³)``
  — integer-quantized idf is part of the METRIC's definition here, which
  is what makes dot products and norms exact integer sums (a float Σwᵢwⱼ
  is reduction-order-dependent and can't be oracle-hashed).
* cosine: ``dot / sqrt(na·nb)`` over those exact integers — cast, multiply,
  sqrt, divide are all IEEE correctly-rounded, so both engines produce the
  identical double; the threshold compares that unrounded value (rounding
  first would re-admit pairs the prefix filter correctly never generated).

Prefix filter (lossless): under a fixed global token order (df asc, token
asc — rarest first), if every shared token lies in x's SUFFIX S then
``dot(x,y) ≤ ‖x_S‖·‖y‖``, so ``cos ≥ t`` forces a shared token in x's
prefix — the shortest prefix whose remaining suffix has
``‖S‖² < t²·‖x‖²``. The comparison ``rem·t_den² ≥ t_num²·‖x‖²`` is pure
int64. Candidates join each doc's PREFIX tokens (rare by construction —
hub tokens never enter a prefix) against the full postings of the other
side; prefix⋈postings is used instead of prefix⋈prefix because the
weighted prefix–prefix guarantee needs a max-weight order we don't carry,
and the rare-token side already keeps the join skew-free.

Scale shape: one shuffle for df, one groupBy(doc) for sorted vectors, a
candidate join driven only by rare prefix tokens, then per-pair exact
verification as a sequential integer fold over the carried sorted vector
(map lookup into the other side) — no pair explosion, no float sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_IDF_SCALE = 1000  # idf quantization — part of the metric definition


def _tok_tf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tok, tf): per-document token term frequencies."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != "")
    return (df.select(F.col(id_col).alias("id"),
                      F.explode(toks).alias("tok"))
            .groupBy("id", "tok").agg(F.count("*").alias("tf")))


def cosine_tfidf_pairs(df: DataFrame, id_col: str, text_col: str,
                       threshold_pct: int = 60) -> DataFrame:
    """(id_a, id_b, dot, norm_a, norm_b, cosine): all document pairs with
    tf·idf cosine ≥ threshold_pct/100.

    ``threshold_pct`` is an integer percentage so the prefix bound
    ``rem·10⁴ ≥ t_pct²·norm²`` stays in exact int64 arithmetic.
    """
    t_pct = int(threshold_pct)
    tf = _tok_tf(df, id_col, text_col)
    # N as a broadcast 1-row frame, not a driver count() — keeps plan
    # construction job-free (the build-only explain sweep relies on it)
    corpus = df.select(F.col(id_col)).distinct().agg(
        F.count("*").alias("n_docs"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("dfreq"))
    idf_q = F.round(
        F.log(F.lit(1.0)
              + F.col("n_docs").cast("double") / F.col("dfreq"))
        * F.lit(_IDF_SCALE)).cast("long")
    weighted = (tf.join(dfreq, "tok")
                .crossJoin(F.broadcast(corpus))
                .select("id", "tok", "dfreq",
                        (F.col("tf") * idf_q).alias("w")))

    # global rarity order; per-doc norm² and the running suffix norm²
    win = Window.partitionBy("id").orderBy(
        F.col("dfreq").asc(), F.col("tok").asc())
    wtot = Window.partitionBy("id")
    rows = (weighted
            .withColumn("w2", F.col("w") * F.col("w"))
            .withColumn("norm2", F.sum("w2").over(wtot))
            .withColumn("pref2", F.sum("w2").over(
                win.rowsBetween(Window.unboundedPreceding, -1))))
    # token is IN the prefix while the suffix starting at it could still
    # reach t: (norm2 - preceding_cum) · 10⁴ ≥ t² · norm2  — all int64
    # decimal(38,0): norm2·10⁴ can pass int64 on giant documents; a
    # silent wraparound here would truncate prefixes → recall loss
    dec = "decimal(38,0)"
    rem2 = (F.col("norm2") - F.coalesce(F.col("pref2"), F.lit(0))).cast(dec)
    in_prefix = (rem2 * F.lit(10000).cast(dec)
                 >= F.lit(t_pct * t_pct).cast(dec)
                 * F.col("norm2").cast(dec))

    prefixes = rows.where(in_prefix).select("id", "tok")
    postings = weighted.select("id", "tok")
    cand = (prefixes.alias("a").join(postings.alias("b"), "tok")
            .where(F.col("a.id") != F.col("b.id"))
            .select(F.least("a.id", "b.id").alias("id_a"),
                    F.greatest("a.id", "b.id").alias("id_b"))
            .distinct())

    vecs = (weighted
            .groupBy("id")
            .agg(F.array_sort(F.collect_list(
                     F.struct("tok", "w"))).alias("vec"),
                 F.sum(F.col("w") * F.col("w")).alias("norm2")))
    a = vecs.select(F.col("id").alias("id_a"),
                    F.col("vec").alias("va"),
                    F.col("norm2").alias("norm_a"))
    b = vecs.select(F.col("id").alias("id_b"),
                    F.map_from_entries("vec").alias("mb"),
                    F.col("norm2").alias("norm_b"))
    # dot: sequential fold over a's SORTED vector with map lookups into
    # b — deterministic order, integer accumulator
    dot = F.aggregate(
        F.col("va"), F.lit(0).cast("long"),
        lambda acc, e: acc + e["w"] * F.coalesce(
            F.col("mb")[e["tok"]], F.lit(0).cast("long")))
    out = (cand.join(a, "id_a").join(b, "id_b")
           .withColumn("dot", dot)
           .withColumn("_cos",
                       F.col("dot").cast("double")
                       / F.sqrt(F.col("norm_a").cast("double")
                                * F.col("norm_b").cast("double"))))
    return (out.where(F.col("_cos") >= F.lit(t_pct) / F.lit(100.0))
            .select("id_a", "id_b", "dot", "norm_a", "norm_b",
                    F.round(F.col("_cos"), 6).alias("cosine")))
