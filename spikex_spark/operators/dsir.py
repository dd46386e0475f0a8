"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, arXiv:2302.03169).

Selects pretraining documents from a large raw crawl that "look like" a
small high-quality target corpus: fit bag-of-hashed-n-gram models on
both, then weight each raw document by the log-likelihood ratio of its
hashed features under target vs raw.  This is the standard published
alternative to classifier-based quality filtering (GPT-3 style) and the
missing piece between this engine's quality scores (rule-based), NB /
logistic matchers (supervised) and perplexity filtering (LM-based): DSIR
needs no labels and no trained LM, only the two corpora.

Beyond-reference operator (the reference pipeline has no data-selection
stage); part of the LLM-training-pipeline mandate.  Numeric conventions
follow :mod:`spikex_spark.operators.lm`: each bucket's log-ratio is
snapped to an int64 at 1e7 scale so per-document sums are EXACT integer
arithmetic (order-independent, oracle-replayable); md5 is the
cross-engine hash (DuckDB mirrors ``('0x'||substr(md5(g),1,8))::bigint``).

100-TB shape: the feature stream is a narrow map + explode; bucket
count tables are at most ``buckets`` rows (map-side partial agg, then a
``buckets``-row shuffle); the log-ratio table is broadcast to the
per-document aggregation, so the only data-sized shuffle is the
(id, bucket) partial-count agg.  Top-k selection is a distributed
TakeOrdered of k rows plus a broadcast boundary comparison — never a
single-partition global window.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["doc_hashed_ngrams", "dsir_logratios", "dsir_weights"]

DSIR_BUCKETS = 1024


def _bucket(col: F.Column, buckets: int) -> F.Column:
    """First 8 md5 hex chars -> non-negative int64 bucket (cross-engine)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % buckets


def doc_hashed_ngrams(
    df: DataFrame, id_col: str, text_col: str, buckets: int = DSIR_BUCKETS
) -> DataFrame:
    """(id, b, c) — hashed unigram+bigram bucket instance counts per doc.

    Tokenization matches :func:`spikex_spark.operators.lm.doc_bigrams`
    (lowercase, ``[^a-z0-9]+`` split, empties dropped) but without BOS —
    DSIR's features are corpus-content n-grams, not LM contexts.  The
    bigram ``zip_with`` over ``greatest(size-1, 0)``-length slices is
    TOTAL on every row (an indexed ``transform(sequence(...))`` guarded
    by a size filter is unsafe — InferFiltersFromGenerate copies the
    generator input below the guard; see lm.doc_bigrams).
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
    )
    grams = F.concat(
        F.col("toks"),
        F.expr(
            "zip_with(slice(toks, 1, greatest(size(toks) - 1, 0)),"
            " slice(toks, 2, greatest(size(toks) - 1, 0)),"
            " (a, b) -> concat(a, ' ', b))"
        ),
    )
    return (
        df.select(F.col(id_col).alias("id"), toks.alias("toks"))
        .select("id", F.explode(grams).alias("gram"))
        .select("id", _bucket(F.col("gram"), buckets).alias("b"))
        .groupBy("id", "b")
        .agg(F.count("*").alias("c"))
    )


def dsir_logratios(
    raw_counts: DataFrame,
    target_counts: DataFrame,
    buckets: int = DSIR_BUCKETS,
    alpha: float = 0.5,
) -> DataFrame:
    """(b, lam_e7) — per-bucket importance log-ratio, int64 at 1e7 scale.

    ``lam[b] = ln( ((c_t[b]+a)/(N_t+aB)) / ((c_s[b]+a)/(N_s+aB)) )`` with
    add-``alpha`` smoothing on both hashed-n-gram multinomials (paper
    §2.2, "hashed n-gram features").  Inputs are the (id, b, c) outputs
    of :func:`doc_hashed_ngrams` for the raw and target corpora.  Only
    buckets present in the raw corpus are emitted — a document can never
    touch a bucket its own corpus lacks, so absent buckets are dead
    weight.  The result is at most ``buckets`` rows: always broadcast.
    """
    cs = raw_counts.groupBy("b").agg(F.sum("c").alias("c_s"))
    ct = target_counts.groupBy("b").agg(F.sum("c").alias("c_t"))
    tot_s = cs.agg(F.sum("c_s").cast("double").alias("n_s"))
    tot_t = ct.agg(F.sum("c_t").cast("double").alias("n_t"))
    a, ab = F.lit(float(alpha)), F.lit(float(alpha) * buckets)
    p_t = (F.coalesce(F.col("c_t"), F.lit(0)).cast("double") + a) / (
        F.col("n_t") + ab
    )
    p_s = (F.col("c_s").cast("double") + a) / (F.col("n_s") + ab)
    return (
        cs.join(ct, "b", "left")
        .crossJoin(F.broadcast(tot_s))
        .crossJoin(F.broadcast(tot_t))
        .select(
            "b",
            F.round(F.log(p_t / p_s) * F.lit(1e7), 0)
            .cast("long")
            .alias("lam_e7"),
        )
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int = DSIR_BUCKETS,
    alpha: float = 0.5,
    top_k: int | None = None,
) -> DataFrame:
    """(id, n_grams, weight_e7, keep) — DSIR importance weight per raw doc.

    ``weight_e7 = sum_b c_doc[b] * lam_e7[b]`` — an exact int64 (the
    paper's log importance weight, up to the 1e7 snap).  ``keep`` marks
    the deterministic top-``top_k`` selection by ``(weight_e7 DESC, id
    ASC)``; the paper resamples with Gumbel noise, which is not
    oracle-replayable — top-k is its deterministic limit and what
    production pipelines (e.g. DoReMi-style re-runs) actually ship.
    With ``top_k=None`` every scored document has ``keep=1``.

    Documents with zero alphanumeric tokens produce no feature rows and
    are absent from the output (they carry no evidence either way).

    Scale: one (id, b) partial-count shuffle over the feature stream, a
    broadcast join against the <= ``buckets``-row lam table, one per-id
    agg; the top-k boundary is a distributed TakeOrdered of ``top_k``
    rows reduced to a single broadcast (weight, id) cut point — no
    global window, no driver-side sort of the corpus.
    """
    raw_counts = doc_hashed_ngrams(raw, id_col, text_col, buckets)
    tgt_counts = doc_hashed_ngrams(target, id_col, text_col, buckets)
    lam = dsir_logratios(raw_counts, tgt_counts, buckets, alpha)
    w = (
        raw_counts.join(F.broadcast(lam), "b")
        .groupBy("id")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.sum(F.col("c") * F.col("lam_e7")).cast("long").alias("weight_e7"),
        )
    )
    if top_k is None:
        return w.select(
            "id", "n_grams", "weight_e7", F.lit(1).cast("int").alias("keep")
        )
    # Boundary of the top-k set under (weight DESC, id ASC): the
    # lexicographic MIN of (weight, -id) over the k best rows. limit()
    # after orderBy is a distributed TakeOrdered; the agg collects ONE row.
    cut = (
        w.orderBy(F.col("weight_e7").desc(), F.col("id").asc())
        .limit(int(top_k))
        .agg(F.min(F.struct(F.col("weight_e7"), (-F.col("id")).alias("nid"))))
        .collect()[0][0]
    )
    if cut is None:  # empty corpus
        return w.select(
            "id", "n_grams", "weight_e7", F.lit(0).cast("int").alias("keep")
        )
    kw, nkid = cut[0], cut[1]
    keep = (F.col("weight_e7") > F.lit(kw)) | (
        (F.col("weight_e7") == F.lit(kw)) & (F.col("id") <= F.lit(-nkid))
    )
    return w.select("id", "n_grams", "weight_e7", keep.cast("int").alias("keep"))
