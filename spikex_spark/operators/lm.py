"""Distributed n-gram language-model training and perplexity filtering.

The CCNet / RefinedWeb recipe scores every web document against a language
model and drops the high-perplexity tail (Wenzek et al. 2020 §4.3 use a
KenLM 5-gram; Penedo et al. 2023 keep the same shape). Here the LM is an
add-k-smoothed bigram model *trained distributively on the corpus itself* —
the same count-and-join shape as the MapReduce LM of Brants et al. 2007
("Large Language Models in Machine Translation"), so the 100-TB story is
the classic one:

* **training** is one explode → ``groupBy(w1, w2)`` count with map-side
  partial aggregation (hot bigrams — "of the" — combine before the
  shuffle; the shuffle carries (token, token, count) rows, never text);
* **scoring** joins each document's *distinct* bigram counts against the
  count tables on ``(w1, w2)`` and ``(w1,)`` — inverted-frequency joins,
  no broadcast of the (unboundedly large) vocabulary, no driver state;
* skew: the head context ("the", "<s>") is the hottest join key, but the
  joined payload per key is one count row per side, so AQE skew-split
  handles it without salting.

Everything is pure Catalyst — no Python in the hot path. Determinism for
the DuckDB oracle: each bigram's log-probability is scaled to an int64
(``round(ln·1e7)``) so the per-document sum is EXACT integer arithmetic —
a float sum is engine-order-dependent and a corpus-size document lands on
rounding boundaries often enough to flip the 6th decimal (observed at
sf0.01). The perplexity is computed from the exact scaled sum.

Tokenization matches :mod:`spikex_spark.operators.textstats` (lower,
split on non-alphanumeric), with a ``<s>`` sentinel prepended so the first
real token has a context. Documents with zero tokens have no bigrams and
are excluded (no perplexity is defined for them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BOS = "<s>"


def doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per bigram instance, BOS-prefixed.

    Bigrams come from ``zip_with`` over offset slices, which is TOTAL on
    every row — an indexed ``transform(sequence(...))`` is unsafe here
    because InferFiltersFromGenerate copies the generator input below any
    size guard (see textstats.repetition_stats).
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
    )
    w = F.concat(F.array(F.lit(BOS)), toks)
    return (
        df.select(F.col(id_col).alias("id"), w.alias("w"))
        .select(
            "id",
            F.expr(
                "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),"
                " (a, b) -> struct(a AS w1, b AS w2))"
            ).alias("bg"),
        )
        .select("id", F.explode("bg").alias("g"))
        .select("id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    )


def train_bigram_lm(
    df: DataFrame, id_col: str, text_col: str, k: float = 0.5
) -> DataFrame:
    """(w1, w2, logp) — add-k-smoothed bigram log-probabilities.

    ``p(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V)`` with V = |next-token
    vocabulary| (distinct w2 over the corpus). ``logp`` is the natural log
    scaled by 1e7 and stored as int64 — the oracle-exact unit the scorer
    sums (integer sums are order-independent; float sums are not).
    """
    bg = doc_bigrams(df, id_col, text_col)
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").cast("double").alias("cbw"))
    ctx = bg.groupBy("w1").agg(F.count("*").cast("double").alias("cw"))
    voc = bg.agg(F.countDistinct("w2").cast("double").alias("V"))
    return (
        bgc.join(ctx, "w1")
        .crossJoin(F.broadcast(voc))
        .select(
            "w1",
            "w2",
            F.round(
                F.log((F.col("cbw") + F.lit(k)) / (F.col("cw") + F.lit(k) * F.col("V")))
                * F.lit(1e7),
                0,
            ).cast("long").alias("logp"),
        )
    )


def perplexity(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: float = 0.5,
    threshold: float = 500.0,
    lm: DataFrame | None = None,
) -> DataFrame:
    """(id, n_bigrams, logprob_e7, ppl, keep) — per-document perplexity
    under the bigram LM, plus the CCNet-style keep flag (``ppl <=
    threshold``). ``logprob_e7`` is the EXACT int64 log-probability scaled
    by 1e7 (a rounded float here lands on decimal ties the engines break
    differently — observed at sf0.01); ``ppl`` is safe to round because
    ``exp`` of a non-trivial argument is never decimal-exact.

    ``lm`` defaults to a model trained on ``df`` itself (the deterministic
    self-scoring setup); pass a model from :func:`train_bigram_lm` on a
    clean reference corpus for the real CCNet shape. The join is on the
    document's *distinct* bigrams (carrying an instance count), so a
    degenerate repetitive page costs one row per distinct bigram, not one
    per instance.
    """
    if lm is None:
        lm = train_bigram_lm(df, id_col, text_col, k=k)
    docbg = (
        doc_bigrams(df, id_col, text_col)
        .groupBy("id", "w1", "w2")
        .agg(F.count("*").alias("c"))
    )
    scored = (
        docbg.join(lm, ["w1", "w2"])
        .groupBy("id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("logp")).alias("_lp_scaled"),
        )
    )
    lp = F.col("_lp_scaled") / F.lit(1e7)
    ppl = F.round(F.exp(-lp / F.col("n_bigrams")), 6)
    return scored.select(
        "id",
        "n_bigrams",
        F.col("_lp_scaled").cast("long").alias("logprob_e7"),
        ppl.alias("ppl"),
        (ppl <= F.lit(threshold)).cast("int").alias("keep"),
    )
