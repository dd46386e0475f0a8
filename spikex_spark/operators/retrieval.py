"""Distributed inverted-index build and BM25 top-k retrieval.

The retrieval half of a RAG / dedup-by-retrieval pipeline: build the
classic (term → postings) statistics over the corpus, then score a batch
of queries with BM25 (Robertson–Spärck Jones idf, k1/b saturation) and
return the top-k documents per query.

100-TB shape — the textbook distributed-search layout:

* **index build**: one explode → ``groupBy(doc_id, term)`` count (map-side
  partial agg), then per-term document frequencies and per-doc lengths as
  two narrow roll-ups. Shuffles carry (term, count) rows, never text.
* **scoring**: query terms (small, broadcast) join the postings table on
  ``term`` — the planner broadcasts the query side, so the big postings
  relation is scanned once, filtered to matching terms at the scan via the
  broadcast hash join, and the per-(query, doc) partial scores combine in
  one keyed aggregation. No all-pairs anything.
* **top-k**: one window over (query_id) — k rows per query survive.

Determinism for the DuckDB oracle: idf is rounded to 7 digits, each
per-term contribution is scaled to an int64 (``round(w·1e7)``) so the
per-document score sum is EXACT integer arithmetic (float sums are
engine-order-dependent and land on decimal rounding ties — observed at
sf0.001); the reported score is the single exact division ``sum/1e7``.
Ties break on doc id ascending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(col):
    return F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != "")


def build_index(df: DataFrame, id_col: str, text_col: str):
    """Returns (postings, doclen, termstats):

    * postings(doc_id, term, tf)
    * doclen(doc_id, dl) + the corpus scalars folded in downstream
    * termstats(term, df_t)
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    )
    postings = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("double").alias("tf")
    )
    doclen = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    termstats = postings.groupBy("term").agg(
        F.count("*").cast("double").alias("df_t")
    )
    return postings, doclen, termstats


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(query_id, doc_id, score, rank) — BM25 top-k per query.

    ``queries`` is a small (query_id, qtext) DataFrame; its *distinct*
    terms are what joins the postings (standard bag-of-words BM25 with
    each distinct query term weighted once). idf uses the +1 floor
    (Lucene's non-negative variant): ``ln(1 + (N - df + 0.5)/(df + 0.5))``.
    """
    postings, doclen, termstats = build_index(df, id_col, text_col)
    corpus = doclen.agg(
        F.count("*").cast("double").alias("N"),
        F.avg("dl").alias("avgdl"),
    )
    qterms = (
        queries.select(
            F.col("query_id"), F.explode(_tokens(F.col("qtext"))).alias("term")
        )
        .distinct()
    )
    idf = termstats.crossJoin(F.broadcast(corpus.select("N"))).select(
        "term",
        F.round(
            F.log(
                F.lit(1.0)
                + (F.col("N") - F.col("df_t") + F.lit(0.5)) / (F.col("df_t") + F.lit(0.5))
            ),
            7,
        ).alias("idf"),
    )
    # broadcast the (tiny) query-term list: the postings scan keeps only
    # matching terms via the broadcast hash join — no shuffle of postings
    contrib = (
        postings.join(F.broadcast(qterms), "term")
        .join(doclen, "doc_id")
        .join(idf, "term")
        .crossJoin(F.broadcast(corpus.select("avgdl")))
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.col("idf")
                * (F.col("tf") * (F.lit(k1) + 1.0))
                / (F.col("tf") + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")))
                * F.lit(1e7),
                0,
            ).cast("long").alias("w"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        (F.sum("w") / F.lit(1e7)).alias("score")
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.select(
            "query_id", "doc_id", "score", F.row_number().over(win).alias("rank")
        )
        .where(F.col("rank") <= k)
    )


def corpus_queries(df: DataFrame, id_col: str, text_col: str,
                   every: int = 100, n_tokens: int = 8) -> DataFrame:
    """Deterministic self-queries: every ``every``-th document contributes
    its first ``n_tokens`` normalized tokens as a query — no external data,
    reproducible in SQL."""
    toks = _tokens(F.col(text_col))
    return (
        df.where((F.col(id_col) % every) == 0)
        .select(
            F.col(id_col).alias("query_id"),
            F.array_join(F.slice(toks, 1, n_tokens), " ").alias("qtext"),
        )
    )


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str,
                    k: int = 5) -> DataFrame:
    """(doc_id, term, score, rank) — the k most characteristic terms per
    document by tf·idf: keyword extraction / topic labeling over a crawl.

    Reuses the inverted-index statistics (one explode + map-side-combined
    counts; shuffles carry counts, never text). idf = ln(1 + N/df_t),
    int64-scaled before the tf product so the score is exact integer
    arithmetic divided once (the BM25 determinism recipe); ranks break
    ties on term ascending.

    Scale: corpus-size stats are two narrow roll-ups of the postings
    table; the per-doc top-k is one window on doc_id — no global sort.
    """
    postings, _, termstats = build_index(df, id_col, text_col)
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("n"))
    idf = F.round(
        F.log(F.lit(1.0) + F.col("n") / F.col("df_t")) * F.lit(1e7), 0
    ).cast("long")
    scored = (postings.crossJoin(F.broadcast(n_docs))
              .join(termstats, "term")
              .select("doc_id", "term",
                      (F.col("tf").cast("long") * idf).alias("w")))
    win = Window.partitionBy("doc_id").orderBy(
        F.col("w").desc(), F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(win))
            .where(F.col("rank") <= k)
            .select("doc_id", "term",
                    (F.col("w") / F.lit(1e7)).alias("score"), "rank"))


def cluster_label_terms(df: DataFrame, clusters: DataFrame,
                        id_col: str, text_col: str,
                        cluster_col: str = "cluster_id",
                        k: int = 5, min_members: int = 2) -> DataFrame:
    """(cluster_id, term, score, rank) — c-TF-IDF cluster labeling
    (the BERTopic recipe): treat each cluster's concatenated members as
    one pseudo-document and rank terms by
    ``tf_{t,c} · ln(1 + A / f_t)`` where ``f_t`` is the term's total
    count across all clustered docs and ``A`` the mean tokens per
    cluster — the human-readable "what IS this entity/near-dup
    cluster" layer on top of the ER output.

    Clusters under ``min_members`` members are dropped (singletons
    reduce to per-doc tf-idf, which ``tfidf_top_terms`` already
    serves). Same determinism recipe as BM25/tf-idf: the ln factor is
    1e7-snapped int64 before the tf product, ranks break ties on term
    ascending. Scale: one explode with map-side combine (shuffles
    carry counts, never text), stats are narrow roll-ups, top-k is one
    window per cluster key.
    """
    kept = (clusters.groupBy(F.col(cluster_col).alias("cl"))
            .agg(F.count("*").alias("n"))
            .where(F.col("n") >= min_members).select("cl"))
    mem = clusters.select(F.col(id_col).alias("id"),
                          F.col(cluster_col).alias("cl")).join(kept, "cl")
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != "")
    tc = (df.select(F.col(id_col).alias("id"), toks.alias("_t"))
          .join(mem, "id")
          .select("cl", F.explode("_t").alias("term"))
          .groupBy("cl", "term").agg(F.count("*").alias("tf")))
    ft = tc.groupBy("term").agg(F.sum("tf").alias("f_t"))
    avg = (tc.agg((F.sum("tf") / F.countDistinct("cl")).alias("a")))
    w = F.round(
        F.col("tf") * F.log(F.lit(1.0) + F.col("a") / F.col("f_t"))
        * F.lit(1e7), 0).cast("long")
    scored = (tc.join(ft, "term").crossJoin(F.broadcast(avg))
              .select(F.col("cl").alias("cluster_id"), "term",
                      w.alias("w")))
    win = Window.partitionBy("cluster_id").orderBy(
        F.col("w").desc(), F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(win))
            .where(F.col("rank") <= k)
            .select("cluster_id", "term",
                    F.round(F.col("w") / F.lit(1e7), 6).alias("score"),
                    "rank"))
