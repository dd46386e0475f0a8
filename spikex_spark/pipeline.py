"""End-to-end ER pipeline: extract → block → pair → score → cluster.

The flagship query (BASELINE.json north_rule). Composable: every stage is a
``DataFrame -> DataFrame`` transform, so Catalyst sees ONE logical plan and
can push filters/pruning across stage boundaries; the only Python stages are
the byte-identical extractor and the Jaro-Winkler scorer (both Arrow).

Two entry points:

* ``resolve_entities``   — title-key blocking over a `pages`-shaped table
  (url, text, ...) against a `titles` dimension; the reference-parity path.
* ``resolve_documents``  — self-contained blocking (token-key + optional
  MinHash/LSH channel) for a generic documents table with no title
  dimension; used by the driver correctness gate over
  /root/testdata documents.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .extract import extract_stage
from .operators import blocking as B
from .operators import cc as CC
from .operators import pairs as P
from .operators import scoring as S


@dataclass(frozen=True)
class ERConfig:
    threshold: float = 0.75
    jw_weight: float = 0.5
    max_ngram: int = 4
    block_cap: int = 10_000
    nsalt: int = 16
    use_arrow_extract: bool = True
    # dictionaries up to this many keys ship into the Arrow scan stage
    # (reference broadcast-trie strategy); larger ones use the n-gram join
    broadcast_keys_max: int = 2_000_000
    # clusters via star-collapsed edges (see _star_edges) instead of the
    # full per-pair edge enumeration — identical components, O(m+g²) edges
    star_collapse: bool = True


def _mentions(pages: DataFrame, keys: DataFrame, cfg: ERConfig,
              id_col: str, text_col: str) -> DataFrame:
    # ONE Arrow job decides the strategy AND loads the dictionary: pull at
    # most max+1 keys via limit().toPandas() — py4j row collect() serialized
    # up to 2M rows one at a time and needed a separate count() job first
    # (the pathology operators/cc.py documents and avoids the same way)
    distinct_keys = keys.select("key").distinct()
    head = distinct_keys.limit(cfg.broadcast_keys_max + 1).toPandas()
    if len(head) <= cfg.broadcast_keys_max:
        # FUSED extract+scan: raw text crosses the Arrow boundary once
        # (raw_ws tokenization ≡ extract(ws→_) + split, proven by test)
        return B.mentions_broadcast(pages, head["key"].tolist(),
                                    id_col=id_col, text_col=text_col,
                                    max_n=cfg.max_ngram, raw_ws=True)
    extracted = extract_stage(pages.select(id_col, text_col), text_col)
    # broadcast_keys=False: this branch exists BECAUSE the dictionary exceeds
    # broadcast_keys_max — forcing F.broadcast() here would override AQE's
    # size check and OOM at wiki scale (~20M keys). The shuffle-join path's
    # first-token prefilter engages instead.
    return B.mentions(extracted, keys, id_col=id_col, text_col="extracted",
                      max_n=cfg.max_ngram, broadcast_keys=False)


def _er_stage_results(pages: DataFrame, titles: DataFrame, cfg: ERConfig,
                      id_col: str, text_col: str, run) -> tuple[DataFrame, DataFrame]:
    """Shared stage graph (mentions → blocks → pairs → scores) behind a
    ``run(name, build)`` hook: identity for the one-shot path,
    ``lineage.run_stage`` for the ledgered/resumable path — ONE definition
    of the flagship pipeline, two physical execution modes."""
    keys = B.title_keys(titles)
    ments = run(
        "10_mentions",
        lambda: _mentions(pages.select(id_col, text_col), keys, cfg,
                          id_col, text_col),
    )
    # blocks feed block_sizes, both sides of the pair self-join, and the
    # surface lookup — checkpoint the members once instead of recomputing
    # the whole extract→mention chain per consumer (the ledgered runner
    # additionally persists the salted result)
    blocks = run(
        "20_blocks",
        lambda: B.salt_blocks(
            B.block_members(ments, keys).localCheckpoint(),  # eager: lazy+AQE showed unstable re-plans
            cap=cfg.block_cap, nsalt=cfg.nsalt,
        ),
        # ledgered runs write this stage hash-bucketed + sorted so the
        # downstream window / pair self-join / size agg all read
        # pre-partitioned, pre-sorted data — no exchange per consumer
        bucket_by=["block_key"], sort_by=["block_key", "salt", "surface"],
    )
    if cfg.star_collapse:
        # the star-collapsed clusters stage never reads pairs/scores — a
        # ledgered runner must NOT eagerly materialize the full O(m²) pair
        # enumeration star-collapse exists to avoid. Build them lazily
        # (outside `run`) for the pairwise view only; the resumable path
        # ledgers the star-edge stage instead (see resolve_entities).
        pairs = P.candidate_pairs(blocks, salted=True)
        scored = S.score_pairs(pairs, jw_weight=cfg.jw_weight)
    else:
        pairs = run("30_pairs", lambda: P.candidate_pairs(blocks, salted=True))
        scored = run("40_scores",
                     lambda: S.score_pairs(pairs, jw_weight=cfg.jw_weight))
    return blocks, scored


def _star_edges(blocks: DataFrame, cfg: ERConfig) -> DataFrame:
    """Connectivity-preserving edge reduction over salted blocks.

    Within one (block_key, salt) cell, docs sharing the SAME surface always
    match — score(s, s) = jw_weight·1 + (1-jw_weight)·1 = 1.0 ≥ threshold —
    so each (block_key, salt, surface) group collapses to a star on its
    min-id representative; cross-surface matches connect group
    representatives only (pair score depends only on the surface pair, so
    every member pair matches iff the rep pair does). Components equal the
    full per-pair enumeration's, with O(m + g²) edges per cell instead of
    O(m²) (g = distinct surfaces, typically 1-3). Same theorem as the
    er_pages contract path, whose oracle proves it hash-identical against
    full pair enumeration at sf0.01.

    Invariant required for exactness: every surface normalizes non-empty
    (guaranteed here — surfaces are dictionary-key matches), otherwise
    score(s, s) = 0.5·jacc would undercut thresholds > 0.5.
    """
    # ONE window shuffle instead of groupBy + join-back: every member row
    # learns its group rep in the same exchange, and `groups` derives from
    # the identical subplan so the exchange is reused, not recomputed
    from pyspark.sql import Window
    w = Window.partitionBy("block_key", "salt", "surface")
    # checkpoint the windowed frame: it feeds intra AND groups, and a
    # window SORT is not an exchange, so each consumer would re-sort the
    # full member table (measured ~2x the stage at 4.8M pages); on a
    # cluster this is the stage-ledger write
    bl = blocks.withColumn("rep", F.min("id").over(w)).localCheckpoint(eager=False)
    intra = (
        bl.where(F.col("id") != F.col("rep"))
        .select(F.col("id").alias("src"), F.col("rep").alias("dst"))
    )
    groups = (bl.select("block_key", "salt", "surface", "rep")
              .distinct().localCheckpoint(eager=False))
    ga = groups.select("block_key", "salt",
                       F.col("surface").alias("surface_a"),
                       F.col("rep").alias("id_a"))
    gb = groups.select("block_key", "salt",
                       F.col("surface").alias("surface_b"),
                       F.col("rep").alias("id_b"))
    gpairs = (
        ga.join(gb, ["block_key", "salt"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "surface_a", "surface_b")
    )
    inter = (
        S.score_pairs(gpairs, jw_weight=cfg.jw_weight)
        .where(F.col("score") >= cfg.threshold)
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    # no distinct here: connected_components canonicalizes + dedups anyway
    return intra.unionByName(inter)


def resolve_entities(pages: DataFrame, titles: DataFrame,
                     cfg: ERConfig = ERConfig(),
                     id_col: str = "url", text_col: str = "text",
                     stage_runner=None) -> DataFrame:
    """(url, cluster_id, block_key, surface) — entity clusters over pages.

    ``stage_runner(name, build)``: optional per-stage execution hook (see
    ``lineage.resolve_entities_resumable``); default executes in one plan.
    """
    run = stage_runner or (lambda name, build, **hints: build())
    blocks, scored = _er_stage_results(pages, titles, cfg, id_col, text_col,
                                       run)
    all_ids = pages.select(F.col(id_col).alias("id"))
    return cluster_from_blocks(blocks, scored, all_ids, cfg, run, id_col)


def cluster_from_blocks(blocks: DataFrame, scored: DataFrame | None,
                        all_ids: DataFrame, cfg: ERConfig, run,
                        id_col: str = "url") -> DataFrame:
    """The back half of the flagship pipeline (edges → CC → best-key join),
    reusable over ANY salted block-membership table — the one-shot path,
    the ledgered path, and the incremental path
    (``lineage.resolve_entities_incremental``) all end here."""
    # star path: ledger the REDUCED edge set (O(m+g²) per cell) — this is
    # the stage a resumable run restarts from, replacing the pair/score
    # ledgers of the enumeration path
    edges = (run("30_star_edges", lambda: _star_edges(blocks, cfg))
             if cfg.star_collapse
             else S.match_edges(scored, cfg.threshold))

    def _clusters() -> DataFrame:
        assign = CC.cluster_assignments(edges, all_ids)
        best = blocks.groupBy("id").agg(
            F.min("block_key").alias("block_key"),
            F.min("surface").alias("surface"),
        )
        return assign.join(best, "id", "left").select(
            F.col("id").alias(id_col), "cluster_id", "block_key", "surface"
        )

    return run("50_clusters", _clusters)


# the ONE deterministic LSH bucket cap shared by the one-shot, ledgered,
# and incremental document pipelines — their equivalence proofs assume it
DOC_BUCKET_CAP = 1000


def bucket_pair_join(capped_buckets: DataFrame) -> DataFrame:
    """(id_a, id_b) distinct pairs sharing ≥1 (band, bucket) — the self-join
    tail shared by every document-pipeline variant (pass ALREADY-capped
    buckets; see ``blocking.cap_blocks`` + ``DOC_BUCKET_CAP``)."""
    left = capped_buckets.select("band", "bucket", F.col("id").alias("id_a"))
    right = capped_buckets.select("band", "bucket", F.col("id").alias("id_b"))
    return (
        left.join(right, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def doc_candidate_pairs(docs: DataFrame, cfg: ERConfig = ERConfig(),
                        id_col: str = "doc_id", text_col: str = "text",
                        shingle_k: int = 5, num_hashes: int = 16,
                        bands: int = 4,
                        bucket_cap: int = DOC_BUCKET_CAP) -> DataFrame:
    """MinHash/LSH near-dup candidate pairs over a generic documents table.

    (id_a, id_b) distinct pairs sharing ≥1 LSH bucket. Every step is
    reproducible in ANSI SQL (md5-based minhash) for the DuckDB oracle.

    ``bucket_cap``: LSH buckets are content-keyed, so a boilerplate page
    duplicated millions of times lands its whole clone set in ONE bucket —
    a quadratic pair bomb exactly like a hub blocking key. Buckets keep the
    first ``bucket_cap`` members by id (deterministic, mirrored in the
    oracle's QUALIFY) before the self-join.
    """
    sh = B.shingle_df(docs, id_col, text_col, k=shingle_k)
    sig = B.minhash_signatures(sh, num_hashes=num_hashes)
    buckets = B.lsh_buckets(sig, bands=bands, rows_per_band=num_hashes // bands)
    buckets = B.cap_blocks(buckets, key_col=["band", "bucket"], id_col="id",
                           cap=bucket_cap)
    # materialize once: the self-join otherwise recomputes the whole
    # shingle→minhash chain for BOTH sides (no ReusedExchange across the
    # aliased projections; measured 2× at sf0.1). At cluster scale this is
    # the stage-ledger checkpoint (write to parquet/Iceberg, read back).
    buckets = buckets.localCheckpoint()
    return bucket_pair_join(buckets)


def doc_scored_pairs(docs: DataFrame, cfg: ERConfig = ERConfig(),
                     id_col: str = "doc_id", text_col: str = "text",
                     norm_prefix: int = 64, score_digits: int = 6) -> DataFrame:
    """Candidate pairs + combined similarity score.

    JW runs on the first ``norm_prefix`` chars of the normalized text (JW is
    quadratic per pair — bounding the operand keeps the scorer O(1) per pair
    at 100 TB); token-Jaccard sees the full text.
    """
    pairs = doc_candidate_pairs(docs, cfg, id_col, text_col)
    return score_doc_pairs(pairs, docs, cfg, id_col, text_col,
                           norm_prefix, score_digits)


def score_doc_pairs(pairs: DataFrame, docs: DataFrame,
                    cfg: ERConfig = ERConfig(),
                    id_col: str = "doc_id", text_col: str = "text",
                    norm_prefix: int = 64, score_digits: int = 6) -> DataFrame:
    """Score an EXPLICIT (id_a, id_b) pair table against the docs' texts —
    the scoring half of ``doc_scored_pairs``, reusable by the incremental
    path (which scores only pairs touching new docs). ``docs`` is read only
    for the pair participants (the joins prune it)."""
    # precompute per-DOC scoring inputs once (token set + JW prefix), then
    # join them to the pair table — computing them per-pair inlines the whole
    # normalization chain into every pair row (measured 3-4× slower at sf0.1)
    texts = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(S._tokens(F.col(text_col))).alias("toks"),
        F.substring(S._norm(F.col(text_col)), 1, norm_prefix).alias("n64"),
    )
    p = (
        pairs.join(
            texts.withColumnsRenamed({"id": "id_a", "toks": "toks_a", "n64": "n64_a"}),
            "id_a",
        ).join(
            texts.withColumnsRenamed({"id": "id_b", "toks": "toks_b", "n64": "n64_b"}),
            "id_b",
        )
    )
    # combine UNROUNDED components, round once — two-stage rounding lands on
    # exact decimal halves (e.g. 0.5*(x+y) of 6-decimal values) where Spark
    # (HALF_UP) and DuckDB disagree
    scored = (
        p.withColumn("_jw", S.jw_fast(F.col("n64_a"), F.col("n64_b")))
        .withColumn("_jacc", S.token_jaccard_arrays(F.col("toks_a"), F.col("toks_b")))
        .withColumn(
            "score",
            F.round(F.lit(cfg.jw_weight) * F.col("_jw")
                    + F.lit(1.0 - cfg.jw_weight) * F.col("_jacc"), score_digits),
        )
    )
    return scored.select(
        "id_a", "id_b",
        F.round(F.col("_jw"), 6).alias("jw"),
        F.round(F.col("_jacc"), 6).alias("jacc"),
        "score",
    )


def resolve_documents(docs: DataFrame, cfg: ERConfig = ERConfig(),
                      id_col: str = "doc_id", text_col: str = "text",
                      threshold: float = 0.80) -> DataFrame:
    """Flagship: (doc_id, cluster_id) near-dup clusters over documents."""
    scored = doc_scored_pairs(docs, cfg, id_col, text_col)
    edges = scored.where(F.col("score") >= threshold).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    assign = CC.cluster_assignments(edges, docs.select(F.col(id_col).alias("id")))
    return assign.select(F.col("id").alias(id_col), "cluster_id")


def scored_pairs(pages: DataFrame, titles: DataFrame,
                 cfg: ERConfig = ERConfig(),
                 id_col: str = "url", text_col: str = "text") -> DataFrame:
    """The pairwise view (for the F1 gate): (id_a, id_b, block_key, score,
    is_match). Gold pairs join on (id_a, id_b)."""
    _, scored = _er_stage_results(pages, titles, cfg, id_col, text_col,
                                  lambda name, build, **hints: build())
    return scored.withColumn("is_match", F.col("score") >= cfg.threshold)
