"""Benchmark harness — one JSON line for the driver (BENCH_r{N}.json).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]. The headline metric is end-to-end wall seconds;
pages/sec of the flagship ER pipeline is reported alongside (the
BASELINE.json throughput target).

Scaling evidence (north_rule): run twice —
  SPARK_GRAFT_CPUS=8  python bench.py
  SPARK_GRAFT_CPUS=32 python bench.py
and compare pages_per_sec; efficiency = (t8 / t32) / 4.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entrymod
    from spikex_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="bench")

    headline = [
        "er_doc_clusters",
        "er_doc_pairs",
        "er_pages_clusters",
        "mention_candidates",
        "mention_candidates_nested",
        "nb_train_probs",
        "stream_block_canonical",
        "minhash_buckets",
        "minhash_near_dups",
        "simhash_near_dups",
        "dedup_exact",
        "ann_cosine_topk",
        "lang_id",
        "quality_scores",
        "extract_normalize",
        "blocking_keys",
        "topk_orders",
        "running_max_events",
        "group_agg_events",
        "semi_join_orders",
    ]
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    # warm the JVM once so timings measure the engine, not first-run JIT:
    # a tiny-SF pass of the flagship exercises every heavy codepath (parquet
    # scan, HOF shingling, md5+minhash codegen, shuffle agg, the Arrow JW
    # UDF, CC) — measured ~5s of codegen warm-up otherwise lands on
    # whichever query runs first
    warm_sf = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_sf):
        warm_sf = sf_dir
    qs["er_doc_clusters"](spark, warm_sf).write.format("noop").mode("overwrite").save()
    qs["extract_normalize"](spark, sf_dir).count()

    # min-of-N per query (default 3): this is a shared box, and a single
    # rep records whoever else was on it — round 4's committed artifact
    # was a contended-window outlier (68.8s vs 43.5s quiet). The min of
    # back-to-back reps converges on the engine's own cost. The
    # per-process result memos are cleared before EVERY rep so repeats
    # re-execute the full compute chain instead of replaying a
    # localCheckpoint.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    def _clear_memos(blocks_ledger: bool = False) -> None:
        entrymod._DOC_CLUSTERS_MEMO.clear()
        entrymod._DOC_PAIRS_MEMO.clear()
        if blocks_ledger:
            # only for the blocks-WRITE line: every rep must pay the
            # bucketed stage write, not replay the on-disk ledger. The
            # consumer queries (er_pages_*) keep the warm ledger — reading
            # the stage snapshot is their designed at-scale shape.
            import shutil
            for d in entrymod._ER_BLOCKS_LEDGER.values():
                shutil.rmtree(d, ignore_errors=True)
            entrymod._ER_BLOCKS_LEDGER.clear()

    def _min_of(run, blocks_ledger: bool = False) -> float:
        best = None
        for _ in range(reps):
            _clear_memos(blocks_ledger)
            t0 = time.time()
            run()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    total = 0.0
    # the er_pages blocks stage is a bucketed LEDGER WRITE shared by both
    # er_pages queries (on a cluster: the Iceberg stage snapshot). Time it
    # as its own line so er_pages_clusters reports the compute leg only —
    # round-over-round comparisons otherwise charge the write to whichever
    # er_pages query runs first
    timings["er_pages_blocks_write"] = _min_of(
        lambda: entrymod._er_pages_blocks(spark, sf_dir)
        .write.format("noop").mode("overwrite").save(), blocks_ledger=True)
    total += timings["er_pages_blocks_write"]
    for name in headline:
        if name not in qs:
            continue
        timings[name] = _min_of(
            lambda: qs[name](spark, sf_dir)
            .write.format("noop").mode("overwrite").save())
        total += timings[name]

    er_secs = timings.get("er_doc_clusters", float("nan"))

    # gold-pair pairwise F1 (the BASELINE.json metric): score the planted
    # synth corpus at the blocking key and compare against the labeled-pair
    # fixture (tests/test_pipeline.py::test_pairwise_f1_on_gold asserts the
    # ≥0.99 gate; this records the actual number every round)
    from pyspark.sql import functions as F

    from spikex_spark import synth
    from spikex_spark.pipeline import scored_pairs

    pages = spark.createDataFrame(synth.gen_pages(500))
    titles = spark.createDataFrame(synth.gen_titles())
    gold = spark.createDataFrame(synth.gen_labeled_pairs(500))
    sp = scored_pairs(pages, titles).selectExpr(
        "id_a as url_a", "id_b as url_b", "is_match as pred")
    j = gold.join(sp, ["url_a", "url_b"], "left").select(
        "is_match", "is_hard", F.coalesce("pred", F.lit(False)).alias("pred"))
    agg = j.agg(
        F.sum(F.when(F.col("is_match") & F.col("pred"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("is_match") & F.col("pred"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("is_match") & ~F.col("pred"), 1).otherwise(0)).alias("fn"),
        # adversarial near-misses (synth._HARD_ENTITIES): prefix-equal JW
        # traps and qualifier collisions scoring near the 0.75 threshold —
        # evidence the F1 isn't saturated by construction
        F.sum(F.when(F.col("is_hard") & ~F.col("is_match") & ~F.col("pred"),
                     1).otherwise(0)).alias("hard_neg_rejected"),
        F.sum(F.when(F.col("is_hard") & ~F.col("is_match"),
                     1).otherwise(0)).alias("hard_neg_total"),
        F.sum(F.when(F.col("is_hard") & F.col("is_match") & F.col("pred"),
                     1).otherwise(0)).alias("hard_pos_matched"),
        F.sum(F.when(F.col("is_hard") & F.col("is_match"),
                     1).otherwise(0)).alias("hard_pos_total"),
    ).collect()[0]
    precision = agg.tp / (agg.tp + agg.fp) if agg.tp + agg.fp else 1.0
    recall = agg.tp / (agg.tp + agg.fn) if agg.tp + agg.fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0

    result = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "cpus": int(cpus),
        "reps": reps,
        "load_1m": round(os.getloadavg()[0], 2),
        "er_pages_per_sec": round(n_docs / er_secs, 2) if er_secs else None,
        "n_docs": n_docs,
        "gold_pair_f1": round(f1, 6),
        "gold_pair_precision": round(precision, 6),
        "gold_pair_recall": round(recall, 6),
        "gold_pairs": int(agg.tp + agg.fn),
        "hard_neg_rejected": int(agg.hard_neg_rejected),
        "hard_neg_total": int(agg.hard_neg_total),
        "hard_pos_matched": int(agg.hard_pos_matched),
        "hard_pos_total": int(agg.hard_pos_total),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
