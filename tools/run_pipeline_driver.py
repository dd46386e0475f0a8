"""spark-submit entry for the engine's flagship pipelines.

    spark-submit --py-files spikex_spark.zip run_pipeline.py <cmd> ...

Subcommands (over a documents parquet with doc_id/text[/lang] columns):

  er <docs> <out> [threshold]   near-dup ER: (doc_id, cluster_id)
  dedup <docs> <out>            keep-list: (doc_id, keep_exact, keep_near)
  curate <docs> <out> [block]   quality+language+exact+near gates, then
                                LM sequence packing of the survivors
  stats <docs> <out>            per-doc quality/language/Gopher table

Legacy positional form "<src> <dst> [threshold]" still runs `er`.
Each stage is a pure DataFrame transform from spikex_spark.operators —
this driver only composes and writes.

(This file is the SOURCE OF TRUTH, copied verbatim to
``dist/run_pipeline.py`` by ``tools/package.py`` — edit it here.)
"""
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run_er(spark, src, dst, threshold=0.80):
    from spikex_spark.pipeline import resolve_documents
    docs = spark.read.parquet(src)
    resolve_documents(docs, threshold=threshold)\
        .write.mode("overwrite").parquet(dst)


def run_dedup(spark, src, dst):
    from spikex_spark.operators.dedup import exact_duplicates
    from spikex_spark.pipeline import resolve_documents
    docs = spark.read.parquet(src)
    ex = exact_duplicates(docs, "doc_id", "text").select(
        F.col("id").alias("doc_id"),
        (F.col("id") == F.col("canonical_id")).alias("keep_exact"))
    near = resolve_documents(docs, threshold=0.80).select(
        "doc_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("keep_near"))
    ex.join(near, "doc_id").write.mode("overwrite").parquet(dst)


def run_curate(spark, src, dst, block_tokens=None,
               min_quality=None, min_tokens=None, lang=None):
    from spikex_spark.operators.corpus import pack_sequences
    from spikex_spark.operators.dedup import exact_duplicates
    from spikex_spark.operators.textstats import language_id, quality_score
    from spikex_spark.pipeline import (CURATION_BLOCK, CURATION_LANG,
                                       CURATION_MIN_QUALITY,
                                       CURATION_MIN_TOKENS,
                                       resolve_documents)
    # defaults come from the engine's shared curation constants so the
    # deployable and the gated batch/stream funnels always agree
    block_tokens = CURATION_BLOCK if block_tokens is None else block_tokens
    min_quality = CURATION_MIN_QUALITY if min_quality is None else min_quality
    min_tokens = CURATION_MIN_TOKENS if min_tokens is None else min_tokens
    lang = CURATION_LANG if lang is None else lang
    docs = spark.read.parquet(src)
    q = quality_score(docs, "doc_id", "text")
    keep = q.where((F.col("quality") >= min_quality)
                   & (F.col("n_tokens") >= min_tokens)).select("id")
    lg = language_id(docs, "doc_id", "text")
    keep = keep.join(lg.where(F.col("lang_guess") == lang)
                     .select("id"), "id")
    ex = exact_duplicates(docs, "doc_id", "text")
    keep = keep.join(ex.where(F.col("id") == F.col("canonical_id"))
                     .select("id"), "id")
    near = resolve_documents(docs, threshold=0.80)
    keep = keep.join(near.where(F.col("doc_id") == F.col("cluster_id"))
                     .withColumnRenamed("doc_id", "id").select("id"), "id")
    kept = docs.join(keep.withColumnRenamed("id", "doc_id"), "doc_id")
    pack_sequences(kept, "doc_id", "text", block_tokens=block_tokens)\
        .write.mode("overwrite").parquet(dst)


def run_stats(spark, src, dst):
    from spikex_spark.operators.textstats import (gopher_rules, language_id,
                                                  quality_score)
    docs = spark.read.parquet(src)
    out = (quality_score(docs, "doc_id", "text")
           .join(language_id(docs, "doc_id", "text"), "id")
           .join(gopher_rules(docs, "doc_id", "text")
                 .select("id", "passed"), "id"))
    out.write.mode("overwrite").parquet(dst)


def _usage(msg: str):
    sys.stderr.write(f"error: {msg}\n\n{__doc__}")
    raise SystemExit(2)


def main() -> None:
    args = list(sys.argv[1:])
    cmds = {"er": run_er, "dedup": run_dedup,
            "curate": run_curate, "stats": run_stats}
    # (max positional args beyond <src> <dst>, coercion for the third)
    arity = {"er": (1, float), "curate": (1, int),
             "dedup": (0, None), "stats": (0, None)}
    if args and args[0] in cmds:
        cmd, args = args[0], args[1:]
    else:
        cmd = "er"  # legacy positional form
    if len(args) < 2:
        _usage(f"{cmd}: expected <src> <dst>")
    n_extra, coerce = arity[cmd]
    if len(args) > 2 + n_extra:
        _usage(f"{cmd}: unexpected argument(s) {args[2 + n_extra:]!r}")
    extra = []
    if len(args) > 2:
        try:
            extra = [coerce(args[2])]
        except ValueError:
            _usage(f"{cmd}: bad value {args[2]!r}")
    spark = SparkSession.builder.appName(
        "spikex_spark_" + cmd).getOrCreate()
    cmds[cmd](spark, args[0], args[1], *extra)
    spark.stop()


if __name__ == "__main__":
    main()
