"""End-to-end ER pipeline: the pairwise-F1 ≥ 0.99 gate on gold pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from spikex_spark import synth
from spikex_spark.pipeline import resolve_entities, scored_pairs


def test_pairwise_f1_on_gold(spark, pages_df, titles_df):
    gold = spark.createDataFrame(synth.gen_labeled_pairs(120))
    sp = scored_pairs(pages_df, titles_df).selectExpr(
        "id_a as url_a", "id_b as url_b", "is_match as pred"
    )
    j = gold.join(sp, ["url_a", "url_b"], "left").select(
        "is_match", F.coalesce("pred", F.lit(False)).alias("pred")
    )
    agg = j.agg(
        F.sum(F.when(F.col("is_match") & F.col("pred"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("is_match") & F.col("pred"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("is_match") & ~F.col("pred"), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    precision = agg.tp / (agg.tp + agg.fp) if agg.tp + agg.fp else 1.0
    recall = agg.tp / (agg.tp + agg.fn) if agg.tp + agg.fn else 1.0
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, (precision, recall, f1)


def test_clusters_respect_gold_transitivity(spark, pages_df, titles_df):
    res = resolve_entities(pages_df, titles_df).collect()
    cluster_of = {r["url"]: r["cluster_id"] for r in res}
    for pair in synth.gen_labeled_pairs(120):
        same = cluster_of[pair["url_a"]] == cluster_of[pair["url_b"]]
        assert same == pair["is_match"], pair


def test_every_page_assigned(spark, pages_df, titles_df):
    res = resolve_entities(pages_df, titles_df)
    assert res.count() == pages_df.count()
    assert res.where(F.col("cluster_id").isNull()).count() == 0
