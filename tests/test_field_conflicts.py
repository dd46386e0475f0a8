"""field_conflicts: per-field disagreement inside ER clusters."""
from __future__ import annotations

import pytest


def _run(spark, clusters, records):
    from spikex_spark.operators.survivorship import field_conflicts

    c = spark.createDataFrame(clusters, "doc_id bigint, cluster_id bigint")
    r = spark.createDataFrame(records,
                              "doc_id bigint, lang string, source string")
    out = field_conflicts(c, r, ["lang", "source"]).collect()
    return {row["field"]: row for row in out}


def test_conflict_counts_and_majority(spark):
    clusters = [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)]
    records = [
        (1, "en", "a"), (2, "en", "b"), (3, "de", "b"),  # cluster 1
        (4, "fr", "c"), (5, "fr", "c"),                  # cluster 4: clean
        (6, "it", "d"),                                  # singleton: ignored
    ]
    got = _run(spark, clusters, records)
    lang = got["lang"]
    # two multi-member clusters; cluster 1 conflicts on lang (en/en/de)
    assert lang["n_multi_clusters"] == 2
    assert lang["n_conflicted"] == 1
    assert lang["conflict_rate"] == pytest.approx(0.5)
    # modal agreement: cluster1 2/3 agree, cluster4 2/2 -> 4/5
    assert lang["majority_agreement"] == pytest.approx(0.8)
    src = got["source"]
    assert src["n_conflicted"] == 1           # cluster 1: a/b/b
    assert src["majority_agreement"] == pytest.approx(0.8)


def test_unanimous_everywhere(spark):
    clusters = [(1, 1), (2, 1)]
    records = [(1, "en", "x"), (2, "en", "x")]
    got = _run(spark, clusters, records)
    for f in ("lang", "source"):
        assert got[f]["n_conflicted"] == 0
        assert got[f]["conflict_rate"] == 0.0
        assert got[f]["majority_agreement"] == 1.0


def test_all_singletons_yield_no_rows(spark):
    clusters = [(1, 1), (2, 2)]
    records = [(1, "en", "x"), (2, "de", "y")]
    from spikex_spark.operators.survivorship import field_conflicts

    c = spark.createDataFrame(clusters, "doc_id bigint, cluster_id bigint")
    r = spark.createDataFrame(records,
                              "doc_id bigint, lang string, source string")
    assert field_conflicts(c, r, ["lang"]).count() == 0


def _medoids(spark, clusters, matched):
    from spikex_spark.operators.survivorship import cluster_medoids

    c = spark.createDataFrame(clusters, "doc_id bigint, cluster_id bigint")
    m = spark.createDataFrame(matched,
                              "id_a bigint, id_b bigint, score double")
    return {r["cluster_id"]: r
            for r in cluster_medoids(c, m).collect()}


def test_medoid_is_best_connected_member(spark):
    clusters = [(1, 1), (2, 1), (3, 1), (9, 9)]
    # 2 is connected to both 1 and 3; 1 and 3 only to 2
    matched = [(1, 2, 0.9), (2, 3, 0.8)]
    got = _medoids(spark, clusters, matched)
    assert got[1]["medoid_id"] == 2
    assert got[1]["score_sum_scaled"] == 17000  # 0.9+0.8 scaled by 1e4
    # singleton cluster: its only member, sum 0
    assert got[9]["medoid_id"] == 9 and got[9]["score_sum_scaled"] == 0


def test_medoid_tie_breaks_to_smallest_id(spark):
    clusters = [(1, 1), (2, 1)]
    matched = [(1, 2, 0.9)]
    got = _medoids(spark, clusters, matched)
    assert got[1]["medoid_id"] == 1  # both sum 9000


def test_medoid_ignores_cross_cluster_edges(spark):
    clusters = [(1, 1), (2, 1), (3, 3), (4, 3)]
    matched = [(1, 2, 0.8), (3, 4, 0.9), (2, 3, 0.99)]  # bridge ignored
    got = _medoids(spark, clusters, matched)
    assert got[1]["score_sum_scaled"] == 8000
    assert got[3]["score_sum_scaled"] == 9000
