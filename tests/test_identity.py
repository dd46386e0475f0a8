"""stable_entity_ids: persistent entity ids across ER re-runs."""
from __future__ import annotations

import pytest


def _ids(spark, prev_rows, nxt_rows):
    from spikex_spark.operators.identity import stable_entity_ids

    prev = spark.createDataFrame(prev_rows, "id bigint, cluster_id bigint")
    nxt = spark.createDataFrame(nxt_rows, "id bigint, cluster_id bigint")
    out = stable_entity_ids(prev, nxt).collect()
    return {r["id"]: r["entity_id"] for r in out}


def test_unchanged_clusters_inherit(spark):
    prev = [(1, 1), (2, 1), (3, 1), (5, 5)]
    got = _ids(spark, prev, prev)
    assert got == {1: "p:1", 2: "p:1", 3: "p:1", 5: "p:5"}


def test_split_largest_claimant_inherits(spark):
    prev = [(1, 1), (2, 1), (3, 1), (4, 1)]
    nxt = [(1, 1), (2, 1), (3, 1), (4, 4)]
    got = _ids(spark, prev, nxt)
    assert got[1] == got[2] == got[3] == "p:1"
    # the split loser mints a fresh id from its smallest member
    assert got[4] == "n:4"


def test_merge_claims_biggest_overlap(spark):
    prev = [(1, 1), (2, 1), (5, 5), (6, 5), (7, 5)]
    nxt = [(i, 1) for i in (1, 2, 5, 6, 7)]
    got = _ids(spark, prev, nxt)
    # merged cluster overlaps prev c5 by 3 vs prev c1 by 2 -> inherits c5
    assert set(got.values()) == {"p:5"}


def test_fresh_records_mint_min_member(spark):
    prev = [(1, 1), (2, 1)]
    nxt = [(1, 1), (2, 1), (9, 8), (8, 8)]
    got = _ids(spark, prev, nxt)
    assert got[1] == got[2] == "p:1"
    assert got[8] == got[9] == "n:8"


def test_overlap_tie_breaks_to_smallest_prev(spark):
    # nxt cluster overlaps prev c1 and c3 by 2 records each
    prev = [(1, 1), (2, 1), (3, 3), (4, 3)]
    nxt = [(1, 1), (2, 1), (3, 1), (4, 1)]
    got = _ids(spark, prev, nxt)
    assert set(got.values()) == {"p:1"}


def test_award_tie_breaks_to_smallest_next(spark):
    # two nxt clusters each overlap prev c1 by 1: smaller nc wins the id
    prev = [(1, 1), (2, 1)]
    nxt = [(1, 1), (2, 2)]
    got = _ids(spark, prev, nxt)
    assert got[1] == "p:1"
    assert got[2] == "n:2"


def test_entity_ids_are_unique_per_cluster(spark):
    import random

    rng = random.Random(7)
    prev = [(i, i - i % 3) for i in range(60)]
    nxt = [(i, i - i % rng.choice((2, 4, 5))) for i in range(80)]
    from spikex_spark.operators.identity import stable_entity_ids

    p = spark.createDataFrame(prev, "id bigint, cluster_id bigint")
    n = spark.createDataFrame(nxt, "id bigint, cluster_id bigint")
    out = stable_entity_ids(p, n)
    # one entity id per nxt cluster, and no two clusters share one
    pairs = (out.join(n.withColumnRenamed("cluster_id", "nc"), "id")
                .select("nc", "entity_id").distinct().collect())
    ncs = [r["nc"] for r in pairs]
    eids = [r["entity_id"] for r in pairs]
    assert len(ncs) == len(set(ncs)) == len(set(eids))


def test_every_next_record_gets_an_id(spark):
    prev = [(1, 1)]
    nxt = [(i, i % 4) for i in range(20)]
    got = _ids(spark, prev, nxt)
    assert len(got) == 20


def test_run_diff_summary(spark):
    from spikex_spark.operators.identity import run_diff

    prev = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3), (5, 5), (6, 6), (7, 7)],
        "id bigint, cluster_id bigint")
    # cluster 1 unchanged; 3 splits into {3} and {4}; 5 & 6 merge;
    # 7 departed; 8 is new
    nxt = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 4), (5, 5), (6, 5), (8, 8)],
        "id bigint, cluster_id bigint")
    row = run_diff(prev, nxt).collect()[0]
    assert row["prev_clusters"] == 5 and row["next_clusters"] == 5
    assert row["identical"] == 1          # {1,2}
    assert row["split_prev"] == 1         # prev 3
    assert row["merged_next"] == 1        # nxt 5
    assert row["new_records"] == 1        # id 8
    assert row["departed_records"] == 1   # id 7


def test_run_diff_identical_runs(spark):
    from spikex_spark.operators.identity import run_diff

    a = spark.createDataFrame([(i, i - i % 2) for i in range(10)],
                              "id bigint, cluster_id bigint")
    row = run_diff(a, a).collect()[0]
    assert row["identical"] == row["prev_clusters"] == row["next_clusters"]
    assert row["split_prev"] == row["merged_next"] == 0
    assert row["new_records"] == row["departed_records"] == 0
