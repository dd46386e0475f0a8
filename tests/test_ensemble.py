from __future__ import annotations

import pytest

from spikex_spark.operators.ensemble import consensus_clusters, pair_votes

PAIRS = [(1, 2), (2, 3), (3, 4), (5, 6)]
# method A merges everything 1-4; B splits {1,2} {3,4}; C agrees with B
LAB_A = [(1, 1), (2, 1), (3, 1), (4, 1), (5, 5), (6, 5)]
LAB_B = [(1, 1), (2, 1), (3, 3), (4, 3), (5, 5), (6, 6)]
LAB_C = [(1, 1), (2, 1), (3, 3), (4, 3), (5, 5), (6, 5)]
IDS = [1, 2, 3, 4, 5, 6, 7]


def _dfs(spark):
    p = spark.createDataFrame(PAIRS, "id_a long, id_b long")
    labs = [spark.createDataFrame(l, "id long, cluster_id long")
            for l in (LAB_A, LAB_B, LAB_C)]
    ids = spark.createDataFrame([(i,) for i in IDS], "id long")
    return p, labs, ids


def test_pair_votes(spark):
    p, labs, _ = _dfs(spark)
    got = {(r["id_a"], r["id_b"]): r["votes"]
           for r in pair_votes(p, labs).collect()}
    assert got == {
        (1, 2): 3,          # all methods agree
        (2, 3): 1,          # only the chain-merger links across
        (3, 4): 3,
        (5, 6): 2,          # A and C
    }


def test_consensus_majority_breaks_the_chain(spark):
    p, labs, ids = _dfs(spark)
    got = {r["id"]: r["cluster_id"]
           for r in consensus_clusters(p, labs, ids).collect()}
    assert len(got) == len(IDS)
    # the 2-3 bridge had only one vote: consensus splits what A welded
    assert got[1] == got[2] == 1
    assert got[3] == got[4] == 3
    assert got[1] != got[3]
    assert got[5] == got[6] == 5
    assert got[7] == 7  # untouched singleton


def test_unanimity_threshold(spark):
    p, labs, ids = _dfs(spark)
    got = {r["id"]: r["cluster_id"]
           for r in consensus_clusters(p, labs, ids,
                                       min_votes=3).collect()}
    assert got[5] == 5 and got[6] == 6  # 2 votes no longer suffice
    assert got[1] == got[2] and got[3] == got[4]
