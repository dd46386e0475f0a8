"""Ball clustering (ClusterX recast) — reference test shapes.

Reference expects gray/black vs dog/cat to split into 2 clusters
(tests/pipes/test_clusters.py:6-19). We use synthetic separable vectors in
place of spaCy embeddings (same geometry: two tight groups).
"""

from __future__ import annotations

import numpy as np
import pytest

from spikex_spark.pipes.clusters import (
    BallModel,
    cluster_balls,
    cluster_keys,
    cluster_stage,
)

# two tight groups, clearly separated
KEYS = ["gray", "black", "dog", "cat"]
VECS = np.array([
    [1.0, 0.9, 0.0, 0.1],
    [0.9, 1.0, 0.1, 0.0],
    [0.0, 0.1, 1.0, 0.9],
    [0.1, 0.0, 0.9, 1.0],
])


def test_cluster_two_groups():
    clusters = sorted(cluster_keys(KEYS, VECS, min_score=0.65), key=sorted)
    assert len(clusters) == 2
    assert sorted(map(tuple, clusters)) == [("black", "gray"), ("cat", "dog")]


def test_cluster_balls_with_root():
    model = BallModel(KEYS, VECS)
    balls = cluster_balls(model, "gray", min_score=0.65)
    assert {"gray", "black"} in balls


def test_default_threshold_path():
    model = BallModel(KEYS, VECS)
    balls = cluster_balls(model, "dog")   # min_score derived from neighbors
    assert balls and any("dog" in b for b in balls)


def test_intruder_eviction():
    keys = ["a", "b", "c", "x"]
    vecs = np.array([
        [1.0, 0.95, 0.9, 0.0],
        [0.95, 1.0, 0.9, 0.0],
        [0.9, 0.9, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ])
    model = BallModel(keys, vecs)
    assert model.doesnt_match(("a", "b", "x")) == "x"


def test_cluster_stage_spark(spark):
    rows = [("d1", k, [float(x) for x in v]) for k, v in zip(KEYS, VECS)]
    rows += [("d2", "solo", [0.5, 0.5, 0.5, 0.5])]
    df = spark.createDataFrame(rows, ["doc", "key", "vector"])
    got = {}
    for r in cluster_stage(df, "doc", min_score=0.65).collect():
        got.setdefault((r["group"], r["cluster_id"]), set()).add(r["key"])
    d1 = [v for (g, _), v in got.items() if g == "d1"]
    assert sorted(map(sorted, d1)) == [["black", "gray"], ["cat", "dog"]]


def test_ball_clusters_content_golden(spark):
    """Content-pinned golden for the driver's ball_clusters contract query
    (rows-only at the gate — this pins VALUES, not just counts): cluster
    assignments over the sf0.001 embeddings must be stable."""
    import hashlib

    import __spark_entry__ as E

    df = E.queries()["ball_clusters"](spark, "/root/testdata/sf0.001")
    rows = sorted(
        (r["label"], r["cluster_id"], r["key"]) for r in df.collect()
    )
    h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    # 500 corpus + 376 planted twins (125 identical + 125 negated + 63×2
    # triple twins) + 14 fixture rows
    assert len(rows) == 890
    # every key assigned exactly once per label group
    assert len({(lab, key) for lab, _, key in rows}) == len(rows)
    # corpus merge structure: identical twins join their root's ball,
    # negated twins stay singleton, u-twins complete 3-balls
    merged_t = [r for r in rows if r[2].startswith("t") and r[1] == r[2][1:]]
    merged_u = [r for r in rows if r[2].startswith("u") and r[1] == r[2][1:]]
    single_t = [r for r in rows if r[2].startswith("t") and r[1] == r[2]]
    assert (len(merged_t), len(merged_u), len(single_t)) == (188, 63, 125)
    assert h == "0e4dd1a83bda576e", h
