"""Radial-ball clustering over embedding keys (ClusterX recast).

Reference parity: spikex ``pipes/clusters.py`` (G4/J7/O5/A3/A4/A6) — the
"revisited Radial Ball Mapper": for each root key take its top-k cosine
neighbors; neighbors above a threshold join the root's ball; below-threshold
neighbors seed sub-balls with a stricter (+0.10) threshold, stealing members
from worse-scored balls; balls of ≥3 evict an "intruder" chosen by
leave-one-out vote; overlapping balls from multiple roots merge
transitively.

Semantics reproduced from the reference's observable behavior
(``pipes/clusters.py:72-212``, tests ``tests/pipes/test_clusters.py``):

* top-k = 30 by default; threshold default = min(best_neighbor_score,
  neighbor-mean − 0.10);
* ``doesnt_match`` = the member least cosine-similar to the mean of the
  queried members (gensim semantics); the intruder must win EVERY
  leave-one-out combination it appears in;
* multi-root merge: supersets absorb, subsets are dropped, overlaps union.

Spark form: per-GROUP ``applyInPandas`` — the reference unit is one doc's
noun chunks (tens of keys), so each group's ball run is a small dense
numpy problem; groups distribute on the group key. For corpus-level
clustering the ER pipeline's CC path is the scalable answer; this pipe
exists for reference-parity workloads.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np


def _cosine_matrix(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    return unit @ unit.T


class BallModel:
    """Dense in-memory key→vector index with gensim-like queries."""

    def __init__(self, keys: list[str], vectors: np.ndarray):
        self.keys = list(keys)
        self.index = {k: i for i, k in enumerate(self.keys)}
        self.sim = _cosine_matrix(np.asarray(vectors, dtype=np.float64))

    def most_similar(self, key: str, topn: int = 30) -> list[tuple[str, float]]:
        i = self.index[key]
        order = np.argsort(-self.sim[i])
        out = []
        for j in order:
            if j == i:
                continue
            out.append((self.keys[j], float(self.sim[i, j])))
            if len(out) >= topn:
                break
        return out

    def doesnt_match(self, keys: tuple[str, ...]) -> str:
        idx = [self.index[k] for k in keys]
        vecs = self.sim[idx][:, idx]
        # gensim: least similar to the mean vector; with a similarity matrix
        # the member with the lowest average similarity to the group
        avg = vecs.mean(axis=1)
        return keys[int(np.argmin(avg))]


def _neighbor_mean_score(model: BallModel, neighs: list[tuple[str, float]]) -> float:
    scores: list[float] = []
    for n, s in neighs:
        if not scores:
            scores.append(s)
        top = model.most_similar(n, topn=1)
        if top:
            scores.append(top[0][1])
    return sum(scores) / len(scores)


def _evict_intruder(model: BallModel, cluster: set[str]) -> str | None:
    votes: dict[str, int] = {}
    size = len(cluster) - 1
    for combo in combinations(sorted(cluster), size):
        intruder = model.doesnt_match(combo)
        votes[intruder] = votes.get(intruder, 0) + 1
        if votes[intruder] == size:
            return intruder
    return None


def cluster_balls(model: BallModel, root: str, max_size: int = 30,
                  min_score: float | None = None) -> list[set[str]]:
    """Balls grown from one root (reference ``cluster_balls`` semantics)."""
    if root not in model.index:
        return []
    neighs = model.most_similar(root, topn=max_size)
    if not neighs:
        return []
    if min_score is None:
        mean = _neighbor_mean_score(model, neighs)
        min_score = min(neighs[0][1], mean - 0.10)
    balls: list[set[str]] = []
    root_ball = {root}
    placed: dict[str, tuple[set, float]] = {root: (root_ball, 1.0)}
    for n, s in neighs:
        if n in placed:
            continue
        if s >= min_score:
            root_ball.add(n)
            placed.setdefault(n, (root_ball, s))
            continue
        sub = set()
        stricter = min_score + 0.10
        for nn, ss in model.most_similar(n, topn=max_size):
            if nn in placed:
                prev_ball, prev_score = placed[nn]
                if prev_ball is root_ball or prev_score >= ss:
                    continue
            if ss >= stricter:
                if nn in placed:
                    placed[nn][0].discard(nn)
                sub.add(nn)
                placed[nn] = (sub, ss)
        sub.add(n)
        placed.setdefault(n, (sub, 1.0))
        balls.append(sub)
        if len(sub) >= 3:
            intruder = _evict_intruder(model, sub)
            if intruder is not None:
                placed.pop(intruder, None)
                sub.discard(intruder)
    balls.insert(0, root_ball)
    return balls


def cluster_balls_multi(model: BallModel, keys: list[str],
                        max_size: int = 30,
                        min_score: float | None = None) -> list[set[str]]:
    """Run balls from every key and merge overlaps (reference multi-root)."""
    clusters: list[set[str]] = []
    for key in keys:
        for ball in cluster_balls(model, key, max_size=max_size,
                                  min_score=min_score):
            merged = False
            drop: set[int] = set()
            for i, cluster in enumerate(clusters):
                if ball == cluster or not (ball & cluster):
                    continue
                if ball.issuperset(cluster):
                    drop.add(i)
                    continue
                merged = True
                if ball.issubset(cluster):
                    continue
                union = ball | cluster
                if union not in clusters:
                    clusters[i] = union
            if not merged and ball not in clusters:
                clusters.append(ball)
            clusters = [c for i, c in enumerate(clusters) if i not in drop]
    return clusters


def cluster_keys(keys: list[str], vectors: list, max_size: int = 30,
                 min_score: float | None = None) -> list[list[str]]:
    """Convenience: cluster a key/vector list; returns sorted clusters."""
    model = BallModel(keys, np.asarray(vectors))
    clusters = cluster_balls_multi(model, list(keys), max_size, min_score)
    return [sorted(c) for c in clusters]


def cluster_stage(df, group_col: str, key_col: str = "key",
                  vec_col: str = "vector", min_score: float | None = None):
    """Spark stage: per-group ball clustering.

    Output: (group, cluster_id, key) — cluster_id = min key in the ball
    (deterministic). Groups distribute on the group key; each group's
    all-pairs cosine matrix is dense numpy inside the Arrow batch.
    """
    import pandas as pd

    out_schema = (
        f"group {df.schema[group_col].dataType.simpleString()},"
        " cluster_id string, key string"
    )

    def run(pdf: "pd.DataFrame") -> "pd.DataFrame":
        group = pdf[group_col].iloc[0]
        keys = pdf[key_col].tolist()
        vecs = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        rows = {"group": [], "cluster_id": [], "key": []}
        for cluster in cluster_keys(keys, vecs, min_score=min_score):
            cid = min(cluster)
            for k in cluster:
                rows["group"].append(group)
                rows["cluster_id"].append(cid)
                rows["key"].append(k)
        return pd.DataFrame(rows)

    return df.groupBy(group_col).applyInPandas(run, schema=out_schema)
