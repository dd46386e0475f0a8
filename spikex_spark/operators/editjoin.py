"""Exact edit-distance (Levenshtein) similarity self-join via PassJoin
segment filtering.

The last classic ER join primitive: token-set joins (PPJoin, cosine
AllPairs) miss typo-class dirt — transposed letters, dropped characters,
OCR noise — where the natural predicate is ``ed(a,b) ≤ k``. The naive
answer is an O(n²) cross join with a per-pair DP; PassJoin (Li, Deng,
Feng, VLDB'11) makes it a hash join: partition each string into ``k+1``
contiguous segments — at most ``k`` edits can touch at most ``k``
segments, so some segment survives UNTOUCHED and must occur verbatim in
the other string, shifted by at most ``k`` positions. Candidates come
only from (segment == positional-window-substring) equi-matches; each is
then verified with one exact bounded Levenshtein. Lossless by the
pigeonhole argument — the oracle runs the naive join and must agree.

Scale shape: two narrow generates (segments ×(k+1), windows
×(k+1)(2k+1) rows per string), one equi-shuffle on the
(length, segment_index, substring) key, exact verify on candidates only.
Skew note: segment keys inherit the entropy of the input — on templated
keys (serial numbers sharing a constant prefix) a segment can be
universal and candidates degrade toward the naive join, which is
fundamental for any lossless ed-join (the true result itself is then
near-quadratic); on natural text the segments are discriminative.

Everything is integer/string-exact end to end: positions, window bounds,
and the final distance (JVM ``levenshtein`` with early-exit threshold ==
DuckDB's full DP) — no float anywhere, nothing to round.

Edge case kept lossless: strings with ``len ≤ k`` may have ALL their
non-empty segments touched by edits (the untouched segment the theorem
pins down can be zero-length, which matches nothing). Those strings are
routed through a short-bucket path that pairs them with every string of
``len ≤ 2k`` — a constant-size population at any corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_join(df: DataFrame, id_col: str, key_col: str,
                       k: int = 2) -> DataFrame:
    """(id_a, id_b, dist): every unordered pair with
    ``levenshtein(key_a, key_b) ≤ k`` (and ``id_a < id_b``).
    """
    k1 = k + 1
    keys = df.select(F.col(id_col).alias("id"),
                     F.col(key_col).alias("key"),
                     F.length(key_col).alias("m"))

    idx = F.explode(F.sequence(F.lit(0), F.lit(k))).alias("i")

    def seg_start(l, i):
        # 1 + i*base + max(0, i - (k1 - rem)); integer arithmetic only
        base = F.floor(l / k1).cast("long")
        rem = l % k1
        return (F.lit(1) + i * base
                + F.greatest(F.lit(0), i - (F.lit(k1) - rem)))

    def seg_len(l, i):
        base = F.floor(l / k1).cast("long")
        rem = l % k1
        return base + F.when(i >= F.lit(k1) - rem, F.lit(1)).otherwise(
            F.lit(0))

    # --- segment side: each string partitioned by its OWN length -------
    segs = (keys.select("id", "key", F.col("m").alias("l"), idx)
            .withColumn("p", seg_start(F.col("l"), F.col("i")))
            .withColumn("n", seg_len(F.col("l"), F.col("i")))
            .where(F.col("n") > 0)
            .select("id", "l", "i",
                    F.expr("substring(key, p, n)").alias("sub")))

    # --- window side: substrings at segment positions of every target
    # length l in [m-k, m], shifted by at most k ------------------------
    lens = F.explode(F.sequence(
        F.greatest(F.lit(1), F.col("m") - F.lit(k)), F.col("m"))).alias("l")
    wins = (keys.select("id", "key", "m", lens)
            .select("id", "key", "m", "l", idx)
            .withColumn("p", seg_start(F.col("l"), F.col("i")))
            .withColumn("n", seg_len(F.col("l"), F.col("i")))
            .where(F.col("n") > 0))
    # window starts: [max(1, p-k), min(m-n+1, p+k)]; non-empty whenever
    # l <= m (lower ≤ p ≤ upper), so the sequence is total and ascending
    wins = (wins
            .withColumn("w", F.explode(F.sequence(
                F.greatest(F.lit(1), F.col("p") - F.lit(k)),
                F.least(F.col("m") - F.col("n") + 1,
                        F.col("p") + F.lit(k)))))
            .select("id", "l", "i",
                    F.expr("substring(key, w, n)").alias("sub")))

    cand = (segs.alias("a").join(wins.alias("b"), ["l", "i", "sub"])
            .where(F.col("a.id") != F.col("b.id"))
            .select(F.least("a.id", "b.id").alias("id_a"),
                    F.greatest("a.id", "b.id").alias("id_b"))
            .distinct())

    # --- short-bucket path: len ≤ k strings vs len ≤ 2k strings --------
    shorts = keys.where(F.col("m") <= k)
    near = keys.where(F.col("m") <= 2 * k)
    extra = (shorts.alias("a").join(
                 F.broadcast(near.alias("b")),
                 F.col("a.id") != F.col("b.id"))
             .select(F.least("a.id", "b.id").alias("id_a"),
                     F.greatest("a.id", "b.id").alias("id_b")))
    cand = cand.unionByName(extra).distinct()

    # --- exact verification -------------------------------------------
    ka = keys.select(F.col("id").alias("id_a"), F.col("key").alias("_ka"),
                     F.col("m").alias("_ma"))
    kb = keys.select(F.col("id").alias("id_b"), F.col("key").alias("_kb"),
                     F.col("m").alias("_mb"))
    out = (cand.join(ka, "id_a").join(kb, "id_b")
           .where(F.abs(F.col("_ma") - F.col("_mb")) <= k)
           .withColumn("dist",
                       F.levenshtein(F.col("_ka"), F.col("_kb"), k))
           .where(F.col("dist") >= 0))
    return out.select("id_a", "id_b", "dist")
