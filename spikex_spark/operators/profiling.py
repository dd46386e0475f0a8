"""One-pass column profiling: the Deequ/ingest-QC primitive.

Before a 100-TB corpus enters the ER pipeline you profile it: which
columns are complete, how many distinct values, what ranges — the
checks that catch a broken crawl shard (all-null lang, duplicated urls,
truncated text) before a week of compute runs on it. This is the core
of what AWS Deequ computes as a "column profile", expressed as ONE
Spark aggregate over the table (Catalyst plans the multi-distinct via
Expand — still a single pass over the input, map-side partial
everywhere) and exploded to one row per column.

Determinism contract: completeness is a single exact division of two
counts; the mean is emitted ONLY for integer-typed columns (an int64
sum is reduction-order-exact where a double sum is not) as one final
division; min/max are cast to strings AFTER aggregation (long→string
formatting is identical across engines; double formatting is not,
which is the second reason double means/ranges stay out of the exact
surface).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INT_TYPES = {"tinyint", "smallint", "int", "bigint", "long", "integer"}


def profile_columns(df: DataFrame,
                    columns: Sequence[str] | None = None) -> DataFrame:
    """One row per column: (column, n_rows, n_nonnull, completeness,
    n_distinct, min_value, max_value, mean) — n_distinct over non-null
    values, min/max as strings, mean only for integer columns (exact
    int64 sum / count), null otherwise."""
    cols = list(columns) if columns is not None else list(df.columns)
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"_nd_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"_mi_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"_ma_{c}"))
        if dtypes.get(c) in _INT_TYPES:
            aggs.append(F.sum(F.col(c)).alias(f"_s_{c}"))
    one = df.agg(*aggs)
    rows = []
    for c in cols:
        mean = (F.round(F.col(f"_s_{c}").cast("double")
                        / F.col(f"_nn_{c}"), 6)
                if dtypes.get(c) in _INT_TYPES
                else F.lit(None).cast("double"))
        rows.append(F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"_nn_{c}").alias("n_nonnull"),
            F.round(F.col(f"_nn_{c}") / F.col("_n"), 6)
             .alias("completeness"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            F.col(f"_mi_{c}").alias("min_value"),
            F.col(f"_ma_{c}").alias("max_value"),
            mean.alias("mean"),
        ))
    return (one.select(F.explode(F.array(*rows)).alias("r"))
            .select("r.*"))


def uniqueness_check(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """One row (n_rows, n_keys, n_dup_rows, unique): does ``key_cols``
    uniquely identify rows? The Deequ `isUnique` constraint — one
    map-side-combined groupBy, never a self-join. ``n_dup_rows`` counts
    rows in violation (all members of each duplicated key)."""
    per = (df.groupBy(*[F.col(c) for c in key_cols])
           .agg(F.count(F.lit(1)).alias("_c")))
    return per.agg(
        F.sum("_c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(F.lit(0)))
         .alias("n_dup_rows"),
        (F.max("_c") <= 1).alias("unique"),
    )


def key_skew(df: DataFrame, key_cols: Sequence[str], top_k: int = 20,
             target_rows: int = 1_000_000) -> DataFrame:
    """Heavy-hitter diagnosis for a prospective shuffle key: the top_k
    heaviest keys as (key, cnt, share, salt_factor, n_keys, total) —
    ``salt_factor = ceil(cnt / target_rows)`` is the split factor the
    repo's salting guards (blocking.cap_blocks, asof bucketing) would
    need to bound one task's rows at ``target_rows``. This is the
    measurement step the north rule's "skew handled explicitly" implies:
    profile BEFORE the join, salt what the profile names.

    One map-side-combined groupBy + a global top-k (TakeOrdered — no
    full sort); ceil is exact integer arithmetic; deterministic ties by
    key string."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    per = df.groupBy(key.alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    tot = per.agg(F.sum("cnt").alias("total"),
                  F.count(F.lit(1)).alias("n_keys"))
    t = int(target_rows)
    return (per.crossJoin(F.broadcast(tot))
            .select("key", "cnt",
                    F.round(F.col("cnt") / F.col("total"), 6).alias("share"),
                    # true int64 `div` — float-divide-then-cast would
                    # truncate, and the double is inexact for huge counts
                    F.expr(f"(cnt + {t} - 1) div {t}").alias("salt_factor"),
                    "n_keys", "total")
            .orderBy(F.col("cnt").desc(), F.col("key").asc())
            .limit(top_k))


def key_drift(prev: DataFrame, nxt: DataFrame, key_col: str = "key",
              k: int = 20) -> DataFrame:
    """Distribution drift between two runs of a keyed population — the
    crawl-over-crawl monitor that catches composition shifts (a new
    boilerplate family, a language mix change, a dead blocking channel)
    BEFORE they show up as ER quality regressions.

    Per key (top ``k`` by combined count, ties → key ascending):
    (key, c_prev, c_nxt, share_prev, share_nxt, share_delta). Counts
    are exact int64; shares are single rounded divisions of those
    counts, so the oracle reproduces every digit.

    Scale shape: two map-side-combined groupBys onto the KEY table, a
    full-outer equi-join of those (rows = distinct keys, not records),
    one broadcast totals row, and a global top-k (Spark TakeOrdered —
    never a one-partition window over records).
    """
    def counts(df: DataFrame, name: str) -> DataFrame:
        return (df.groupBy(F.col(key_col).alias("key"))
                .agg(F.count("*").alias(name)))

    cp, cn = counts(prev, "c_prev"), counts(nxt, "c_nxt")
    tot = (cp.agg(F.sum("c_prev").alias("n_prev"))
           .crossJoin(cn.agg(F.sum("c_nxt").alias("n_nxt"))))
    j = (cp.join(cn, "key", "full_outer")
         .fillna(0, ["c_prev", "c_nxt"])
         .crossJoin(F.broadcast(tot)))
    share_p = F.col("c_prev") / F.col("n_prev")
    share_n = F.col("c_nxt") / F.col("n_nxt")
    return (j.select(
        "key", "c_prev", "c_nxt",
        F.round(share_p, 6).alias("share_prev"),
        F.round(share_n, 6).alias("share_nxt"),
        F.round(share_n - share_p, 6).alias("share_delta"))
        .orderBy(F.desc(F.col("c_prev") + F.col("c_nxt")), F.asc("key"))
        .limit(k))


def schema_match(a: DataFrame, b: DataFrame,
                 cols_a: Sequence[str], cols_b: Sequence[str],
                 k: int = 256) -> DataFrame:
    """(col_a, col_b, theta_hash, n_common, n_union_sample, est_jaccard,
    rank) — instance-based schema matching: align the columns of two
    tables by the overlap of their VALUE sets, estimated from per-column
    KMV sketches (sketch.kmv_hashes / the theta-intersection recipe).

    The data-integration step BEFORE record linkage: when table B arrives
    with unknown headers (page_url? link? location?), the column whose
    values overlap A.url is A.url's counterpart, whatever it is named —
    the classic instance-level matcher (COMA++ / similarity-flooding
    family use exactly this signal).  ``rank`` orders candidates per
    ``col_a`` by (est_jaccard DESC, col_b) — rank 1 is the proposed
    alignment.

    Scale: each column is sketched independently (k longs per column —
    one narrow scan per table regardless of column count), and the
    |cols_a|x|cols_b| pair grid is tiny; nothing data-sized is ever
    joined.  Values are compared as trimmed strings; NULLs and empties
    carry no evidence and are dropped.
    """
    from .sketch import _SCALE, kmv_hashes

    def melt(df: DataFrame, cols: Sequence[str], out: str) -> DataFrame:
        parts = [
            df.select(F.lit(c).alias(out),
                      F.trim(F.col(c).cast("string")).alias("v"))
            for c in cols
        ]
        m = parts[0]
        for p in parts[1:]:
            m = m.unionByName(p)
        return (m.where(F.col("v").isNotNull() & (F.col("v") != ""))
                .withColumnRenamed(out, "grp"))

    ra = (kmv_hashes(melt(a, cols_a, "ca"), "grp", "v", k=k)
          .withColumnRenamed("grp", "ca"))
    rb = (kmv_hashes(melt(b, cols_b, "cb"), "grp", "v", k=k)
          .withColumnRenamed("grp", "cb"))

    def theta(rows: DataFrame, col: str, out: str) -> DataFrame:
        return rows.groupBy(col).agg(
            F.count("*").alias("_n"), F.max("h").alias("_mx")
        ).select(col, F.when(F.col("_n") < k, F.lit(_SCALE))
                 .otherwise(F.col("_mx")).alias(out))

    th = (theta(ra, "ca", "th_a").crossJoin(theta(rb, "cb", "th_b"))
          .select("ca", "cb",
                  F.least("th_a", "th_b").alias("theta_hash")))
    ca_list = th.select("ca", "cb").distinct()
    ea = ra.join(ca_list, "ca").select("ca", "cb", "h")
    eb = rb.join(ca_list, "cb").select("ca", "cb", "h")
    uni = (ea.unionByName(eb).distinct().join(th, ["ca", "cb"])
           .where(F.col("h") < F.col("theta_hash"))
           .groupBy("ca", "cb", "theta_hash")
           .agg(F.count("*").alias("n_union_sample")))
    common = (ra.join(rb, "h").join(th, ["ca", "cb"])
              .where(F.col("h") < F.col("theta_hash"))
              .groupBy("ca", "cb")
              .agg(F.count("*").alias("n_common")))
    est_j = F.when(
        F.col("n_union_sample") > 0,
        F.round(F.col("n_common").cast("double")
                / F.col("n_union_sample").cast("double"), 6),
    ).otherwise(F.lit(0.0))
    from pyspark.sql import Window as W
    scored = (uni.join(common, ["ca", "cb"], "left")
              .na.fill({"n_common": 0})
              .withColumn("est_jaccard", est_j))
    return scored.select(
        F.col("ca").alias("col_a"), F.col("cb").alias("col_b"),
        "theta_hash",
        F.col("n_common").cast("long").alias("n_common"),
        F.col("n_union_sample").cast("long").alias("n_union_sample"),
        "est_jaccard",
    ).withColumn("rank", F.row_number().over(
        W.partitionBy("col_a").orderBy(F.col("est_jaccard").desc(),
                                       F.col("col_b").asc())))


def keyness_g2(a: DataFrame, b: DataFrame, key_col: str = "key",
               top_k: int = 50) -> DataFrame:
    """(key, o1, o2, lr1_e7, lr2_e7, g2_e7, direction) — Dunning (1993)
    log-likelihood keyness between two keyed populations, ranked by G².

    key_drift reports share deltas; G² adds SIGNIFICANCE: a key that
    moved 0.1% on a million observations outranks one that moved 5% on
    twenty.  The standard corpus-comparison statistic ("what changed in
    this crawl", "what characterizes slice X") with the engine's numeric
    discipline: per-key log-ratios ``ln(o/e)`` snap to e7 int64 (e is
    the expected count under the pooled model), ``g2_e7 = 2·(o1·lr1 +
    o2·lr2)`` is exact integer arithmetic, and direction comes from an
    exact decimal cross-multiplication — no float ever decides a
    comparison.  Zero-count sides contribute zero terms (the G²
    convention).

    Scale: two map-side-combined groupBys, a full-outer join on the key
    table, one broadcast totals row, distributed top-k.
    """
    def counts(df: DataFrame, name: str) -> DataFrame:
        return (df.groupBy(F.col(key_col).alias("key"))
                .agg(F.count("*").alias(name)))

    ca, cb = counts(a, "o1"), counts(b, "o2")
    tot = (ca.agg(F.sum("o1").alias("n1"))
           .crossJoin(cb.agg(F.sum("o2").alias("n2"))))
    j = (ca.join(cb, "key", "full_outer")
         .fillna(0, ["o1", "o2"])
         .crossJoin(F.broadcast(tot)))
    d = lambda c: F.col(c).cast("double")
    both = d("o1") + d("o2")
    nt = d("n1") + d("n2")
    # ln(o/e) with e = n_side * (o1+o2) / (n1+n2); same operation order
    # in the DuckDB mirror so the doubles agree bit-for-bit
    lr = lambda o, n: F.round(
        F.log((d(o) * nt) / (d(n) * both)) * F.lit(1e7), 0).cast("long")
    lr1 = F.when(F.col("o1") > 0, lr("o1", "n1")).otherwise(F.lit(0))
    lr2 = F.when(F.col("o2") > 0, lr("o2", "n2")).otherwise(F.lit(0))
    dec = "decimal(38,0)"
    direction = F.when(
        F.col("o1").cast(dec) * F.col("n2").cast(dec)
        > F.col("o2").cast(dec) * F.col("n1").cast(dec), F.lit("over")
    ).when(
        F.col("o1").cast(dec) * F.col("n2").cast(dec)
        < F.col("o2").cast(dec) * F.col("n1").cast(dec), F.lit("under")
    ).otherwise(F.lit("even"))
    scored = j.select(
        "key", F.col("o1").cast("long").alias("o1"),
        F.col("o2").cast("long").alias("o2"),
        lr1.alias("lr1_e7"), lr2.alias("lr2_e7"),
        direction.alias("direction"),
    ).withColumn(
        "g2_e7",
        (F.lit(2) * (F.col("o1") * F.col("lr1_e7")
                     + F.col("o2") * F.col("lr2_e7"))).cast("long"),
    )
    return (scored.orderBy(F.col("g2_e7").desc(), F.col("key").asc())
            .limit(top_k)
            .select("key", "o1", "o2", "lr1_e7", "lr2_e7", "g2_e7",
                    "direction"))
