"""As-of (point-in-time) join — the time-series primitive Spark lacks.

For every left row, attach the most recent right row with the same key
whose timestamp is ``<=`` the left timestamp (optionally bounded by a
tolerance). The classic uses: price-at-trade-time, last-click before an
error, feature-freshness joins in training pipelines.

Spark has no native ASOF JOIN (pandas-on-Spark's ``merge_asof`` exists
but routes through a range join). The naive relational form —
``l JOIN r ON key AND r.ts <= l.ts`` then keep the max — materializes
O(|matches|) intermediate rows per left row and explodes on hot keys.
This implementation is the **merge-sorted union** instead:

1. union both sides, tagging right rows with a payload struct;
2. ONE shuffle on the key + ONE sort on (ts, side, tie) per partition;
3. ``last(payload, ignorenulls)`` over the running window carries the
   latest right payload forward — each left row reads its answer from
   the carried column.

Cost: one shuffle of |L|+|R| rows and a per-key sort — the same shape
as a window aggregate, independent of match multiplicity. Right rows at
exactly the left timestamp ARE visible (``<=`` semantics; right sorts
before left on ties); among right ties on (key, ts) the largest
``right_tie`` column wins, so results are total-order deterministic.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _check_reserved(left: DataFrame) -> None:
    clash = [c for c in left.columns if c.startswith("__")]
    if clash:
        raise ValueError(
            f"left columns {clash} collide with the join's internal "
            "__-prefixed working columns; rename them first")


def _tagged_union(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    right_tie: Optional[str],
    bucket: Optional[str] = None,
) -> DataFrame:
    """The shared merge-sorted-union input: right rows carry a payload
    struct, left rows carry their own columns; optional (key, bucket)
    co-partitioning column for the hot-key-safe variant. BOTH as-of
    variants build on this — one definition of payload/tie/side."""
    _check_reserved(left)
    payload = F.struct(
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    tie = F.col(right_tie) if right_tie else F.lit(0)
    bkt_r = ([F.date_trunc(bucket, F.col(right_ts)).alias("__bkt")]
             if bucket else [])
    bkt_l = ([F.date_trunc(bucket, F.col(left_ts)).alias("__bkt")]
             if bucket else [])
    r = right.select(
        F.col(key).alias("__key"),
        F.col(right_ts).alias("__t"),
        *bkt_r,
        F.lit(0).alias("__side"),
        tie.cast("long").alias("__tie"),
        payload.alias("__payload"),
        *[F.lit(None).cast(f.dataType).alias(f.name)
          for f in left.schema.fields],
    )
    l = left.select(  # noqa: E741
        F.col(key).alias("__key"),
        F.col(left_ts).alias("__t"),
        *bkt_l,
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tie"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(f.name) for f in left.schema.fields],
    )
    return r.unionByName(l)


def _finish(out: DataFrame, left: DataFrame, right_cols: Sequence[str],
            tolerance_us: Optional[int], prefix: str) -> DataFrame:
    """Shared tail: tolerance null-out + output projection."""
    def _gap() -> F.Column:  # works for TIMESTAMP and TIMESTAMP_NTZ alike
        return F.timestamp_diff(
            "MICROSECOND", F.col("__carried.__ts"), F.col("__t"))

    gap = _gap()
    if tolerance_us is not None:
        out = out.withColumn(
            "__carried",
            F.when(gap <= F.lit(tolerance_us), F.col("__carried")),
        )
        gap = _gap()
    cols = [F.col(f.name) for f in left.schema.fields]
    cols += [F.col(f"__carried.{c}").alias(f"{prefix}{c}")
             for c in right_cols]
    cols.append(gap.alias(f"{prefix}gap_us"))
    return out.select(*cols)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    right_tie: Optional[str] = None,
    tolerance_us: Optional[int] = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: left rows + latest right payload at or before
    the left timestamp.

    Output = all ``left`` columns, then for each ``c`` in ``right_cols``
    a ``{prefix}{c}`` column (null when no right row precedes), plus
    ``{prefix}gap_us`` (microseconds since the matched right row).

    ``right_tie``: column that breaks right-side timestamp ties (largest
    wins); required for determinism when (key, ts) is not unique on the
    right. ``tolerance_us``: matches older than this are nulled out.
    """
    merged = _tagged_union(left, right, key, left_ts, right_ts,
                           right_cols, right_tie)
    w = (
        Window.partitionBy("__key")
        .orderBy("__t", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last("__payload", ignorenulls=True).over(w)
    out = (merged.withColumn("__carried", carried)
           .where(F.col("__side") == 1))
    return _finish(out, left, right_cols, tolerance_us, prefix)


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    right_tie: Optional[str] = None,
    tolerance_us: Optional[int] = None,
    bucket: str = "day",
    prefix: str = "asof_",
) -> DataFrame:
    """Hot-key-safe as-of join: identical semantics to :func:`asof_join`
    (every left row survives — NULL keys/timestamps included — and the
    same tolerance contract), different shuffle geometry.

    ``asof_join`` sorts each key's FULL history in one task — correct,
    but a single hot key (one user / one instrument with 10^8 events)
    concentrates in one partition. This variant shuffles on
    ``(key, date_trunc(bucket, ts))`` so per-task data is bounded by one
    key-bucket, then repairs bucket boundaries with a per-bucket summary
    table (one row per non-empty (key, bucket): the bucket's LAST right
    payload) that is itself windowed per key — rows proportional to
    buckets, not events. A left row's answer is its within-bucket carry,
    else the latest prior bucket's summary: ``coalesce(local, prev)``,
    exact because the local carry already dominates anything earlier
    whenever it exists. The summary join is NULL-SAFE, matching the
    window semantics of the plain variant (window partitioning groups
    NULL keys together; a plain equality join would drop those rows).

    Costs one extra small shuffle (the summary table) in exchange for
    bounded partitions; pick ``bucket`` so a key-bucket fits a task.
    """
    merged = _tagged_union(left, right, key, left_ts, right_ts,
                           right_cols, right_tie, bucket=bucket)
    # local pass: per (key, bucket) — the bounded partitions
    w_local = (
        Window.partitionBy("__key", "__bkt")
        .orderBy("__t", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = merged.withColumn(
        "__local", F.last("__payload", ignorenulls=True).over(w_local))
    # summary pass: one row per (key, bucket) = the bucket's last right
    # payload; carried across buckets per key (rows ∝ buckets, not events)
    bucket_last = (
        merged.where(F.col("__side") == 0)
        .groupBy("__key", "__bkt")
        .agg(F.max_by(
            "__payload",
            F.struct(F.col("__t"), F.col("__tie"))).alias("__blast"))
    )
    all_buckets = merged.select("__key", "__bkt").distinct()
    w_bkts = (Window.partitionBy("__key").orderBy("__bkt")
              .rowsBetween(Window.unboundedPreceding, -1))
    prev = (all_buckets.join(bucket_last, ["__key", "__bkt"], "left")
            .withColumn("__prev",
                        F.last("__blast", ignorenulls=True).over(w_bkts))
            .select(F.col("__key").alias("__pkey"),
                    F.col("__bkt").alias("__pbkt"), "__prev"))
    lhs = local.where(F.col("__side") == 1)
    cond = (lhs["__key"].eqNullSafe(prev["__pkey"])
            & lhs["__bkt"].eqNullSafe(prev["__pbkt"]))
    out = (lhs.join(prev, cond, "left")
           .withColumn("__carried",
                       F.coalesce(F.col("__local"), F.col("__prev"))))
    return _finish(out, left, right_cols, tolerance_us, prefix)
