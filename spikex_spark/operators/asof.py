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
    payload_fields = [F.col(c).alias(c) for c in right_cols]
    payload = F.struct(
        F.col(right_ts).alias("__ts"),
        *payload_fields,
    )
    tie = F.col(right_tie) if right_tie else F.lit(0)
    r = right.select(
        F.col(key).alias("__key"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        tie.cast("long").alias("__tie"),
        payload.alias("__payload"),
        *[F.lit(None).cast(f.dataType).alias(f.name)
          for f in left.schema.fields],
    )
    l = left.select(  # noqa: E741
        F.col(key).alias("__key"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(0).cast("long").alias("__tie"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(f.name) for f in left.schema.fields],
    )
    w = (
        Window.partitionBy("__key")
        .orderBy("__t", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last("__payload", ignorenulls=True).over(w)
    merged = r.unionByName(l).withColumn("__carried", carried)
    out = merged.where(F.col("__side") == 1)

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
    cols += [F.col(f"__carried.{c}").alias(f"{prefix}{c}") for c in right_cols]
    cols.append(gap.alias(f"{prefix}gap_us"))
    return out.select(*cols)
