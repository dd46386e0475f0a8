"""Window-shaped span operators (SURVEY.md §2.5).

Reference parity:

* O1 sort labelings — ``pipes/labels.py:168-169``: spans by (start, -len).
* O2 longest-match overlap resolution — ``pipes/labels.py:114-165``
  (``_fix_overlabelings``): drop spans strictly contained in a longer
  overlapping span.
* O3 non-overlap greedy selection — ``pipes/phrases.py:27-38, 103-131``:
  keep spans that start at/after the running max end of kept spans.
* O4 leftmost-longest submatch filter — ``matcher/matcher.py:341-353``:
  among matches with the same end keep the earliest start.
* O5 top-k per key — ``pipes/clusters.py:110-111``.

All are pure window functions over a spans table
(doc, start, end [, label]) — partitioned per doc, no UDFs, one shuffle on
the doc key which downstream span ops reuse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sort_spans(spans: DataFrame, doc_col: str = "doc") -> DataFrame:
    """O1: stable span order (start asc, length desc) per doc."""
    w = Window.partitionBy(doc_col).orderBy(F.asc("start"), F.desc(F.col("end") - F.col("start")))
    return spans.withColumn("span_order", F.row_number().over(w))


def drop_contained(spans: DataFrame, doc_col: str = "doc",
                   tiebreakers: list[str] | None = None) -> DataFrame:
    """O2: remove spans strictly contained in an earlier-starting longer span.

    A span is contained iff some span with (start' <= start) has
    end' >= end and (start', end') != (start, end). Window: running max of
    end over all preceding rows in (start asc, end desc) order.

    ``tiebreakers``: extra ORDER BY columns making the window order TOTAL.
    Without them, (start, end)-duplicate rows keep exactly one survivor but
    WHICH row survives follows partition order — pass id columns whenever
    the output projects columns beyond (doc, start, end), or the result is
    partitioning-dependent.
    """
    w = (
        Window.partitionBy(doc_col)
        .orderBy(F.asc("start"), F.desc("end"),
                 *[F.asc(c) for c in (tiebreakers or [])])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        spans.withColumn("_prev_max_end", F.max("end").over(w))
        .where(F.col("_prev_max_end").isNull() | (F.col("end") > F.col("_prev_max_end")))
        .drop("_prev_max_end")
    )


def greedy_nonoverlap(spans: DataFrame, doc_col: str = "doc") -> DataFrame:
    """O3: greedy selection of non-overlapping spans, earliest-start first,
    longer span preferred on ties (reference ``pipes/phrases.py:27-38``:
    skip spans starting before the last KEPT end).

    The running end depends on which prior spans were KEPT — inherently a
    sequential scan, not a window function (a window's running max would
    count dropped spans' ends). Implemented as a per-doc ``applyInPandas``:
    docs are independent, so the scan distributes on the doc key; per-doc
    span counts are small (matcher output), so the Python loop is bounded.
    """
    import numpy as np

    out_schema = spans.schema

    def scan(pdf):
        # vectorized numpy scan over the sorted arrays (iterrows was
        # row-at-a-time pandas — fine for small docs, quadratic-constant
        # overhead once matcher output grows)
        pdf = pdf.sort_values(["start", "end"], ascending=[True, False])
        starts = pdf["start"].to_numpy()
        ends = pdf["end"].to_numpy()
        keep = np.zeros(len(pdf), dtype=bool)
        last_end = None
        for i in range(len(starts)):
            if last_end is None or starts[i] >= last_end:
                keep[i] = True
                last_end = ends[i]
        return pdf[keep]

    return spans.groupBy(doc_col).applyInPandas(scan, schema=out_schema)


def leftmost_longest(spans: DataFrame, doc_col: str = "doc") -> DataFrame:
    """O4: per (doc, end) keep the earliest start."""
    w = Window.partitionBy(doc_col, "end").orderBy(F.asc("start"))
    return (
        spans.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def top_k_per_key(df: DataFrame, key_col: str, order_col: str, k: int,
                  ascending: bool = False,
                  tiebreak_col: str | None = None) -> DataFrame:
    """O5: top-k rows per key (deterministic with a tiebreak column)."""
    order = [F.asc(order_col) if ascending else F.desc(order_col)]
    if tiebreak_col:
        order.append(F.asc(tiebreak_col))
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )
