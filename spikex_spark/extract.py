"""Stage 1 — text extraction (the byte-identical invariant stage).

Reference: spikex ``pipes/wikipages.py:50-62`` (``_preprocess_doc``): the doc
text is re-rendered with every whitespace char replaced by ``_`` before title
matching. Here that extractor is the shared pure function
``textutils.extract_text`` applied inside a ``mapInPandas`` Arrow stage, so
the Spark output is byte-identical to direct single-node calls by
construction (pytest verifies the plumbing: Arrow round-trip, encoding).

Two paths:

* ``extract_stage`` — the contract path: Arrow-batched Python, byte-identical.
* ``extract_native`` — the all-JVM path (``regexp_replace`` with the same
  explicit ASCII whitespace class); used when the plan must stay inside
  whole-stage codegen. Tests assert both paths agree byte-for-byte.

Scale notes: both are narrow maps — no shuffle, fully pipelined with the
parquet scan; column pruning keeps only (id, text) in flight.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textutils import WS_CLASS, extract_text

EXTRACTED_COL = "extracted"


def extract_stage(df: DataFrame, text_col: str = "text",
                  out_col: str = EXTRACTED_COL) -> DataFrame:
    """Append the byte-identical extracted text via an Arrow batch stage."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                extract_text(t) if t is not None else None
                for t in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def extract_native(df: DataFrame, text_col: str = "text",
                   out_col: str = EXTRACTED_COL) -> DataFrame:
    """Same transform, pure Catalyst (whole-stage codegen, no Python)."""
    return df.withColumn(out_col, F.regexp_replace(F.col(text_col), WS_CLASS, "_"))
