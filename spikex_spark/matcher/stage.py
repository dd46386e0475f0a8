"""Spark stage: run the compiled matcher over a documents/tokens table.

The compiled spec is built ONCE on the driver (reference compile-once,
``matcher/matcher.py:421-440``) and ships to executors inside the UDF
closure (Spark broadcasts task binaries); execution is an Arrow
``mapInPandas`` over the text column — one Python pass per batch, zero
shuffle (narrow map). Single-predicate patterns can also lower to native
``rlike``/``isin`` filters (F6) — see ``regex_match_counts``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .compiler import CompiledSpec
from .engine import match_doc, simple_tokenize


def match_patterns(df: DataFrame, spec: CompiledSpec, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, key, start, end, surface): all matches, token-index spans."""
    out_schema = (
        f"id {df.schema[id_col].dataType.simpleString()}, "
        "key string, start int, end int, surface string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, keys, starts, ends, surfaces = [], [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                tokens = simple_tokenize(text)
                for key, s, e in match_doc(spec, tokens):
                    ids.append(did)
                    keys.append(key)
                    starts.append(s)
                    ends.append(e)
                    surfaces.append(
                        " ".join(t["ORTH"] for t in tokens[s:e])
                    )
            yield pd.DataFrame(
                {"id": ids, "key": keys, "start": starts, "end": ends,
                 "surface": surfaces}
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def regex_match_counts(df: DataFrame, pattern: str, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """F6 native path: count regex hits per doc entirely in Catalyst."""
    return df.select(
        F.col(id_col).alias("id"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))).alias(
            "n_matches"
        ),
    )
