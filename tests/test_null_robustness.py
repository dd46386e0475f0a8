"""Null/empty/whitespace text robustness across the core operator surface.

Production webtext carries null and empty text rows (failed fetches,
binary pages, extraction misses); the synthetic corpus never does, so
these pin the behavior explicitly: every operator must run without
raising, and keep-list-shaped outputs must cover every input row.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def nulldocs(spark):
    return spark.createDataFrame(
        [(1, "normal text with the of and words here", "en", "s0", 38),
         (2, None, "en", "s0", 0),
         (3, "", "fr", "s1", 0),
         (4, "   ", "de", "s1", 3)],
        "doc_id long, text string, lang string, source string, n_chars long")


def test_textstats_operators_survive_nulls(spark, nulldocs):
    from spikex_spark.operators.textstats import (fingerprint, gopher_rules,
                                                  language_id, pii_scrub,
                                                  quality_score,
                                                  token_counts)
    for op in (quality_score, language_id, token_counts, fingerprint,
               pii_scrub, gopher_rules):
        rows = op(nulldocs, "doc_id", "text").collect()
        assert len(rows) == 4, op.__name__


def test_pair_operators_skip_null_docs_without_raising(spark, nulldocs):
    from spikex_spark.operators.dedup import (bag_jaccard_pairs,
                                              ngram_jaccard_pairs)
    assert bag_jaccard_pairs(nulldocs, "doc_id", "text",
                             min_jaccard=0.0, max_df=10).collect() == []
    assert ngram_jaccard_pairs(nulldocs, "doc_id", "text").collect() == []


def test_flagship_resolution_covers_null_docs(spark, nulldocs):
    from spikex_spark.pipeline import resolve_documents
    out = resolve_documents(nulldocs, threshold=0.80).collect()
    assert {r["doc_id"] for r in out} == {1, 2, 3, 4}


def test_mentions_and_extract_survive_nulls(spark):
    from spikex_spark.extract import extract_native
    from spikex_spark.operators import blocking as B
    docs = spark.createDataFrame(
        [(1, "apple inc makes the iphone device", "en"),
         (2, None, "en"), (3, "", "fr")],
        "doc_id long, text string, lang string")
    assert len(extract_native(docs, "text", "ex").collect()) == 3
    hits = B.mentions_broadcast(docs, ["apple inc", "iphone"],
                                id_col="doc_id", text_col="text",
                                raw_ws=True, nested=True).collect()
    assert {r["id"] for r in hits} == {1}
