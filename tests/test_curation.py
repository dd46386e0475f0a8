"""Curation-pipeline composition invariants.

The per-stage operators are each oracle-checked on their own; these tests
pin the COMPOSITION semantics: monotone funnel, stage containment, packing
contiguity over the survivor set, and survivor properties (every kept doc
passes every gate).
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stages(spark):
    import __spark_entry__ as e

    docs, st = e._curation_stages(spark, SF_DIR)
    return docs, {name: set(r["id"] for r in ids.collect())
                  for name, ids in st}


def test_funnel_is_monotone_and_contained(stages):
    _, sets = stages
    order = ["raw", "quality", "language", "exact_dedup", "near_dup",
             "decontaminated"]
    for earlier, later in zip(order, order[1:]):
        assert sets[later] <= sets[earlier], (earlier, later)
    assert len(sets["decontaminated"]) > 0
    assert len(sets["decontaminated"]) < len(sets["raw"])


def test_funnel_counts_match_stage_sets(spark, stages):
    import __spark_entry__ as e

    _, sets = stages
    rows = e._q_curation_funnel(spark, SF_DIR).collect()
    got = {r["stage"]: r["n_docs"] for r in rows}
    assert got == {name: len(ids) for name, ids in sets.items()}
    idx = {r["stage"]: r["stage_idx"] for r in rows}
    assert idx["raw"] == 0 and idx["decontaminated"] == 5


def test_survivors_pass_every_gate(spark, stages):
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    docs, sets = stages
    kept = sorted(sets["decontaminated"])
    from spikex_spark.operators.textstats import language_id, quality_score

    q = {r["id"]: r for r in quality_score(docs, "doc_id", "text").collect()}
    lang = {r["id"]: r["lang_guess"]
            for r in language_id(docs, "doc_id", "text").collect()}
    for i in kept:
        assert q[i]["quality"] >= e._CURATION_MIN_QUALITY
        assert q[i]["n_tokens"] >= e._CURATION_MIN_TOKENS
        assert lang[i] == e._CURATION_LANG
        assert i % e._DECON_MOD != 0  # benchmark docs never survive


def test_packing_is_contiguous_over_survivors(spark, stages):
    import __spark_entry__ as e

    _, sets = stages
    rows = sorted(e._q_curation_pipeline(spark, SF_DIR).collect(),
                  key=lambda r: r["id"])
    assert set(r["id"] for r in rows) == sets["decontaminated"]
    pos = 0
    for r in rows:
        assert r["start_token"] == pos
        assert r["block_id"] == pos // e._CURATION_BLOCK
        assert r["block_offset"] == pos % e._CURATION_BLOCK
        assert r["n_tokens"] > 0
        pos += r["n_tokens"]


def test_host_quality_rollup_verdicts(spark):
    import __spark_entry__ as E
    out = E.queries()["host_quality_rollup"](spark, SF_DIR).collect()
    assert len(out) > 0
    for r in out:
        # verdict is exactly the two integer threshold rules
        expect = (10 * r["n_gopher_pass"] >= 6 * r["n_docs"]
                  and 10 * r["n_dup_docs"] <= 3 * r["n_docs"])
        assert r["keep"] == expect
        assert 0 <= r["n_gopher_pass"] <= r["n_docs"]
        assert 0 <= r["n_dup_docs"] < r["n_docs"]
