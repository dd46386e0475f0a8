"""hashed_embedding: feature-hashing text vectors."""
from __future__ import annotations

import hashlib
import math
import re

import pytest


def _ref(text, dim=16):
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    counts = [0] * dim
    for t in toks:
        counts[int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % dim] += 1
    n2 = sum(c * c for c in counts)
    if n2 == 0:
        return [0.0] * dim
    n = math.sqrt(float(n2))
    return [round(c / n, 6) for c in counts]


def _run(spark, texts, dim=16):
    from spikex_spark.operators.textstats import hashed_embedding

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id bigint, text string")
    return {r["id"]: r["emb"]
            for r in hashed_embedding(df, dim=dim).collect()}


def test_matches_reference_hash(spark):
    texts = ["the quick brown fox", "Hello, WORLD! hello",
             "a b c a b a", ""]
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == pytest.approx(_ref(t)), t


def test_unit_norm_and_zero_vector(spark):
    got = _run(spark, ["some repeated words words words", "...!!!"])
    n = sum(x * x for x in got[0])
    assert n == pytest.approx(1.0, abs=1e-4)
    assert got[1] == [0.0] * 16


def test_same_text_same_vector(spark):
    got = _run(spark, ["identical text here", "identical text here"])
    assert got[0] == got[1]
