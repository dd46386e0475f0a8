from __future__ import annotations

import hashlib
import math
import re

import pytest

from spikex_spark.operators.dsir import (
    DSIR_BUCKETS,
    doc_hashed_ngrams,
    dsir_weights,
)

RAW = [
    (0, "the cat sat on the mat"),
    (1, "quantum entanglement drives the experiment"),
    (2, "the dog sat on the log"),
    (3, "stock market rally lifts the index"),
    (4, "cats and dogs and cats"),
    (5, ""),  # no alphanumeric tokens -> no feature rows
    (6, "!!! ???"),  # punctuation only -> no feature rows
    (7, "the cat and the dog"),
]
TARGET = [
    (100, "the cat sat quietly"),
    (101, "a dog and a cat"),
    (102, "cats love mats and dogs love logs"),
]


def _grams(text: str) -> list[str]:
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(gram: str, buckets: int = DSIR_BUCKETS) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % buckets


def _counts(rows) -> dict[int, int]:
    out: dict[int, int] = {}
    for _, text in rows:
        for g in _grams(text):
            b = _bucket(g)
            out[b] = out.get(b, 0) + 1
    return out


def _expected_weights(alpha: float = 0.5, buckets: int = DSIR_BUCKETS):
    cs, ct = _counts(RAW), _counts(TARGET)
    n_s, n_t = sum(cs.values()), sum(ct.values())
    lam = {
        b: round(
            math.log(
                ((ct.get(b, 0) + alpha) / (n_t + alpha * buckets))
                / ((c + alpha) / (n_s + alpha * buckets))
            )
            * 1e7
        )
        for b, c in cs.items()
    }
    exp = {}
    for i, text in RAW:
        doc: dict[int, int] = {}
        for g in _grams(text):
            b = _bucket(g)
            doc[b] = doc.get(b, 0) + 1
        if not doc:
            continue
        exp[i] = (
            sum(doc.values()),
            sum(c * lam[b] for b, c in doc.items()),
        )
    return exp


@pytest.fixture(scope="module")
def raw_df(spark):
    return spark.createDataFrame(RAW, "id long, text string")


@pytest.fixture(scope="module")
def target_df(spark):
    return spark.createDataFrame(TARGET, "id long, text string")


def test_hashed_ngrams_match_bruteforce(spark, raw_df):
    got = {
        (r["id"], r["b"]): r["c"]
        for r in doc_hashed_ngrams(raw_df, "id", "text").collect()
    }
    exp: dict[tuple[int, int], int] = {}
    for i, text in RAW:
        for g in _grams(text):
            k = (i, _bucket(g))
            exp[k] = exp.get(k, 0) + 1
    assert got == exp


def test_weights_match_bruteforce(spark, raw_df, target_df):
    got = {
        r["id"]: (r["n_grams"], r["weight_e7"])
        for r in dsir_weights(raw_df, target_df, "id", "text").collect()
    }
    assert got == _expected_weights()


def test_empty_docs_absent(spark, raw_df, target_df):
    ids = {r["id"] for r in dsir_weights(raw_df, target_df, "id", "text").collect()}
    assert 5 not in ids and 6 not in ids


def test_topk_keep_deterministic(spark, raw_df, target_df):
    rows = dsir_weights(raw_df, target_df, "id", "text", top_k=3).collect()
    exp = _expected_weights()
    order = sorted(exp, key=lambda i: (-exp[i][1], i))
    kept = {r["id"] for r in rows if r["keep"] == 1}
    assert kept == set(order[:3])
    # length-matched semantic check (raw weights are length-dominated at
    # this scale): the cat doc outranks the finance doc, 11 grams each
    assert exp[0][1] > exp[3][1]


def test_topk_larger_than_corpus_keeps_all(spark, raw_df, target_df):
    rows = dsir_weights(raw_df, target_df, "id", "text", top_k=99).collect()
    assert all(r["keep"] == 1 for r in rows)
