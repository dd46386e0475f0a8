"""Dedup family: exact, simhash, n-gram Jaccard, MinHash near-dups."""

from __future__ import annotations

import pytest

from spikex_spark.operators import dedup as D


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),   # near dup
        (4, "completely unrelated text about spark engines"),
        (5, "Copyright notice all rights reserved terms"),
        (6, "copyright notice ALL rights reserved terms!"),   # case/punct dup
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_exact_duplicates(spark, docs):
    out = {r["id"]: r["canonical_id"] for r in
           D.exact_duplicates(docs, "doc_id", "text").collect()}
    assert out[1] == 1 and out[2] == 1          # byte-identical collapse
    assert out[3] == 3 and out[4] == 4          # others keep themselves
    assert out[5] == 5 and out[6] == 6          # case differs -> not exact


def test_simhash_stability_and_locality(spark, docs):
    sh = {r["id"]: r["simhash"] for r in D.simhash(docs, "doc_id", "text").collect()}
    assert sh[1] == sh[2]                       # identical text, same hash
    ham_13 = bin(sh[1] ^ sh[3]).count("1")
    ham_14 = bin(sh[1] ^ sh[4]).count("1")
    assert ham_13 < ham_14                      # near-dup closer than random


def test_simhash_near_dups_pairs(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in D.simhash_near_dups(docs, "doc_id", "text", max_hamming=5).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 4) not in pairs


def test_ngram_jaccard(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in D.ngram_jaccard_pairs(docs, "doc_id", "text",
                                            n=3, min_jaccard=0.3).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.3 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs
    # case/punct-normalized grams collapse 5 and 6
    assert pairs[(5, 6)] == 1.0


def test_minhash_near_dups(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in D.minhash_near_dups(docs, "doc_id", "text",
                                          min_jaccard=0.5).collect()}
    assert pairs[(1, 2)] == 1.0
    assert pairs[(5, 6)] == 1.0
    assert (1, 4) not in pairs


def test_line_dedup_docs_boilerplate_removal(spark):
    """Corpus-hot lines go, unique lines and empty-line structure stay,
    order preserved; fully-boilerplate docs come back with empty text."""
    from spikex_spark.operators.dedup import line_dedup_docs

    boiler, foot = "Subscribe now", "(c) corp"
    docs = spark.createDataFrame([
        (1, f"Unique A\n{boiler}\n\nBody 1"),
        (2, f"{boiler}\nBody 2\n{foot}"),
        (3, f"Body 3\n{foot}"),
        (4, f"{boiler}\n{foot}"),               # nothing survives
    ], "doc_id long, text string")
    out = {r["id"]: r for r in
           line_dedup_docs(docs, "doc_id", "text").collect()}
    assert out[1]["cleaned_text"] == "Unique A\n\nBody 1"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (4, 3)
    assert out[2]["cleaned_text"] == "Body 2"
    assert out[3]["cleaned_text"] == "Body 3"
    assert out[4]["cleaned_text"] == ""
    assert (out[4]["n_lines"], out[4]["n_kept"]) == (2, 0)

    # threshold: both boilerplate lines occur 3 times; min_dup=4 keeps
    # them, min_dup=3 (the assertions above run at the default 2) drops
    out4 = {r["id"]: r for r in
            line_dedup_docs(docs, "doc_id", "text", min_dup=4).collect()}
    assert foot in out4[2]["cleaned_text"]
    assert boiler in out4[1]["cleaned_text"]
