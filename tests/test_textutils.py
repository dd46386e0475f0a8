"""Pure-function tests: the byte-identity anchor + DuckDB-calibrated sims."""

from __future__ import annotations

import random

import duckdb
import pytest

from spikex_spark import textutils as tu


def test_extract_text_per_char_substitution():
    # per-char, NOT run-collapsing — spikex pipes/wikipages.py:62 semantics
    assert tu.extract_text("a  b") == "a__b"
    assert tu.extract_text("a\tb\nc") == "a_b_c"
    assert tu.extract_text("") == ""
    assert tu.extract_text("nospace") == "nospace"
    assert tu.extract_text(" lead trail ") == "_lead_trail_"


def test_clean_title_reference_semantics():
    # spikex wikigraph/wikigraph.py:367-376
    assert tu.clean_title("Apple_(company)") == "Apple"
    assert tu.clean_title("Apple") == "Apple"
    assert tu.clean_title("Apple_(company") == "Apple_(company"  # no closing
    assert tu.clean_title("A_(x)_B_(y)") == "A_B_(y)"  # first only
    assert tu.norm_title_key("Apple_(company)") == "apple"
    assert tu.norm_title_key("_(x)") == "_(x)"  # empty key falls back


def test_tokenize_and_jaccard():
    assert tu.tokenize("Apple, Inc. 2024!") == ["apple", "inc", "2024"]
    assert tu.token_jaccard("a b c", "b c d") == pytest.approx(0.5)
    assert tu.token_jaccard("", "") == 1.0
    assert tu.token_jaccard("a", "") == 0.0


def test_char_shingles():
    assert tu.char_shingles("ab", 5) == ["ab"]
    sh = tu.char_shingles("Hello, World", 5)
    assert "hello" in sh and all(len(s) == 5 for s in sh)


def test_levenshtein_matches_duckdb():
    con = duckdb.connect()
    rng = random.Random(11)
    for _ in range(200):
        a = "".join(rng.choice("abcde _") for _ in range(rng.randint(0, 15)))
        b = "".join(rng.choice("abcde _") for _ in range(rng.randint(0, 15)))
        assert tu.levenshtein(a, b) == con.execute(
            "select levenshtein(?, ?)", [a, b]
        ).fetchone()[0]


def test_jaro_winkler_matches_duckdb():
    con = duckdb.connect()
    rng = random.Random(12)
    pairs = [("martha", "marhta"), ("dixon", "dicksonx"), ("", ""), ("a", ""),
             ("apple", "appel"), ("same", "same")]
    pairs += [
        ("".join(rng.choice("abcdef _-") for _ in range(rng.randint(0, 20))),
         "".join(rng.choice("abcdef _-") for _ in range(rng.randint(0, 20))))
        for _ in range(500)
    ]
    for a, b in pairs:
        duck = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert tu.jaro_winkler(a, b) == pytest.approx(duck, abs=1e-12), (a, b)
