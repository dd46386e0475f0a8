"""Matcher: truth tables ported from the reference test suite.

Sources: /root/reference/tests/matcher/test_matcher_logic.py (operator
combos :87-120, greedy vs re :45-63), test_matcher_api.py (API surface,
IN/NOT_IN/REGEX/LENGTH cases), test_pattern_validation.py (validation).
Match ids are key strings here (no spacy vocab hashes).
"""

from __future__ import annotations

import re

import pytest

from spikex_spark.matcher import Matcher, compile_patterns, validate_pattern
from spikex_spark.matcher.engine import word_shape


def _doc(words):
    return [{"ORTH": w} for w in words]


# --- operator combo truth table (test_matcher_logic.py:87-120) -------------

OPERATOR_COMBOS = [
    ("aaab", "a a a b", True),
    ("aaab", "a+ b", True),
    ("aaab", "a+ a+ b", True),
    ("aaab", "a+ a+ a b", True),
    ("aaab", "a+ a+ a+ b", True),
    ("aaab", "a+ a a b", True),
    ("aaab", "a+ a a", True),
    ("aaab", "a+", True),
    ("aaa", "a+ b", False),
    ("aaa", "a+ a+ b", False),
    ("aaa", "a+ a+ a+ b", False),
    ("aaa", "a+ a b", False),
    ("aaa", "a+ a a b", False),
    ("aaab", "a+ a b", True),
]


@pytest.mark.parametrize("string,pattern_str,expected", OPERATOR_COMBOS)
def test_operator_combos(string, pattern_str, expected):
    pattern = []
    for part in pattern_str.split():
        if part.endswith("+"):
            pattern.append({"ORTH": part[0], "OP": "+"})
        else:
            pattern.append({"ORTH": part})
    m = Matcher()
    m.add("PATTERN", [pattern])
    matches = m(_doc(list(string)))
    assert bool(matches) == expected, (string, pattern_str)


def test_greedy_matching_ba_star_b():
    # the reference's one NON-xfail greedy case: BA*B over "(ABBAAAAAB)."
    text = "(ABBAAAAAB)."
    pattern = [{"ORTH": "B"}, {"ORTH": "A", "OP": "*"}, {"ORTH": "B"}]
    m = Matcher()
    m.add("BA*B", [pattern])
    matches = [(s, e) for _, s, e in m(_doc(list(text)))]
    re_matches = [mm.span() for mm in re.finditer("BA*B", text)]
    for got, want in zip(matches, re_matches):
        assert got == want


# --- API surface (test_matcher_api.py) --------------------------------------

def test_api_add_remove_get_contains():
    m = Matcher()
    assert len(m) == 0
    m.add("Rule", [[{"ORTH": "test"}]])
    assert len(m) == 1 and "Rule" in m
    m.remove("Rule")
    assert "Rule" not in m
    m.add("Rule", [[{"ORTH": "test"}]])
    _, patterns = m.get("Rule")
    assert len(patterns[0]) == 1


@pytest.fixture
def api_matcher():
    m = Matcher()
    m.add("JS", [[{"ORTH": "JavaScript"}]])
    m.add("GoogleNow", [[{"ORTH": "Google"}, {"ORTH": "Now"}]])
    m.add("Java", [[{"LOWER": "java"}]])
    return m


def test_match_start_end_middle_multi(api_matcher):
    assert api_matcher(_doc(["JavaScript", "is", "good"])) == [("JS", 0, 1)]
    assert api_matcher(_doc(["I", "like", "java"])) == [("Java", 2, 3)]
    assert api_matcher(_doc(["I", "like", "Google", "Now", "best"])) == [
        ("GoogleNow", 2, 4)
    ]
    assert api_matcher(_doc(["I", "like", "Google", "Now", "and", "java", "best"])) == [
        ("GoogleNow", 2, 4), ("Java", 5, 6)
    ]
    assert api_matcher(_doc(["I", "like", "cheese", "."])) == []


def test_empty_dict_matches_any():
    m = Matcher()
    m.add("A.C", [[{"ORTH": "a"}, {}, {"ORTH": "c"}]])
    assert m(_doc(["a", "b", "c"]))[0][1:] == (0, 3)
    m2 = Matcher()
    m2.add("A.", [[{"ORTH": "a"}, {}]])
    assert m2(_doc(["a", "b", "c"]))[0][1:] == (0, 2)


def test_operator_shadow():
    m = Matcher()
    m.add("A.C", [[{"ORTH": "a"}, {"IS_ALPHA": True, "OP": "+"}, {"ORTH": "c"}]])
    matches = m(_doc(["a", "b", "c"]))
    assert len(matches) == 1 and matches[0][1:] == (0, 3)


def test_any_token_operator():
    m = Matcher()
    m.add("TEST", [[{"ORTH": "test"}, {"OP": "*"}]])
    matches = m(_doc(["test", "hello", "world"]))
    assert len(matches) == 1 and matches[0][1:] == (0, 3)


def test_set_value_in():
    m = Matcher()
    m.add("A_OR_AN", [[{"ORTH": {"IN": ["an", "a"]}}]])
    assert len(m(_doc(["an", "a", "apple"]))) == 2
    assert m(_doc(["aardvark"])) == []


def test_set_value_operator():
    m = Matcher()
    m.add("DET_HOUSE", [[{"ORTH": {"IN": ["a", "the"]}, "OP": "?"},
                         {"ORTH": "house"}]])
    assert len(m(_doc(["In", "a", "house"]))) == 1
    assert len(m(_doc(["my", "house"]))) == 1


def test_bare_regex_token():
    m = Matcher()
    m.add("REGEX", [[{"REGEX": r"\bUS\d+\b"}]])
    words = "This is a test for a regex, US12345.".split()
    matches = m(_doc(words))
    assert matches == [("REGEX", 7, 8)]


def test_orth_regex():
    m = Matcher()
    m.add("A_OR_AN", [[{"ORTH": {"REGEX": r"(?:a|an)"}}]])
    assert len(m(_doc(["an", "a", "hi"]))) == 2
    assert m(_doc(["bye"])) == []


def test_shape_regex():
    m = Matcher()
    m.add("NON_ALPHA", [[{"SHAPE": {"REGEX": r"^[^x]+$"}}]])
    assert len(m(_doc(["99", "problems", "!"]))) == 2
    assert m(_doc(["bye"])) == []


@pytest.mark.parametrize(
    "cmp,bad",
    [("==", ["a", "aaa"]), ("!=", ["aa"]), (">=", ["a"]), ("<=", ["aaa"]),
     (">", ["a", "aa"]), ("<", ["aa", "aaa"])],
)
def test_compare_length(cmp, bad):
    m = Matcher()
    m.add("LENGTH_COMPARE", [[{"LENGTH": {cmp: 2}}]])
    words = ["a", "aa", "aaa"]
    assert len(m(_doc(words))) == len(words) - len(bad)
    assert m(_doc(bad)) == []


def test_extension_attribute():
    m = Matcher()
    m.add("HAVING_FRUIT", [[{"ORTH": "an"}, {"_": {"is_fruit": True}}]])
    doc = [{"ORTH": "an"}, {"ORTH": "apple", "_": {"is_fruit": True}}]
    assert len(m(doc)) == 1
    doc2 = [{"ORTH": "an"}, {"ORTH": "aardvark", "_": {"is_fruit": False}}]
    assert m(doc2) == []


def test_extension_set_membership():
    m = Matcher()
    m.add("REVERSED", [[{"_": {"reversed": {"IN": ["eyb", "ih"]}}}]])
    doc = [
        {"ORTH": "hi", "_": {"reversed": "ih"}},
        {"ORTH": "bye", "_": {"reversed": "eyb"}},
        {"ORTH": "hello", "_": {"reversed": "olleh"}},
    ]
    assert len(m(doc)) == 2


# --- validation (test_pattern_validation.py shapes) --------------------------

@pytest.mark.parametrize(
    "pattern,n_errors",
    [
        ([{"ORTH": "foo"}], 0),
        ([{"ORTH": {"REGEX": "foo"}}], 0),
        ([{"LENGTH": 2}], 0),
        ([{"LENGTH": {">=": 2}}], 0),
        ([{"FOO": "bar"}], 1),
        ([{"ORTH": "foo", "OP": "$"}], 1),
        ([{"LENGTH": "2"}], 1),
        ([{"ORTH": {"BAD_PRED": "x"}}], 1),
        ([], 1),
        ([{"IS_ALPHA": "yes"}], 1),
    ],
)
def test_pattern_validation(pattern, n_errors):
    assert len(validate_pattern(pattern)) == n_errors


def test_word_shape():
    assert word_shape("Apple") == "Xxxxx"
    assert word_shape("US12345") == "XXdddd"
    assert word_shape("hello!") == "xxxx!"


# --- Spark stage -------------------------------------------------------------

def test_match_patterns_stage(spark):
    from spikex_spark.matcher.stage import match_patterns
    docs = spark.createDataFrame(
        [(1, "I love JavaScript and java beans"),
         (2, "Google Now is here"), (3, None)],
        ["doc_id", "text"],
    )
    spec = compile_patterns({
        "JS": [[{"ORTH": "JavaScript"}]],
        "GoogleNow": [[{"ORTH": "Google"}, {"ORTH": "Now"}]],
        "Java": [[{"LOWER": "java"}]],
    })
    got = {(r["id"], r["key"], r["start"], r["end"], r["surface"])
           for r in match_patterns(docs, spec).collect()}
    assert (1, "JS", 2, 3, "JavaScript") in got
    assert (1, "Java", 4, 5, "java") in got
    assert (2, "GoogleNow", 0, 2, "Google Now") in got
    # spark output matches single-node engine exactly (plumbing check)
    m = Matcher()
    m.add("JS", [[{"ORTH": "JavaScript"}]])
    local = {("JS",) + mm[1:] for mm in m("I love JavaScript and java beans")
             if mm[0] == "JS"}
    spark_js = {(r["key"], r["start"], r["end"]) for r in
                match_patterns(docs.where("doc_id = 1"), spec).collect()
                if r["key"] == "JS"}
    assert {(k, s, e) for k, s, e in local} == spark_js
