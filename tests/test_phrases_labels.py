"""Phrases + labels pipes: reference test tables ported (hand POS tags)."""

from __future__ import annotations

import pytest

from spikex_spark.pipes.labels import LabelX, label_stage
from spikex_spark.pipes.phrases import NounPhraseX, VerbPhraseX, phrase_stage


def _tag(words_pos):
    return [{"ORTH": w, "POS": p} for w, p in words_pos]


# POS tags mirror what en_core_web_sm assigns in the reference tests
@pytest.mark.parametrize(
    "tokens,np_coords",
    [
        (_tag([("a", "DET"), ("simple", "ADJ"), ("noun", "NOUN"),
               ("phrase", "NOUN"), ("and", "CCONJ"), ("a", "DET"),
               ("second", "ADJ"), ("noun", "NOUN"), ("phrase.", "NOUN")]),
         ((0, 4), (5, 9))),
        (_tag([("this", "PRON"), ("is", "AUX"), ("the", "DET"),
               ("long", "ADJ"), ("and", "CCONJ"), ("unexpectedly", "ADV"),
               ("complex", "ADJ"), ("noun", "NOUN"), ("phrase.", "NOUN")]),
         ((2, 9),)),
        (_tag([("I", "PRON"), ("am", "AUX"), ("being", "AUX"),
               ("stuck", "VERB")]), ()),
    ],
)
def test_noun_phraser(tokens, np_coords):
    assert tuple(NounPhraseX()(tokens)) == np_coords


@pytest.mark.parametrize(
    "tokens,vp_coords",
    [
        (_tag([("this", "PRON"), ("was", "AUX"), ("created", "VERB"),
               ("obviously", "ADV"), ("simple.", "ADJ")]), ((1, 3),)),
        (_tag([("I", "PRON"), ("have", "AUX"), ("been", "AUX"),
               ("deeply", "ADV"), ("trying", "VERB"), ("to", "PART"),
               ("find", "VERB"), ("it.", "PRON")]), ((1, 7),)),
        (_tag([("this", "PRON"), ("simply", "ADV"), ("big", "ADJ"),
               ("apple", "NOUN")]), ()),
    ],
)
def test_verb_phraser(tokens, vp_coords):
    assert tuple(VerbPhraseX()(tokens)) == vp_coords


def test_simple_labels():
    labeler = LabelX()
    labeler.add("NO_TEST", [[{"TEXT": "test", "OP": "!"}]])
    spans = labeler("This is a test")
    assert len(spans) == 3 and all(lab == "NO_TEST" for _, _, lab in spans)
    labeler.add("TEST", [[{"TEXT": "test"}]])
    spans = labeler("This is a test")
    assert spans[-1][2] == "TEST"


@pytest.mark.parametrize(
    "text,label,patterns",
    [
        ("a antilock braking system (abs)", "short-to-long",
         [[{"LOWER": "abs"}]]),
        ("a computer system (CS)", "long-to-short",
         [[{"LOWER": "computer"}, {"LOWER": "system"}]]),
    ],
)
def test_merge_abbrs_labelings(text, label, patterns):
    from spikex_spark.pipes.abbrs import extract_abbreviations
    labeler = LabelX([(label, patterns)])
    abbrs = extract_abbreviations(text)
    assert abbrs, text
    spans = labeler(text, abbrs=abbrs, text=text)
    assert len(spans) == 2
    assert all(lab == label for _, _, lab in spans)


@pytest.mark.parametrize(
    "text,label,patterns",
    [
        ("a antilock braking system", "intra",
         [[{"LOWER": "antilock"}], [{"LOWER": "braking"}],
          [{"LOWER": "system"}],
          [{"LOWER": "antilock"}, {"LOWER": "braking"}, {"LOWER": "system"}]]),
        ("a computer system engineer", "inter",
         [[{"LOWER": "computer"}, {"LOWER": "system"}],
          [{"LOWER": "system"}, {"LOWER": "engineer"}]]),
    ],
)
def test_keep_longest_only(text, label, patterns):
    labeler = LabelX([(label, patterns)], only_longest=True)
    spans = labeler(text)
    assert len(spans) == 1
    assert spans[0][2] == label


def test_label_stage_spark(spark):
    docs = spark.createDataFrame(
        [(1, "we use machine learning (ML) and ML rocks"), (2, None)],
        ["doc_id", "text"],
    )
    got = label_stage(
        docs, [("TECH", [[{"LOWER": "machine"}, {"LOWER": "learning"}]])]
    ).collect()
    labels = {(r["surface"], r["label"]) for r in got}
    assert ("machine learning", "TECH") in labels
    # abbr bridge: short form (ML) inherits the label
    assert any(r["surface"] == "ML" and r["label"] == "TECH" for r in got)


def test_phrase_stage_spark(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None)], ["doc_id", "text"]
    )
    got = phrase_stage(docs, [[{"ORTH": "alpha"}, {"OP": "?"}]]).collect()
    assert {(r["start"], r["end"]) for r in got} == {(0, 2)}
