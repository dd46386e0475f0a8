"""Phrase detection (PhraseX / NounPhraseX / VerbPhraseX recast).

Reference parity: spikex ``pipes/phrases.py`` — a parameterized matcher
stage plus two span post-passes:

* consuming scan (``phrases.py:27-38``): walk matches in (start, end) order,
  keep a match only if it ends after the last kept end;
* overlap fix (``phrases.py:103-131``): drop spans STRICTLY contained in
  another span (identical and partially-overlapping spans survive).

The reference's NP/VP patterns key on POS tags — callers supply token dicts
with a ``POS`` attribute (the engine carries whatever attributes upstream
tagging provides; this repo ships no tagger).
"""

from __future__ import annotations

from collections.abc import Iterator

from ..matcher.compiler import CompiledSpec, compile_patterns
from ..matcher.engine import match_doc, simple_tokenize

NP_PATTERNS = [
    [
        {"POS": {"IN": ["ADJ", "ADV", "DET", "NUM", "PROPN"]}, "OP": "*"},
        {"POS": {"IN": ["ADP", "CONJ", "CCONJ"]}, "OP": "?"},
        {"POS": {"IN": ["ADJ", "ADP", "ADV", "NOUN", "NUM", "PRON", "PROPN"]},
         "OP": "*"},
        {"POS": {"IN": ["NOUN", "PROPN"]}},
    ]
]

VP_PATTERNS = [
    [
        {"POS": {"IN": ["ADV", "AUX", "PART", "VERB"]}, "OP": "*"},
        {"POS": {"IN": ["AUX", "VERB"]}},
    ]
]


def _consuming_scan(matches: list[tuple]) -> list[tuple[int, int]]:
    """Keep matches that extend past the last kept end (reference greedy)."""
    out = []
    last_end = 0
    for _, start, end in matches:
        if last_end >= end:
            continue
        last_end = end
        out.append((start, end))
    return out


def fix_overlappings(spans: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Drop spans strictly contained in another span."""
    good = set()
    for s, e in spans:
        keep = False
        for os_, oe in spans:
            if (s == os_ and e == oe) or s >= oe or e <= os_:
                keep = True
                continue
            if (s > os_ and e <= oe) or (s >= os_ and e < oe):
                keep = False
                break
        if keep:
            good.add((s, e))
    return sorted(good, key=lambda x: (x[0], x[0] - x[1]))


class PhraseX:
    """Single-node pipe: find phrase spans with a named pattern set."""

    def __init__(self, phrases_name: str, patterns: list[list[dict]]):
        self.name = phrases_name
        self.spec: CompiledSpec = compile_patterns({phrases_name: patterns})

    def __call__(self, tokens_or_text) -> list[tuple[int, int]]:
        tokens = (
            simple_tokenize(tokens_or_text)
            if isinstance(tokens_or_text, str)
            else tokens_or_text
        )
        matches = match_doc(self.spec, tokens)
        return fix_overlappings(_consuming_scan(matches))


class NounPhraseX(PhraseX):
    def __init__(self) -> None:
        super().__init__("noun_phrases", NP_PATTERNS)


class VerbPhraseX(PhraseX):
    def __init__(self) -> None:
        super().__init__("verb_phrases", VP_PATTERNS)


def phrase_stage(df, patterns: list[list[dict]], id_col: str = "doc_id",
                 text_col: str = "text", name: str = "phrases"):
    """Spark stage: (id, start, end, surface) phrase spans per doc."""
    import pandas as pd

    pipe = PhraseX(name, patterns)
    out_schema = (
        f"id {df.schema[id_col].dataType.simpleString()},"
        " start int, end int, surface string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"id": [], "start": [], "end": [], "surface": []}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                tokens = simple_tokenize(text)
                for s, e in pipe(tokens):
                    rows["id"].append(did)
                    rows["start"].append(s)
                    rows["end"].append(e)
                    rows["surface"].append(
                        " ".join(t["ORTH"] for t in tokens[s:e])
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)
