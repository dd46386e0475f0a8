"""Labeling pipe (LabelX recast).

Reference parity: spikex ``pipes/labels.py`` —

* labelings = matcher hits with their pattern key as label, sorted by
  (start, -length) (O1, ``labels.py:168-169``);
* abbreviation bridge (J8, ``labels.py:86-111``): a labeled long form
  propagates its label to the unlabeled short form and vice versa
  (span text keyed);
* ``only_longest`` overlap fix (O2, ``labels.py:114-165``): drop spans
  strictly contained in a longer span; merge tail-head overlapping spans
  into one span carrying the LATER span's label.
"""

from __future__ import annotations

from collections.abc import Iterator

from ..matcher.compiler import compile_patterns
from ..matcher.engine import match_doc, punct_tokenize
from .abbrs import extract_abbreviations


def fix_overlabelings(spans: list[tuple[int, int, str]]) -> list[tuple[int, int, str]]:
    """Reference ``_fix_overlabelings`` over (start, end, label) tuples."""
    good: set[tuple[int, int, str]] = set()
    for s, e, lab in spans:
        keep = False
        for os_, oe, olab in spans:
            if (s == os_ and e == oe and lab == olab) or s >= oe or e <= os_:
                keep = True
                continue
            if (s > os_ and e <= oe) or (s >= os_ and e < oe):
                keep = False
                break
            # tail-head overlap: merge, last label wins
            if (s < os_ and e > os_ and e < oe) or (s > os_ and s < oe and e > oe):
                if s < os_:
                    good.add((s, oe, olab))
                else:
                    good.add((os_, e, lab))
                keep = False
                break
        if keep:
            good.add((s, e, lab))
    return sorted(good, key=lambda x: (x[0], x[0] - x[1]))


class LabelX:
    """Single-node labeler over token dicts (or raw whitespace text)."""

    def __init__(self, labelings: list[tuple[str, list[list[dict]]]] | None = None,
                 only_longest: bool = False):
        self._patterns: dict[str, list[list[dict]]] = {}
        self._only_longest = only_longest
        for label, patterns in labelings or []:
            self.add(label, patterns)

    def add(self, label: str, patterns: list[list[dict]]) -> None:
        self._patterns.setdefault(label, []).extend(patterns)

    def __call__(self, tokens_or_text, abbrs: list[dict] | None = None,
                 text: str | None = None) -> list[tuple[int, int, str]]:
        """Return (start, end, label) token spans.

        ``abbrs``: rows from ``extract_abbreviations`` (char offsets over
        ``text``) — labeled long/short forms propagate (J8).
        """
        if isinstance(tokens_or_text, str):
            text = tokens_or_text
            tokens = punct_tokenize(text)
        else:
            tokens = tokens_or_text
        spec = compile_patterns(self._patterns)
        spans = [(s, e, key) for key, s, e in match_doc(spec, tokens)]
        spans.sort(key=lambda x: (x[0], x[0] - x[1]))
        if abbrs and text is not None:
            spans = self._merge_abbrs(spans, abbrs, tokens, text)
        if self._only_longest:
            spans = fix_overlabelings(spans)
        return spans

    @staticmethod
    def _span_text(tokens, s, e):
        return " ".join(t["ORTH"] for t in tokens[s:e])

    def _merge_abbrs(self, spans, abbrs, tokens, text):
        # char offset -> token index map for abbr spans
        starts = {t["idx"]: i for i, t in enumerate(tokens)}

        def to_token_span(char_start: int, form: str):
            if char_start < 0 or char_start not in starts:
                return None
            s = starts[char_start]
            n_words = len(form.split())
            return (s, s + n_words)

        chunk2label = {self._span_text(tokens, s, e): lab for s, e, lab in spans}
        out = list(spans)
        for abbr in abbrs:
            short, long = abbr["short"], abbr["long"]
            if long in chunk2label and short not in chunk2label:
                tspan = to_token_span(abbr["short_start"], short)
                if tspan:
                    out.append((tspan[0], tspan[1], chunk2label[long]))
            elif short in chunk2label and long not in chunk2label:
                tspan = to_token_span(abbr["long_start"], long)
                if tspan:
                    out.append((tspan[0], tspan[1], chunk2label[short]))
        if len(out) > len(spans):
            out.sort(key=lambda x: (x[0], x[0] - x[1]))
        return out


def label_stage(df, labelings: list[tuple[str, list[list[dict]]]],
                id_col: str = "doc_id", text_col: str = "text",
                only_longest: bool = False, use_abbrs: bool = True):
    """Spark stage: (id, start, end, label, surface) labeled spans."""
    import pandas as pd

    pipe = LabelX(labelings, only_longest=only_longest)
    out_schema = (
        f"id {df.schema[id_col].dataType.simpleString()},"
        " start int, end int, label string, surface string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"id": [], "start": [], "end": [], "label": [], "surface": []}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                tokens = punct_tokenize(text)
                abbrs = extract_abbreviations(text) if use_abbrs else None
                for s, e, lab in pipe(tokens, abbrs=abbrs, text=text):
                    rows["id"].append(did)
                    rows["start"].append(s)
                    rows["end"].append(e)
                    rows["label"].append(lab)
                    rows["surface"].append(
                        " ".join(t["ORTH"] for t in tokens[s:e])
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)
