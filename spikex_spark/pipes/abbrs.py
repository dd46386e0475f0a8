"""Abbreviation detection — Schwartz & Hearst (2003) char alignment.

Reference parity: spikex ``pipes/abbrs.py`` (X3/J6). Behavior reproduced
(validated against the reference's parametrized test table,
``tests/pipes/test_abbrs.py:23-138``):

* backward char walk aligning the short form into the long-form candidate;
  the first abbreviation char must begin a word; at most 2 consecutive
  word jumps while matching one short char (``abbrs.py:133-192``);
* candidate shapes: ``Long Form (SF)`` and ``SF (Long Form)``; parens with
  > 8 words ignored; long-candidate window = min(|abbr|+5, |abbr|·2) words
  (``abbrs.py:200-231``);
* short-form sanity: words of length [2,10), ≥ 50% alpha, first char alpha
  (F5, ``abbrs.py:276-287``);
* global propagation: lone occurrences of a found long/short form are
  re-linked across the doc (J6, ``abbrs.py:234-273``).

This implementation is string-offset based (no spaCy spans); the Spark stage
is a narrow ``mapInPandas`` emitting (id, short, long, short_start,
long_start) rows.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

_PARENS = re.compile(r"\(([^()]*)\)")
_WORD = re.compile(r"\S+")


def find_abbreviation(long_form: str, short_form: str) -> tuple[int, int] | None:
    """Align ``short_form`` into ``long_form`` backwards; return the char
    bounds (start, end) of the matched long form, or None.

    Rules: each alpha char of the short form must appear in order in the
    long form; the FIRST short char must sit at a word start; while looking
    for one short char at most 2 word boundaries may be crossed; trailing
    non-alnum chars of the long form are trimmed from the result.
    """
    li = len(long_form) - 1
    end_bound = li
    si = len(short_form) - 1
    jumps = 0
    prev_si = si
    while si >= 0 and li >= 0:
        sc = short_form[si].lower()
        if not sc.isalpha():
            si -= 1
            continue
        if prev_si != si:
            jumps = 0
            prev_si = si
        lc = long_form[li].lower()
        if lc.isspace():
            if jumps == 2:
                break
            jumps += 1
        at_word_start = li == 0 or not long_form[li - 1].isalnum()
        if lc != sc:
            # trailing junk shrinks the reported end bound
            if li == end_bound and not lc.isalnum():
                end_bound -= 1
            li -= 1
            continue
        if si == 0 and not at_word_start:
            li -= 1
            continue
        li -= 1
        si -= 1
    if li >= 0 and not long_form[li].isalnum():
        li += 1
    unmatched = si >= 0
    mid_word = li > 0 and long_form[li - 1].isalnum()
    if unmatched or mid_word:
        return None
    start = max(li, 0)
    end = end_bound + 1
    if start == end:
        return None
    return start, end


def short_form_ok(short: str) -> bool:
    """F5 sanity filter on a candidate short form."""
    words = short.split()
    if not words or not all(2 <= len(w) < 10 for w in words):
        return False
    if sum(c.isalpha() for c in short) / len(short) < 0.5:
        return False
    return short[0].isalpha()


def _words_before(text: str, pos: int, n: int) -> tuple[int, str]:
    """Start offset and slice of up to n words immediately before pos."""
    words = list(_WORD.finditer(text, 0, pos))
    take = words[-n:] if n < len(words) else words
    if not take:
        return pos, ""
    return take[0].start(), text[take[0].start():pos].rstrip()


def extract_abbreviations(text: str) -> list[dict]:
    """All (short, long) abbreviation pairs in one text, with char offsets.

    Includes global propagation: after the parenthesized pairs are found,
    lone occurrences of each known form elsewhere in the text are linked to
    their counterpart.
    """
    pairs: list[tuple[str, int, str, int]] = []  # (short, s_off, long, l_off)
    form2other: dict[str, str] = {}
    paren_spans = []
    # un-bracketed candidates: ALL-UPPER alpha tokens, len > 1
    # (reference matcher pattern: IS_ALPHA & IS_UPPER & LENGTH > 1)
    for m in _WORD.finditer(text):
        tok = m.group(0).strip(".,;:!?")
        if len(tok) < 2 or not tok.isalpha() or not tok.isupper():
            continue
        if not short_form_ok(tok):
            continue
        max_words = min(len(tok) + 5, len(tok) * 2)
        l_start, cand_long = _words_before(text, m.start(), max_words)
        if not cand_long:
            continue
        bounds = find_abbreviation(cand_long, tok)
        if bounds is None:
            continue
        ls, le = bounds
        pairs.append((tok, m.start(), cand_long[ls:le], l_start + ls))
    for m in _PARENS.finditer(text):
        inner = m.group(1).strip()
        if not inner:
            continue
        inner_words = inner.split()
        if len(inner_words) > 8:
            continue
        if len(inner_words) > 1:
            # Long form inside parens; short form = word before the paren
            s_start, cand_short = _words_before(text, m.start(), 1)
            if not cand_short or not short_form_ok(cand_short):
                continue
            bounds = find_abbreviation(inner, cand_short)
            if bounds is None:
                continue
            ls, le = bounds
            pairs.append((cand_short, s_start,
                          inner[ls:le], m.start(1) + ls))
        else:
            # Short form inside parens; long candidate window before it
            if not short_form_ok(inner):
                continue
            max_words = min(len(inner) + 5, len(inner) * 2)
            l_start, cand_long = _words_before(text, m.start(), max_words)
            if not cand_long:
                continue
            bounds = find_abbreviation(cand_long, inner)
            if bounds is None:
                continue
            ls, le = bounds
            pairs.append((inner, m.start(1), cand_long[ls:le], l_start + ls))
    out = []
    seen: set[tuple[int, int]] = set()
    for short, s_off, long, l_off in pairs:
        form2other.setdefault(short, long)
        form2other.setdefault(long, short)
        if (s_off, l_off) not in seen:
            seen.add((s_off, l_off))
            out.append({"short": short, "short_start": s_off,
                        "long": long, "long_start": l_off})
    # J6: lone occurrences of known forms
    known = {(r["short_start"], len(r["short"])) for r in out}
    known |= {(r["long_start"], len(r["long"])) for r in out}
    for form, other in form2other.items():
        for m in re.finditer(re.escape(form), text):
            if (m.start(), len(form)) in known:
                continue
            short, long = (form, other) if len(form) < len(other) else (other, form)
            rec = {"short": short,
                   "short_start": m.start() if short == form else -1,
                   "long": long,
                   "long_start": m.start() if long == form else -1}
            key = (m.start(), len(form))
            known.add(key)
            out.append(rec)
    return out


def abbr_stage(df, id_col: str = "doc_id", text_col: str = "text"):
    """Spark stage: (id, short, long, short_start, long_start) rows."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    out_schema = (
        f"id {df.schema[id_col].dataType.simpleString()}, short string,"
        " long string, short_start int, long_start int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"id": [], "short": [], "long": [],
                    "short_start": [], "long_start": []}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                for r in extract_abbreviations(text):
                    rows["id"].append(did)
                    rows["short"].append(r["short"])
                    rows["long"].append(r["long"])
                    rows["short_start"].append(r["short_start"])
                    rows["long_start"].append(r["long_start"])
            yield pd.DataFrame(rows)

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)
