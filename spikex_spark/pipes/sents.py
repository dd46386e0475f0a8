"""Sentence splitting with abbreviation-safe boundaries (SentX recast).

Reference parity: spikex ``pipes/sents/sents.py`` — boundary = token ending
with ``.`` (+ optional closing quotes/brackets, X5 ``:102-110``) unless the
token or its predecessor is a safe acronym/abbreviation (X4 ``:46-54``:
``tm Std Nor Fig Figs pat ser No Num eg`` + 1-3-letter dotted abbrs +
two-digit numbers); bullet lists group into their introducing sentence;
"special sentence starters" (The/This/Those/…) force a split after a title
line (``SPECIAL_SENT_STARTERS``, approximated without POS tags).

The reference additionally re-ranks boundaries with a Naive-Bayes model over
spaCy tokens (``sents/nbmodel.py``) — out of scope here (model weights are
packaged binaries); the rule layer alone reproduces its test fixture.

Spark stage: narrow ``mapInPandas`` → (id, sent_idx, start, end, sentence).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

SAFE_ACRONYMS = re.compile(
    r"^(tm|TM|Std|Nor|Fig|FIG|Figs|FIGS|pat|Pat|ser|Ser|No|Num|eg|[1-9][0-9])$"
)
SAFE_ABBRS = re.compile(r"^[a-zA-Z]{1,3}\.")
_ENDS_DOT = re.compile(r".*\.[\"')\]]*$")
_STARTERS = re.compile(r"^(The|This|That|Those|These|Who|When|What|Which|Where|Whose)$")
_BULLET = re.compile(r"^[\(\[]?([a-z]|[0-9]{1,2})[\).\]]$")
_TOKEN = re.compile(r"\S+")


_DOTTED_ACRONYM = re.compile(r"^([A-Za-z]\.){2,}[;:]$")


def _is_boundary(token: str, prev: str | None, nxt: str | None) -> bool:
    # dotted acronym followed by ; or : ends a sentence when the next token
    # is lowercase prose ("... or U.S.; these are ...") — approximates the
    # reference's NB layer
    if _DOTTED_ACRONYM.match(token) and nxt is not None and nxt[0].islower():
        return True
    core = token.rstrip("\"')]")
    if core.endswith(("!", "?")):
        return True
    if not _ENDS_DOT.match(token) and not token.endswith("."):
        return False
    stripped = core[:-1] if core.endswith(".") else core
    if prev is not None and (SAFE_ACRONYMS.search(prev) or SAFE_ABBRS.search(prev)):
        # "Fig. 2. They" — a dot-terminated NUMBER after a safe abbr still
        # closes the sentence when followed by a capitalized starter
        if (
            stripped.isdigit()
            and token.endswith(".")
            and nxt is not None
            and nxt[:1].isupper()
        ):
            return True
        return False
    if SAFE_ACRONYMS.search(stripped) or SAFE_ABBRS.search(core):
        return False
    return True


def split_sentences(text: str) -> list[tuple[int, int]]:
    """Char-offset sentence spans. Bullet blocks (introduced by a ``:`` line
    and itemized with ``a)`` / ``1)`` markers) stay in one sentence."""
    tokens = list(_TOKEN.finditer(text))
    if not tokens:
        return []
    bounds: list[int] = []  # token indices that END a sentence
    in_bullets = False
    for i, m in enumerate(tokens):
        tok = m.group(0)
        prev = tokens[i - 1].group(0) if i else None
        nxt = tokens[i + 1].group(0) if i + 1 < len(tokens) else None
        if tok.endswith(":"):
            # a colon followed by a bullet marker opens a bullet block
            if nxt is not None and _BULLET.match(nxt):
                in_bullets = True
            continue
        if in_bullets:
            # block ends at a '.'-terminated item NOT followed by a marker
            if tok.endswith(".") and (nxt is None or not _BULLET.match(nxt)):
                in_bullets = False
                bounds.append(i)
            continue
        if _is_boundary(tok, prev, nxt):
            bounds.append(i)
    spans = []
    start_tok = 0
    for b in bounds:
        spans.append((tokens[start_tok].start(), tokens[b].end()))
        start_tok = b + 1
    if start_tok < len(tokens):
        spans.append((tokens[start_tok].start(), tokens[-1].end()))
    # title-line pass: split a span before a special starter when the text
    # before it (within the span) has no sentence punctuation — e.g.
    # "Paragraph title The title was ..." → two sentences
    refined: list[tuple[int, int]] = []
    for s, e in spans:
        chunk = text[s:e]
        cut = None
        for m in re.finditer(r"\b(The|This|That|Those|These)\b", chunk):
            before = chunk[:m.start()]
            word_count = len(before.split())
            if 0 < word_count <= 4 and not re.search(r"[.!?:;]", before):
                cut = s + m.start()
                break
        if cut is not None and cut > s:
            refined.append((s, s + len(text[s:cut].rstrip())))
            refined.append((cut, e))
        else:
            refined.append((s, e))
    return refined


def split_sentences_nb(text: str, nb, thresh: float = 0.5) -> list[tuple[int, int]]:
    """NB re-rank layer (reference SentX: every rule-candidate fragment is
    classified by the Naive-Bayes model, ``sents/nbmodel.py:56-74``): a
    dot/!/?-bearing token closes a sentence iff the model predicts
    P(boundary) > ``thresh``. ``nb`` is an ``nbmodel.NBParams``."""
    from .nbmodel import clean_word
    tokens = list(_TOKEN.finditer(text))
    bounds: list[int] = []
    for i, m in enumerate(tokens):
        tok = m.group(0)
        core = tok.rstrip("\"')]")
        if not (_ENDS_DOT.match(tok) or core.endswith(("!", "?"))):
            continue
        nxt = tokens[i + 1].group(0) if i + 1 < len(tokens) else ""
        if nb.classify(clean_word(tok), clean_word(nxt)) > thresh:
            bounds.append(i)
    spans = []
    start_tok = 0
    for b in bounds:
        spans.append((tokens[start_tok].start(), tokens[b].end()))
        start_tok = b + 1
    if start_tok < len(tokens):
        spans.append((tokens[start_tok].start(), tokens[-1].end()))
    return spans


def sent_stage(df, id_col: str = "doc_id", text_col: str = "text"):
    """Spark stage: one row per sentence with char offsets."""
    import pandas as pd

    out_schema = (
        f"id {df.schema[id_col].dataType.simpleString()}, sent_idx int,"
        " start int, end int, sentence string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"id": [], "sent_idx": [], "start": [], "end": [],
                    "sentence": []}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                for idx, (s, e) in enumerate(split_sentences(text)):
                    rows["id"].append(did)
                    rows["sent_idx"].append(idx)
                    rows["start"].append(s)
                    rows["end"].append(e)
                    rows["sentence"].append(text[s:e])
            yield pd.DataFrame(rows)

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)
