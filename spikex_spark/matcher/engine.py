"""Token-pattern matching engine (pure Python — runs inside Arrow batches).

Execution strategy (re-expressed, NOT the reference's attribute-regex trick):
for each pattern, build the boolean match matrix M[i][j] = "token i satisfies
spec j", intern each token's match-vector as one synthetic character, and run
a real ``re`` pattern (character classes + the spec quantifiers) with
``re.match`` anchored at EVERY start position. That yields the reference's
observable semantics:

* greedy quantifiers (re-consistent; the reference's own divergences from
  ``re`` are marked xfail in its suite — we follow ``re``),
* overlapped candidates per start (reference uses ``finditer(overlapped=
  True)``, ``matcher/matcher.py:267``),
* leftmost-longest submatch filtering (``matcher.py:341-353``): per end keep
  the earliest start,
* dedup of identical (key, start, end) across patterns
  (``matcher.py:228-234``).

Matches are token-index spans ``(key, start, end)`` sorted by (start, end).
"""

from __future__ import annotations

import re

from .compiler import CompiledSpec, Predicate, TokenSpec, compile_patterns

_NUM_WORDS = {
    "zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
    "sixteen", "seventeen", "eighteen", "nineteen", "twenty", "thirty",
    "forty", "fifty", "sixty", "seventy", "eighty", "ninety", "hundred",
    "thousand", "million", "billion", "trillion",
}


# character classes for the IS_BRACKET/IS_QUOTE/IS_LEFT_PUNCT/
# IS_RIGHT_PUNCT derivations (spaCy-style sets, re-expressed; reference
# accepts these attrs via _schemas.py:141-190 and delegates the
# definitions to the tokenizer's language data)
_BRACKETS = set("()[]{}<>") | set("「」『』（）〔〕【】《》〈〉")
_QUOTES = set("'\"`´‘’‚“”„»«‹›")
_LEFT_PUNCT = set("([{<") | set("「『（〔【《〈") | set("“‘«‹„‚")
_RIGHT_PUNCT = set(")]}>") | set("」』）〕】》〉") | set("”’»›")
# explicit symbol set (spaCy-style language data, not unicodedata Sc) so
# the SQL oracle can mirror it as a literal character class
_CURRENCY = set("$¢£¤¥֏؋฿₠₡₢₣₤₥₦₧₨₩₪₫€₭₮₯₰₱₲₳₴₵₶₷₸₹₺₻₼₽₾₿﷼￠￡￥￦")

# non-verbose, RE2-compatible pattern strings so the SQL oracles can
# reuse them verbatim (regexp_full_match anchors; Python adds ^…$):
# explicit scheme | www. prefix | bare domain with a common TLD
LIKE_URL_PATTERN = (
    r"(?:https?|ftp)://\S+"
    r"|www\.\w[\w.-]*\.\w{2,}(?:/\S*)?"
    r"|\w[\w.-]*\.(?:com|org|net|edu|gov|io|co|uk|de|fr|jp|cn|ru|br|in)"
    r"(?:/\S*)?")
LIKE_EMAIL_PATTERN = r"[\w.+-]+@[\w-]+(?:\.[\w-]+)+"
_LIKE_URL_RX = re.compile(f"(?i)^(?:{LIKE_URL_PATTERN})$")
_LIKE_EMAIL_RX = re.compile(f"^(?:{LIKE_EMAIL_PATTERN})$")


def like_url(text: str) -> bool:
    return bool(_LIKE_URL_RX.match(text))


def like_email(text: str) -> bool:
    return bool(_LIKE_EMAIL_RX.match(text))


def word_shape(text: str) -> str:
    """spaCy-compatible shape: x/X/d classes, runs capped at 4."""
    out = []
    last = ""
    run = 0
    for ch in text:
        if ch.isdigit():
            c = "d"
        elif ch.isalpha():
            c = "X" if ch.isupper() else "x"
        else:
            c = ch
        if c == last:
            run += 1
        else:
            run = 1
            last = c
        if run <= 4:
            out.append(c)
    return "".join(out)


def like_num(text: str) -> bool:
    t = text.replace(",", "").replace(".", "", 1)
    if t.isdigit():
        return True
    if "/" in text:
        a, _, b = text.partition("/")
        return a.isdigit() and b.isdigit()
    return text.lower() in _NUM_WORDS


def token_attr(tok: dict, attr: str):
    """Resolve an attribute for a token dict (computed attrs derived from
    text when absent — LEMMA/POS/TAG/DEP must be provided upstream)."""
    if attr in tok:
        return tok[attr]
    text = tok.get("ORTH", tok.get("text", ""))
    if attr == "ORTH":
        return text
    if attr == "LOWER":
        return text.lower()
    if attr == "LENGTH":
        return len(text)
    if attr == "SHAPE":
        return word_shape(text)
    if attr == "IS_ALPHA":
        return text.isalpha()
    if attr == "IS_DIGIT":
        return text.isdigit()
    if attr == "IS_LOWER":
        return text.islower()
    if attr == "IS_UPPER":
        return text.isupper()
    if attr == "IS_TITLE":
        return text.istitle()
    if attr == "IS_PUNCT":
        return bool(text) and all(not c.isalnum() and not c.isspace() for c in text)
    if attr == "IS_SPACE":
        return bool(text) and text.isspace()
    if attr == "IS_STOP":
        return bool(tok.get("IS_STOP", False))
    if attr == "IS_ASCII":
        return text.isascii()
    if attr == "IS_BRACKET":
        return bool(text) and all(c in _BRACKETS for c in text)
    if attr == "IS_QUOTE":
        return bool(text) and all(c in _QUOTES for c in text)
    if attr == "IS_LEFT_PUNCT":
        return bool(text) and all(c in _LEFT_PUNCT for c in text)
    if attr == "IS_RIGHT_PUNCT":
        return bool(text) and all(c in _RIGHT_PUNCT for c in text)
    if attr == "IS_CURRENCY":
        return bool(text) and all(c in _CURRENCY for c in text)
    if attr == "IS_SENT_START":
        # annotation-dependent: read from the token dict (either spelling)
        return bool(tok.get("SENT_START", tok.get("IS_SENT_START", False)))
    if attr == "NORM":
        # spaCy default norm is the lowercase form absent an exception
        # table; annotated dicts may override via a NORM key (caught above)
        return text.lower()
    if attr == "ENT_TYPE":
        return tok.get("ENT_TYPE", "")
    if attr == "LIKE_NUM":
        return like_num(text)
    if attr == "LIKE_URL":
        return like_url(text)
    if attr == "LIKE_EMAIL":
        return like_email(text)
    if attr == "REGEX":
        return text
    return tok.get(attr)


def _pred_ok(tok: dict, p: Predicate) -> bool:
    if p.is_extension:
        ext = tok.get("_", {}) or {}
        val = ext.get(p.attr)
    else:
        val = token_attr(tok, p.attr)
    if p.kind == "eq":
        return val == p.value
    if p.kind == "in":
        return val in p.value
    if p.kind == "not_in":
        return val not in p.value
    if p.kind == "regex":
        return val is not None and p.value.search(str(val)) is not None
    if val is None:
        return False
    try:
        if p.kind == "==":
            return val == p.value
        if p.kind == "!=":
            return val != p.value
        if p.kind == ">=":
            return val >= p.value
        if p.kind == "<=":
            return val <= p.value
        if p.kind == ">":
            return val > p.value
        if p.kind == "<":
            return val < p.value
    except TypeError:
        return False
    return False


def _spec_ok(tok: dict, spec: TokenSpec) -> bool:
    ok = all(_pred_ok(tok, p) for p in spec.predicates)
    return (not ok) if spec.negated else ok


_OP_SUFFIX = {"1": "", "?": "?", "+": "+", "*": "*"}

# private-use unicode plane for interned match-vector symbols
_SYM_BASE = 0xE000


def _match_pattern(tokens: list[dict], specs: tuple) -> list[tuple]:
    """All (start, end) spans: greedy re.match at every start position."""
    nspec = len(specs)
    if nspec == 0 or not tokens:
        return []
    # match matrix -> interned symbol per token
    vec2sym: dict[tuple, str] = {}
    symbols: list[str] = []
    sym_members: list[set] = [set() for _ in range(nspec)]
    for tok in tokens:
        vec = tuple(_spec_ok(tok, s) for s in specs)
        sym = vec2sym.get(vec)
        if sym is None:
            sym = chr(_SYM_BASE + len(vec2sym))
            vec2sym[vec] = sym
            for j, ok in enumerate(vec):
                if ok:
                    sym_members[j].add(sym)
        symbols.append(sym)
    text = "".join(symbols)
    parts = []
    for j, spec in enumerate(specs):
        members = sym_members[j]
        if not members:
            if spec.op in ("?", "*"):
                continue  # zero-width satisfiable
            return []
        cls = "[" + "".join(sorted(members)) + "]"
        parts.append(cls + _OP_SUFFIX.get(spec.op, ""))
    if not parts:
        return []
    rx = re.compile("".join(parts))
    out = []
    for start in range(len(tokens)):
        m = rx.match(text, start)
        if m and m.end() > m.start():
            out.append((start, m.end()))
    return out


def match_doc(spec: CompiledSpec, tokens: list[dict]) -> list[tuple]:
    """(key, start, end) matches for one doc, reference post-processing."""
    raw: set[tuple] = set()
    for pat in spec.patterns:
        for start, end in _match_pattern(tokens, pat.specs):
            raw.add((pat.key, start, end))
    # leftmost-longest: per (key, end) keep the earliest start
    best: dict[tuple, int] = {}
    for key, start, end in raw:
        k = (key, end)
        if k not in best or start < best[k]:
            best[k] = start
    out = [(key, start, end) for (key, end), start in best.items()]
    out.sort(key=lambda m: (m[1], m[2], m[0]))
    return out


def simple_tokenize(text: str) -> list[dict]:
    """Whitespace tokenizer producing token dicts with char offsets.

    (The reference matcher tests build docs from ``text.split()`` — this is
    the parity tokenizer for the matcher API.)"""
    toks = []
    for m in re.finditer(r"\S+", text):
        toks.append({"ORTH": m.group(0), "idx": m.start()})
    return toks


_OPEN_PUNCT = set("([{\"'“‘")
_CLOSE_PUNCT = set(")]}\"'.,;:!?”’")


def punct_tokenize(text: str) -> list[dict]:
    """spaCy-ish tokenizer: leading/trailing punctuation split into their own
    tokens (``(abs)`` → ``(``, ``abs``, ``)``). Used by the label/abbr
    pipes, whose reference tests run on spaCy tokenization."""
    toks = []
    for m in re.finditer(r"\S+", text):
        chunk, base = m.group(0), m.start()
        start, end = 0, len(chunk)
        lead = []
        while start < end and chunk[start] in _OPEN_PUNCT:
            lead.append((chunk[start], base + start))
            start += 1
        trail = []
        while end > start and chunk[end - 1] in _CLOSE_PUNCT:
            trail.append((chunk[end - 1], base + end - 1))
            end -= 1
        for ch, idx in lead:
            toks.append({"ORTH": ch, "idx": idx})
        if end > start:
            toks.append({"ORTH": chunk[start:end], "idx": base + start})
        for ch, idx in reversed(trail):
            toks.append({"ORTH": ch, "idx": idx})
    return toks


class Matcher:
    """Single-node API mirroring the reference Matcher (add/remove/get/
    __len__/__contains__/__call__) — used by tests and as the driver-side
    object whose compiled spec broadcasts into the Spark stage."""

    def __init__(self) -> None:
        self._patterns: dict[str, list[list[dict]]] = {}

    def __len__(self) -> int:
        return len(self._patterns)

    def __contains__(self, key: str) -> bool:
        return key in self._patterns

    def add(self, key: str, patterns: list[list[dict]]) -> None:
        compile_patterns({key: patterns})  # validate eagerly
        self._patterns.setdefault(key, []).extend(patterns)

    def remove(self, key: str) -> None:
        del self._patterns[key]

    def get(self, key: str):
        return (None, self._patterns.get(key, []))

    @property
    def compiled(self) -> CompiledSpec:
        return compile_patterns(self._patterns)

    def __call__(self, tokens_or_text) -> list[tuple]:
        tokens = (
            simple_tokenize(tokens_or_text)
            if isinstance(tokens_or_text, str)
            else tokens_or_text
        )
        return match_doc(self.compiled, tokens)
