"""Token-pattern compiler (driver-side).

Reference parity: spikex ``matcher/matcher.py:356-573`` compiles token
patterns into per-attribute regexes at ``add()`` time (compile-once) and the
pattern schema of ``matcher/_schemas.py``. We keep the same surface — a
pattern is a list of token specs, each a dict of

* attributes (full reference schema, ``_schemas.py:83-207``):
  ``ORTH``/``TEXT``, ``LOWER``, ``LEMMA``, ``NORM``, ``POS``, ``TAG``,
  ``DEP``, ``SHAPE``, ``ENT_TYPE``, ``LENGTH``, the ``IS_*`` booleans
  (``ALPHA ASCII DIGIT LOWER UPPER TITLE PUNCT SPACE BRACKET QUOTE
  LEFT_PUNCT RIGHT_PUNCT CURRENCY STOP SENT_START``), ``SENT_START``
  (alias of ``IS_SENT_START``), ``LIKE_NUM``/``LIKE_URL``/``LIKE_EMAIL``,
  ``REGEX`` (bare, over the token text), ``_`` (extension dict).
  Annotation-dependent attrs (``LEMMA POS TAG DEP ENT_TYPE NORM IS_STOP
  IS_SENT_START``) are read from the token dicts when provided upstream;
  text-derivable ones are computed in the engine,
* values: literal, or predicate dict ``{IN, NOT_IN, REGEX, ==, !=, >=,
  <=, >, <}`` (spikex ``matcher.py:413-415, 496-573``),
* ``OP``: ``!``(negated single), ``?``, ``1``/absent, ``+``, ``*``.

Compilation output is a plain-python spec (picklable → broadcast into the
Arrow matcher stage): per token spec a list of (attr, kind, value)
predicates with REGEX pre-compiled.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

TOKEN_ATTRS = {
    "ORTH", "TEXT", "LOWER", "LEMMA", "NORM", "POS", "TAG", "DEP", "SHAPE",
    "ENT_TYPE", "LENGTH",
    "IS_ALPHA", "IS_ASCII", "IS_DIGIT", "IS_LOWER", "IS_UPPER", "IS_TITLE",
    "IS_PUNCT", "IS_SPACE", "IS_BRACKET", "IS_QUOTE", "IS_LEFT_PUNCT",
    "IS_RIGHT_PUNCT", "IS_CURRENCY", "IS_STOP", "IS_SENT_START",
    "SENT_START", "LIKE_NUM", "LIKE_URL", "LIKE_EMAIL", "REGEX", "_",
}
# reference _schemas.py:141-207: boolean_value attrs take a bare bool only
# (no predicate dict) — flag dicts for these at validation time
BOOL_ATTRS = {
    "IS_ALPHA", "IS_ASCII", "IS_DIGIT", "IS_LOWER", "IS_UPPER", "IS_TITLE",
    "IS_PUNCT", "IS_SPACE", "IS_BRACKET", "IS_QUOTE", "IS_LEFT_PUNCT",
    "IS_RIGHT_PUNCT", "IS_CURRENCY", "IS_STOP", "IS_SENT_START",
    "SENT_START", "LIKE_NUM", "LIKE_URL", "LIKE_EMAIL",
}
OPS = {"!", "?", "+", "*", "1"}
PREDICATES = {"IN", "NOT_IN", "REGEX", "==", "!=", ">=", "<=", ">", "<"}


@dataclass(frozen=True)
class Predicate:
    attr: str          # token attribute name (or extension name)
    kind: str          # "eq" | "in" | "not_in" | "regex" | cmp ops
    value: object
    is_extension: bool = False


@dataclass(frozen=True)
class TokenSpec:
    predicates: tuple = ()
    op: str = "1"      # normalized quantifier
    negated: bool = False  # OP "!"


@dataclass(frozen=True)
class CompiledPattern:
    key: str
    specs: tuple = ()


@dataclass
class CompiledSpec:
    patterns: list = field(default_factory=list)

    def keys(self) -> list[str]:
        seen: dict[str, None] = {}
        for p in self.patterns:
            seen.setdefault(p.key)
        return list(seen)


class PatternValidationError(ValueError):
    pass


def _compile_value(attr: str, value, is_ext: bool = False) -> list[Predicate]:
    if isinstance(value, dict):
        preds = []
        for pk, pv in value.items():
            if pk not in PREDICATES:
                raise PatternValidationError(
                    f"unknown predicate {pk!r} for attr {attr!r}"
                )
            if pk == "IN":
                if not isinstance(pv, (list, tuple)):
                    raise PatternValidationError("IN expects a list")
                preds.append(Predicate(attr, "in", frozenset(pv), is_ext))
            elif pk == "NOT_IN":
                if not isinstance(pv, (list, tuple)):
                    raise PatternValidationError("NOT_IN expects a list")
                preds.append(Predicate(attr, "not_in", frozenset(pv), is_ext))
            elif pk == "REGEX":
                preds.append(Predicate(attr, "regex", re.compile(str(pv)), is_ext))
            else:
                if not isinstance(pv, (int, float)):
                    raise PatternValidationError(f"{pk} expects a number")
                preds.append(Predicate(attr, pk, pv, is_ext))
        return preds
    return [Predicate(attr, "eq", value, is_ext)]


def validate_pattern(pattern: list[dict]) -> list[str]:
    """Return a list of error strings (reference: 20+ validation cases in
    ``tests/matcher/test_pattern_validation.py``); empty = valid."""
    errors = []
    if not isinstance(pattern, (list, tuple)) or not pattern:
        return ["pattern must be a non-empty list of dicts"]
    for i, spec in enumerate(pattern):
        if not isinstance(spec, dict):
            errors.append(f"token {i}: spec must be a dict")
            continue
        for k, v in spec.items():
            ku = k.upper() if isinstance(k, str) else k
            if ku == "OP":
                if v not in OPS:
                    errors.append(f"token {i}: bad OP {v!r}")
            elif ku == "_":
                if not isinstance(v, dict):
                    errors.append(f"token {i}: '_' must be a dict")
                else:
                    for ext_name, ext_val in v.items():
                        if not isinstance(ext_val, dict):
                            continue
                        for pk, pv in ext_val.items():
                            if pk not in PREDICATES:
                                errors.append(
                                    f"token {i}: unknown predicate {pk!r} "
                                    f"for extension {ext_name!r}")
                            elif pk in ("IN", "NOT_IN") and not isinstance(
                                    pv, (list, tuple)):
                                errors.append(
                                    f"token {i}: {pk} expects a list for "
                                    f"extension {ext_name!r}")
            elif ku not in TOKEN_ATTRS:
                errors.append(f"token {i}: unknown attr {k!r}")
            elif ku == "LENGTH":
                if isinstance(v, bool) or not isinstance(v, (int, dict)):
                    errors.append(f"token {i}: LENGTH expects int or predicate")
            elif ku in BOOL_ATTRS:
                if not isinstance(v, bool):
                    errors.append(f"token {i}: {ku} expects bool")
            else:
                if not isinstance(v, (str, dict)):
                    errors.append(f"token {i}: {ku} expects str or predicate")
            if ku not in ("OP", "_") and isinstance(v, dict):
                for pk, pv in v.items():
                    if pk not in PREDICATES:
                        errors.append(f"token {i}: unknown predicate {pk!r}")
                    elif pk in ("IN", "NOT_IN") and not isinstance(
                            pv, (list, tuple)):
                        errors.append(f"token {i}: {pk} expects a list")
    return errors


def compile_token_spec(spec: dict) -> TokenSpec:
    preds: list[Predicate] = []
    op = "1"
    negated = False
    for k, v in spec.items():
        ku = k.upper() if isinstance(k, str) else k
        if ku == "OP":
            if v == "!":
                negated = True
            else:
                op = v
            continue
        if ku == "_":
            for ext_name, ext_val in v.items():
                preds.extend(_compile_value(ext_name, ext_val, is_ext=True))
            continue
        if ku == "TEXT":
            ku = "ORTH"
        if ku == "SENT_START":  # schema alias (reference _schemas.py:192-199)
            ku = "IS_SENT_START"
        if ku == "REGEX" and isinstance(v, str):
            # bare token-level REGEX searches the token text
            preds.append(Predicate("ORTH", "regex", re.compile(v)))
            continue
        preds.extend(_compile_value(ku, v))
    return TokenSpec(predicates=tuple(preds), op=op, negated=negated)


def compile_patterns(patterns: dict[str, list[list[dict]]]) -> CompiledSpec:
    """{key: [pattern, ...]} -> CompiledSpec; raises on invalid patterns."""
    out = CompiledSpec()
    for key, plist in patterns.items():
        for pattern in plist:
            errors = validate_pattern(pattern)
            if errors:
                raise PatternValidationError(f"{key}: " + "; ".join(errors))
            specs = tuple(compile_token_spec(s) for s in pattern)
            out.patterns.append(CompiledPattern(key=key, specs=specs))
    return out
