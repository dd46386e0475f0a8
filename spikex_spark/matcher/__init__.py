from .compiler import compile_patterns, validate_pattern
from .engine import Matcher, match_doc
from .stage import match_patterns

__all__ = [
    "Matcher",
    "compile_patterns",
    "match_doc",
    "match_patterns",
    "validate_pattern",
]
