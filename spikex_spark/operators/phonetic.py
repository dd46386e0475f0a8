"""Phonetic blocking keys — Soundex (Odell–Russell) with the h/w rule.

The third classic blocking channel beside key-collision hashing
(``blocking.title_keys``) and sort-order neighborhoods (``snm``):
phonetic codes collide records whose surface forms SOUND alike
(Burroughs/Burrows, Ashcraft/Ashcroft) — misspellings the other two
channels miss when the variation hits the key head.

Spark ships ``F.soundex`` (JVM expression, whole-stage codegen); this
module standardizes HOW it is applied — lowercase alphabetic tokens
only, first ``n_tokens`` per document, codes joined with ``-`` — so
the key is reproducible in plain SQL. Spark's implementation follows
the full American Soundex including the h/w transparency rule (letters
with equal codes separated by h/w collapse; separated by vowels they
repeat), pinned by the classics in ``tests/test_er_toolchain.py``:
Ashcraft→A261, Tymczak→T522, Pfister→P236, Honeyman→H555, White→W300.

The DuckDB oracle reproduces it closed-form (no per-char state
machine): map letters to codes with h/w deleted FIRST, adjacent-dedup
the remaining code string (an indexed list_filter), drop the leading
code unless the word starts with h/w (whose code was deleted), strip
vowel zeros, pad to 3 — algebraically equivalent to the standard
scan-with-last-code loop.

Scale shape: a pure narrow map (split + slice + codegen'd soundex),
zero shuffles; the key lands in whatever blocking join consumes it.

Reference parity: beyond-reference ER toolchain (SURVEY.md §2.11) —
spikex's detector is dictionary-exact and has no phonetic channel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def soundex_blocking_keys(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          n_tokens: int = 3) -> DataFrame:
    """(id, phonetic_key): Soundex codes of the first ``n_tokens``
    alphabetic tokens joined with ``-`` (documents with no alphabetic
    token key to ``''``)."""
    alpha = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z]+"),
                     lambda t: t != "")
    key = F.array_join(
        F.transform(F.slice(alpha, 1, n_tokens), F.soundex), "-")
    return df.select(F.col(id_col).alias("id"),
                     key.alias("phonetic_key"))


def suffix_blocking_keys(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", key_len: int = 16,
                         min_suffix: int = 8,
                         max_block: int | None = None) -> DataFrame:
    """(id, suffix): suffix-array blocking (Christen's suffix blocking),
    the truncation/OCR-robust fourth blocking channel beside n-gram,
    MinHash/LSH and Soundex — records whose keys differ only in a
    corrupted PREFIX ('smith' vs '_mith') still share every suffix of
    length ≥ ``min_suffix``.

    The blocking key is the first ``key_len`` chars of the
    alphanumeric-normalized text; every suffix with at least
    ``min_suffix`` chars is emitted (a one-explode narrow map — the
    suffixes of one key are all distinct, no dedup needed). With
    ``max_block`` set, suffix blocks larger than it are dropped whole —
    high-frequency tails are boilerplate, not identity evidence (the
    metablocking block-purging rule, applied identically by the oracle).
    """
    nk = F.substring(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", ""),
        1, key_len)
    base = (df.select(F.col(id_col).alias("id"), nk.alias("nk"))
            .where(F.length("nk") >= min_suffix))
    sfx = base.select(
        "id",
        F.explode(F.transform(
            F.sequence(F.lit(1), F.length("nk") - F.lit(min_suffix - 1)),
            lambda i: F.col("nk").substr(i, F.length("nk")))).alias("suffix"))
    if max_block is None:
        return sfx
    sizes = (sfx.groupBy("suffix").agg(F.count(F.lit(1)).alias("_n"))
             .where(F.col("_n") <= max_block).select("suffix"))
    return sfx.join(sizes, "suffix").select("id", "suffix")
