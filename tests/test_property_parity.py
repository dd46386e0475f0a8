"""Property-based Python↔DuckDB parity for the shared oracle conventions.

Every oracle mirror in ``__spark_entry__`` leans on bit-exact agreement
between this repo's Python/Catalyst implementations and DuckDB's built-ins
(Jaro-Winkler, the word-strip normalization, the tokenizer). These fuzz
that contract directly — no Spark session needed — so a drift in either
side fails here before it fails the driver gate.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from hypothesis import example, given, settings
from hypothesis import strategies as st

from spikex_spark.textutils import jaro_winkler, norm_title_key, tokenize

_CON = duckdb.connect()

# printable ASCII; the engine's key space is lowercase alnum, but the
# functions must agree on arbitrary input
_ascii = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
)


@settings(max_examples=300, deadline=None)
@given(_ascii, _ascii)
def test_jaro_winkler_matches_duckdb(a: str, b: str) -> None:
    """scoring.jaro_winkler_udf's kernel is calibrated to DuckDB's
    jaro_winkler_similarity — the er_* oracles assume bit-equality."""
    got = jaro_winkler(a, b)
    want = _CON.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]
    ).fetchone()[0]
    assert got == pytest.approx(want, abs=0.0), (a, b)


# mirror of the normalization the VALUES-based oracles apply driver-side
# (__spark_entry__._title_keys_values_sql.norm_tokens)
def _py_norm_ws(s: str) -> str:
    toks = [re.sub(r"[^a-z0-9]+", "", t.lower()) for t in re.split(r"[_ ]+", s)]
    return " ".join(t for t in toks if t)


# keep in sync with __spark_entry__._SQL_NORM_WS (coalesce: DuckDB
# array_to_string over an empty list returns NULL, Spark array_join '')
_SQL_NORM_WS = (
    "coalesce(array_to_string(list_filter(list_transform("
    "regexp_split_to_array(lower(s), '[_ ]+'),"
    " t -> regexp_replace(t, '[^a-z0-9]+', '', 'g')), t -> t <> ''), ' '), '')"
)


@settings(max_examples=300, deadline=None)
@given(_ascii)
def test_norm_ws_matches_duckdb(s: str) -> None:
    """blocking._norm_tokens convention == the oracle's _SQL_NORM_WS."""
    want = _CON.execute(
        f"SELECT {_SQL_NORM_WS} FROM (SELECT ? AS s)", [s]
    ).fetchone()[0]
    assert _py_norm_ws(s) == want, s


@settings(max_examples=300, deadline=None)
@given(_ascii)
def test_tokenize_matches_duckdb(s: str) -> None:
    """textutils.tokenize == the oracle's _SQL_TOKENS_ALL token list."""
    want = _CON.execute(
        "SELECT list_filter(regexp_split_to_array(lower(s), '[^a-z0-9]+'),"
        " t -> t <> '') FROM (SELECT ? AS s)",
        [s],
    ).fetchone()[0]
    assert tokenize(s) == want, s


@settings(max_examples=200, deadline=None)
@given(_ascii)
def test_norm_title_key_idempotent(s: str) -> None:
    """Key-space normalization is idempotent — keys of keys are keys."""
    k = norm_title_key(s)
    assert norm_title_key(k) == k


# tokens like the matcher sees: no whitespace
_token = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), max_size=12
)


@settings(max_examples=500, deadline=None)
@example('42')
@example('3.14')
@example('1,000')
@example('2/3')
@example('seven')
@example('12.3.4')
@example('5.')
@example('.5')
@example('.,5')
@example('5..2')
@example('1/2/3')
@example(',')
@example('.')
@given(_token)
def test_like_num_matches_matcher_oracle_sql(tok: str) -> None:
    """engine.like_num == the NUMBERED predicate in the matcher oracle
    (__spark_entry__._SQL_MATCHER) for arbitrary tokens."""
    from spikex_spark.matcher.engine import _NUM_WORDS, like_num

    want = _CON.execute(
        "SELECT regexp_full_match(replace(?, ',', ''),"
        " '([0-9]+\\.?[0-9]*|\\.[0-9]+)')"
        " OR regexp_full_match(?, '[0-9]+/[0-9]+')"
        " OR list_contains(?, lower(?))",
        [tok, tok, sorted(_NUM_WORDS), tok],
    ).fetchone()[0]
    assert like_num(tok) == bool(want), tok


# --- fused-scan nested-mode parity (pure Python, no Spark) -------------------

_SCAN_VOCAB = ["a", "b", "ab", "ba", "x", "-", "A,"]


def _scan_oracle(text: str, keys: frozenset, max_n: int):
    """Independent restatement of the JOIN-path semantics: enumerate ALL
    key-matching n-grams, longest-match window (O2/O4), then a containment
    join of the raw hits against kept spans (mentions_nested)."""
    import re

    raw = [t for t in re.split(r"[_ ]+", text) if t]
    norm = [re.sub(r"[^a-z0-9]+", "", t.lower()) for t in raw]
    hits = []
    for i in range(len(raw)):
        for n in range(1, min(max_n, len(raw) - i) + 1):
            key = " ".join(norm[i:i + n])
            if key and key in keys:
                hits.append((i + 1, n, " ".join(raw[i:i + n]), key))
    kept = []
    for start, n, surface, key in sorted(hits, key=lambda m: (m[0], -m[1])):
        if all(start + n > k[0] + k[1] for k in kept):
            kept.append((start, n, surface, key))
    nested = {
        h for h in hits
        for (ts, tn, _, _) in kept
        if ts <= h[0] and h[0] + h[1] <= ts + tn
        and (h[0] > ts or h[0] + h[1] < ts + tn)
    }
    return ({(s, n, sf, k, False) for s, n, sf, k in kept}
            | {(s, n, sf, k, True) for s, n, sf, k in nested})


@settings(max_examples=300, deadline=None)
@given(
    toks=st.lists(st.sampled_from(_SCAN_VOCAB), min_size=0, max_size=14),
    keyseqs=st.lists(
        st.lists(st.sampled_from(_SCAN_VOCAB), min_size=1, max_size=3),
        min_size=0, max_size=8),
)
def test_scan_doc_nested_matches_join_semantics(toks, keyseqs) -> None:
    import re

    from spikex_spark.operators.blocking import _first_token_index, _scan_doc

    text = " ".join(toks)
    # keys as title_keys builds them: join of the NON-EMPTY normalized
    # tokens (empty components are filtered before the join)
    keys = frozenset(
        k for k in (
            " ".join(w for w in
                     (re.sub(r"[^a-z0-9]+", "", t.lower()) for t in seq)
                     if w)
            for seq in keyseqs
        ) if k
    )
    got = set(_scan_doc(text, keys, _first_token_index(keys), 4, nested=True))
    assert got == _scan_oracle(text, keys, 4)


# --- codec round-trip properties (hypothesis-fuzzed) --------------------------

@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=500),
    ch=st.integers(min_value=1, max_value=3),
    rate=st.sampled_from([8000, 11025, 16000, 44100]),
    bits=st.sampled_from([8, 16, 32]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, bits, seed) -> None:
    import numpy as np

    from spikex_spark.multimodal import decode_wav, encode_wav

    rng = np.random.RandomState(seed)
    sig = (rng.rand(n, ch) * 2.0 - 1.0) * rng.rand()  # varied amplitude
    dec, got_rate = decode_wav(encode_wav(sig, rate, bits=bits))
    assert got_rate == rate and dec.shape == (n, ch)
    # quantization error bounded by half a step at the encode depth
    tol = {8: 1 / 250, 16: 1 / 60000, 32: 2e-7}[bits]
    assert float(np.max(np.abs(dec - sig))) <= tol


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    ncolors=st.integers(min_value=1, max_value=256),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_roundtrip_property(h, w, ncolors, seed) -> None:
    import numpy as np

    from spikex_spark.gif import decode_gif, encode_gif

    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, (ncolors, 3), dtype=np.uint8)
    img = palette[rng.randint(0, ncolors, (h, w))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


@settings(max_examples=40, deadline=None)
@given(
    dur=st.integers(min_value=0, max_value=10_000_000),
    ts=st.sampled_from([600, 1000, 90000, 48000]),
    ntracks=st.integers(min_value=0, max_value=12),
    brand=st.sampled_from([b"isom", b"mp42", b"avc1", b"dash"]),
)
def test_mp4_meta_roundtrip_property(dur, ts, ntracks, brand) -> None:
    from spikex_spark.multimodal import encode_mp4_stub, parse_mp4_meta

    # duration snapped to whole timescale units so the ms round-trip is exact
    dur -= dur % 1000
    m = parse_mp4_meta(encode_mp4_stub(dur, timescale=ts, n_tracks=ntracks,
                                       brand=brand))
    assert m == {"brand": brand.decode(), "duration_ms": dur,
                 "timescale": ts, "n_tracks": ntracks}
