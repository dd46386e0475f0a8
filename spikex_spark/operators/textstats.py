"""Text analysis operators for training-data pipelines.

All pure Catalyst (whole-stage codegen) — no Python in the hot path:

* language-ID: stopword-hit heuristic over a small inline lexicon.
* quality score: length / punctuation-ratio / stopword-ratio features.
* token counting: whitespace tokens + a BPE-ish subword regex estimate.
* document fingerprint: md5 of the normalized text (content-defined id).

Each has an exact DuckDB oracle (see __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lexicons (top function words) — enough to
# separate the synthetic corpus langs; a real deployment swaps in fastText.
# ASCII-only stopword lists (the tokenizer strips non-[a-z0-9], so accented
# forms would never match); ten Latin-script languages
STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "that", "for", "with", "as"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
    "it": ["il", "di", "che", "la", "per", "con", "non", "una", "del", "sono"],
    "pt": ["de", "que", "o", "da", "em", "do", "uma", "os", "como", "mais"],
    "nl": ["de", "het", "een", "van", "en", "dat", "niet", "met", "voor", "zijn"],
    "sv": ["och", "att", "det", "som", "av", "den", "till", "har", "inte", "ett"],
    "pl": ["nie", "jest", "to", "na", "do", "jak", "ale", "czy", "tak", "jego"],
    "tr": ["bir", "ve", "bu", "da", "ne", "gibi", "daha", "sonra", "kadar", "ile"],
}


def _tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != "")


def language_id(df: DataFrame, id_col: str, text_col: str,
                keep: tuple = ()) -> DataFrame:
    """(id, [*keep,] lang_guess, lang_hits): language with most stopword
    hits; deterministic tie-break on language code; 'und' when zero hits.
    ``keep`` passes extra columns through untouched — the projection is
    narrow either way, so batch and STREAMING callers (which cannot
    re-join their own stream) share it."""
    # materialize the token array once — inlining it makes Catalyst
    # re-tokenize per language (see blocking.shingle_df note)
    tokd = df.select(F.col(id_col).alias("id"),
                     *[F.col(c) for c in keep],
                     _tokens(F.col(text_col)).alias("_toks"))
    # SQL-string construction (one selectExpr round-trip instead of ~250
    # py4j calls for 10 langs x filter-lambda structs — ~0.15 s of
    # driver-side build per timed rep); parses to the identical Catalyst
    # nodes, values oracle-pinned
    structs = ", ".join(
        "struct(size(filter(_toks, t -> array_contains(array("
        + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "), t))) as hits, "
        + f"'{lang}' as lang)"
        for lang in sorted(STOPWORDS)
    )
    best = f"array_max(array({structs}))"
    return tokd.selectExpr(
        "id",
        *[f"`{c}`" for c in keep],
        f"CASE WHEN {best}.hits > 0 THEN {best}.lang ELSE 'und' END"
        " as lang_guess",
        f"{best}.hits as lang_hits",
    )


def quality_score(df: DataFrame, id_col: str, text_col: str,
                  keep: tuple = ()) -> DataFrame:
    """(id, [*keep,] n_chars, n_tokens, punct_ratio, stopword_ratio,
    quality).

    quality ∈ [0,1]: 0.4·length_ok + 0.3·(1-punct_ratio) + 0.3·stopword_sat,
    the standard cheap pre-filter shape for web-corpus curation.
    ``keep`` passes extra columns through (see language_id).

    Staged projections (the language_id pattern): each costly
    subexpression — the tokenize chain, the punct regexp, the stopword
    hit count — materializes in its OWN projection and downstream ratios
    reference the column. Inlined lambda subtrees defeat Catalyst CSE
    (fresh lambda-variable ids per occurrence), so the single-select form
    re-tokenized every row SIX times and ran the regexp twice (read the
    old plan's Project node); arithmetic is unchanged expression-for-
    expression, so values are bit-identical.
    """
    text = F.col(text_col)
    # punct count via translate (delete the [a-zA-Z0-9 ] set, count what
    # remains): per-codepoint table lookup instead of a regex scan —
    # measured 1.7s → 0.44s for this pass at sf1.0, value-equal on every
    # doc (regex complement of an ASCII set ≡ translate-delete of the set,
    # both per codepoint)
    import string as _string
    _keep_chars = _string.ascii_letters + _string.digits + " "
    base = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in keep],
        F.length(text).alias("_nc"),
        _tokens(text).alias("_toks"),
        F.length(F.translate(text, _keep_chars, "")).alias("_np"),
    )
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    counted = base.select(
        "id",
        *[F.col(c) for c in keep],
        "_nc", "_np",
        F.size(F.col("_toks")).alias("_nt"),
        F.size(F.filter(F.col("_toks"),
                        lambda t: F.array_contains(en, t))).alias("_sw"),
    )
    n_chars, n_tokens = F.col("_nc"), F.col("_nt")
    punct_ratio = F.when(
        n_chars > 0, F.col("_np").cast("double") / n_chars.cast("double")
    ).otherwise(F.lit(0.0))
    sw_ratio = F.when(
        n_tokens > 0,
        F.col("_sw").cast("double") / n_tokens.cast("double"),
    ).otherwise(F.lit(0.0))
    length_ok = F.when((n_chars >= 100) & (n_chars <= 20000), F.lit(1.0)).otherwise(F.lit(0.0))
    sw_sat = F.least(sw_ratio * 5, F.lit(1.0))
    quality = F.round(0.4 * length_ok + 0.3 * (1 - punct_ratio) + 0.3 * sw_sat, 6)
    return counted.select(
        "id",
        *[F.col(c) for c in keep],
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        quality.alias("quality"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, ws_tokens, subword_est): whitespace token count + a BPE-ish
    estimate (alnum runs + each punct char counts as one subword;
    long alnum runs split every 4 chars — the GPT-ish chars/4 heuristic)."""
    text = F.col(text_col)
    ws = F.size(F.filter(F.split(text, "[ \t\n\x0b\f\r]+"), lambda t: t != ""))
    alnum_runs = F.filter(F.split(F.lower(text), "[^a-z0-9]+"), lambda t: t != "")
    subword = F.aggregate(
        alnum_runs,
        F.lit(0),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("int"),
    )
    n_punct = F.length(F.regexp_replace(text, "[a-zA-Z0-9 \t\n\x0b\f\r]", ""))
    return df.select(
        F.col(id_col).alias("id"),
        ws.alias("ws_tokens"),
        (subword + n_punct).alias("subword_est"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fp): md5 of the word-normalized text — a content-defined doc id
    stable under case/punctuation/whitespace noise."""
    toks = _tokens(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(F.array_join(toks, " ")).alias("fp"),
    )


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_words, dup_word_frac, top_bigram_frac, dup_bigram_frac):
    Gopher-style repetition filters (Rae et al. 2021 §A1.1) — the standard
    LLM-corpus signal for boilerplate/degenerate pages.

    * dup_word_frac    — 1 - distinct/total words (word-level repetition)
    * top_bigram_frac  — occurrences of the most frequent word bigram over
      all bigram instances
    * dup_bigram_frac  — fraction of bigram instances whose bigram occurs
      more than once in the document

    Shape at scale: one explode keyed (id, bigram) with map-side partial
    aggregation (hot documents combine before the shuffle), then a per-id
    roll-up — both shuffles carry counts, never text. Documents with
    fewer than two space-separated words are dropped (no bigram exists).
    Pure Catalyst end to end.
    """
    words = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(id_col).alias("id"),
        words.alias("w"),
    ).where(F.size("w") >= 2).select(
        "id",
        F.size("w").cast("long").alias("n_words"),
        F.size(F.array_distinct("w")).cast("long").alias("n_distinct"),
        # bigrams via zip_with over offset slices — TOTAL even on 1-word
        # rows (slice length 0 → []). An indexed transform(sequence(...))
        # here blows up: InferFiltersFromGenerate copies the expression
        # into the scan-side Filter where the size(w) >= 2 guard no longer
        # shields the w[i] access on short rows.
        F.expr("zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),"
               " (a, b) -> concat(a, ' ', b))").alias("bg"),
    )
    counts = (base
              .select("id", "n_words", "n_distinct",
                      F.explode("bg").alias("g"))
              .groupBy("id", "n_words", "n_distinct", "g")
              .agg(F.count("*").alias("c")))
    return (counts
            .groupBy("id", "n_words", "n_distinct")
            .agg(F.sum("c").alias("nb"),
                 F.max("c").alias("top_c"),
                 F.sum(F.when(F.col("c") > 1, F.col("c"))
                       .otherwise(F.lit(0))).alias("dup_c"))
            .select(
                "id", "n_words",
                F.round((F.col("n_words") - F.col("n_distinct"))
                        / F.col("n_words"), 6).alias("dup_word_frac"),
                F.round(F.col("top_c") / F.col("nb"), 6)
                 .alias("top_bigram_frac"),
                F.round(F.col("dup_c") / F.col("nb"), 6)
                 .alias("dup_bigram_frac"),
            ))


# PII patterns: identical semantics under Java regex (Spark) and RE2
# (DuckDB oracle) — character classes spelled out (no \s: Java includes
# \x0B, RE2 does not), no lookaround, no backrefs. Scrub order matters:
# emails first (they contain dots and digits), then IPv4, then phone-like
# runs.
PII_PATTERNS = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
     "<IP>"),
    ("phone", "\\+?[0-9][0-9 ()-]{6,}[0-9]", "<PHONE>"),
)


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, scrubbed, n_email, n_ipv4, n_phone): redact emails, IPv4
    addresses, and phone-number-shaped digit runs — the minimum scrub a
    public-web training corpus runs before anything else sees the text.

    Counts are measured on the ORIGINAL text per class independently
    (an email's digits never double-count as a phone because scrubbing
    replaces left to right in PII_PATTERNS order, but the counts report
    raw per-class matches). Pure Catalyst: a narrow map, no shuffle.
    """
    scrubbed = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(text_col, F.lit(pat), F.lit(0)))
            .cast("long").alias(f"n_{name}"))
    for name, pat, token in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return df.select(F.col(id_col).alias("id"),
                     scrubbed.alias("scrubbed"), *counts)


def hashed_embedding(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", dim: int = 16) -> DataFrame:
    """(id, emb): feature-hashing text embeddings — the model-free
    bridge from raw documents to the `array<double>` shape every
    vector operator here consumes (ANN top-k, embedding near-dup,
    IVF), following the hashing trick (Weinberger et al. ICML'09):
    token t lands in bucket md5(t) mod dim, the bucket-count vector is
    L2-normalized.

    Exactness contract: bucket counts are exact int64, the norm is one
    sqrt over an exact integer sum of squares, each coordinate is one
    division rounded to 6 decimals — both engines reproduce every
    digit. Empty documents embed as the zero vector.

    Scale shape: a pure narrow map (tokenize → transform over a
    literal dim range) — no shuffle, no UDF; at 100 TB this is the
    cheapest stage in the pipeline and composes with the bucketed ANN
    operators downstream.
    """
    toks = _tokens(F.col(text_col))
    bucket = lambda t: (F.conv(F.substring(F.md5(t), 1, 15), 16, 10)
                        .cast("long") % dim)
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.size(F.filter(toks, lambda t: bucket(t) == i))
                   .cast("long"))
    norm2 = F.aggregate(counts, F.lit(0).cast("long"),
                        lambda acc, c: acc + c * c)
    norm = F.sqrt(norm2.cast("double"))
    emb = F.when(
        norm2 > 0,
        F.transform(counts, lambda c: F.round(c / norm, 6))
    ).otherwise(F.transform(counts, lambda c: F.lit(0.0)))
    return df.select(F.col(id_col).alias("id"), emb.alias("emb"))


# the 8 "stop words" of the Gopher rule-set (Rae et al. 2021 §A1.1);
# distinct from the per-language STOPWORDS lists used by quality_score
GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(df: DataFrame, id_col: str, text_col: str,
                 min_words: int = 50, max_words: int = 100_000) -> DataFrame:
    """(id, n_words, word_chars, n_lines, n_symbols, n_bullet_lines,
    n_ellipsis_lines, n_alpha_words, stop_hits, r_word_count,
    r_mean_word_len, r_symbol_ratio, r_bullet_lines, r_ellipsis_lines,
    r_alpha_words, r_stop_words, passed): the published Gopher
    quality-rule battery (Rae et al. 2021 §A1.1), fused into one
    projection — the rule-based sibling of ``quality_score`` (heuristic
    score) and ``repetition_stats`` (repetition legs of the same
    appendix).

    Rules, each an INTEGER comparison so both engines decide
    identically (no float thresholds anywhere):

    * word count in [min_words, max_words]
    * mean word length in [3, 10]          → 3·n ≤ chars ≤ 10·n
    * symbol-to-word ratio ('#' + '...' + '…') ≤ 0.1 → 10·sym ≤ n
    * ≤ 90% of (non-blank) lines start with a bullet (-, *, •)
    * ≤ 30% of lines end with an ellipsis
    * ≥ 80% of words contain an alphabetic character
    * ≥ 2 distinct Gopher stop words present

    Scale shape: pure Catalyst, zero shuffles, zero UDFs — a map-only
    stage that runs at scan speed; the verdict column drives the
    curation gate the way the quality/language gates do.

    Corpus note: the synthetic test corpus draws from a technical
    vocabulary that contains at most ONE of the 8 Gopher stop words per
    doc, so `r_stop_words` (and hence `passed`) is false corpus-wide
    there — faithful application of the published thresholds, not a
    bug; real webtext passes this rule at high rates.
    """
    # NULL text is scored as empty text (all counts 0, passed false) so
    # the stats columns stay non-null and the verdict is deterministic —
    # and so Spark and the SQL oracle agree bit-for-bit on null-bearing
    # corpora (F.aggregate over a null array would yield NULL word_chars)
    txt = F.coalesce(F.col(text_col), F.lit(""))
    base = df.select(
        F.col(id_col).alias("id"),
        F.filter(F.split(txt, "[ \t\n\x0b\f\r]+"),
                 lambda t: t != "").alias("_w"),
        F.filter(F.transform(F.split(txt, "\n"), lambda l: F.trim(l)),
                 lambda l: l != "").alias("_l"),
        txt.alias("_t"),
    )
    lw = F.transform(F.col("_w"), F.lower)
    n_sym = (
        (F.length("_t") - F.length(F.regexp_replace("_t", "#", "")))
        + ((F.length("_t")
            - F.length(F.regexp_replace("_t", r"\.\.\.", ""))) / F.lit(3))
          .cast("long")
        + (F.length("_t") - F.length(F.regexp_replace("_t", "…", "")))
    ).cast("long")
    stats = base.select(
        "id",
        F.size("_w").cast("long").alias("n_words"),
        F.aggregate("_w", F.lit(0).cast("long"),
                    lambda a, x: a + F.length(x)).alias("word_chars"),
        F.size("_l").cast("long").alias("n_lines"),
        n_sym.alias("n_symbols"),
        F.size(F.filter("_l", lambda l: l.rlike("^[-*•]")))
        .cast("long").alias("n_bullet_lines"),
        F.size(F.filter("_l", lambda l: l.rlike(r"(\.\.\.|…)$")))
        .cast("long").alias("n_ellipsis_lines"),
        F.size(F.filter("_w", lambda x: x.rlike("[A-Za-z]")))
        .cast("long").alias("n_alpha_words"),
        sum((F.array_contains(lw, w).cast("int") for w in GOPHER_STOPS),
            F.lit(0)).cast("int").alias("stop_hits"),
    )
    n = F.col("n_words")
    rules = {
        "r_word_count": (n >= min_words) & (n <= max_words),
        "r_mean_word_len": (F.lit(3) * n <= F.col("word_chars"))
                           & (F.col("word_chars") <= F.lit(10) * n),
        "r_symbol_ratio": F.lit(10) * F.col("n_symbols") <= n,
        "r_bullet_lines": (F.lit(10) * F.col("n_bullet_lines")
                           <= F.lit(9) * F.col("n_lines")),
        "r_ellipsis_lines": (F.lit(10) * F.col("n_ellipsis_lines")
                             <= F.lit(3) * F.col("n_lines")),
        "r_alpha_words": (F.lit(10) * F.col("n_alpha_words")
                          >= F.lit(8) * n),
        "r_stop_words": F.col("stop_hits") >= 2,
    }
    out = stats.select(
        "*", *[v.alias(k) for k, v in rules.items()])
    passed = None
    for k in rules:
        passed = F.col(k) if passed is None else passed & F.col(k)
    return out.select("*", passed.alias("passed"))
