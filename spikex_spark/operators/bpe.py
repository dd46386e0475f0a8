"""Distributed BPE tokenizer training (Sennrich et al. 2016) — the
standard subword vocabulary step of an LLM data pipeline, re-expressed
for Spark.

Each merge round is one distributed job: count adjacent symbol pairs
over the DISTINCT-word table (weighted by word frequency — the classic
BPE trick that makes the corpus size irrelevant to the round cost),
collect the single argmax row, apply the merge as a narrow string
``replace``. Only one (pair, count) row per round ever reaches the
driver, exactly like train_ivf_centroids' centroid pulls.

Representation: a word's symbol sequence is stored as the string
``(s1)(s2)...(sn)`` — each symbol individually wrapped. A merge of
(x, y) is then the plain string replace ``(x)(y)`` → ``(xy)``, which is
greedy-left-to-right in every engine WITHOUT the shared-boundary bug of
space-separated forms (in ``b b b b``, replacing ``␣b␣b␣`` consumes the
middle space and misses the second pair; ``(b)(b)`` boundaries never
overlap). This is what makes the DuckDB oracle able to replay training
bit-for-bit with unrolled CTEs.

Determinism: ties on pair count break lexicographically (left symbol,
then right) — no RNG, resumable, oracle-mirrorable.

Scale shape per round: the pair explode runs over distinct WORDS (not
documents — dedup first via one groupBy), pairs shuffle with map-side
partial aggregation on (left, right) carrying only counts; the merge
application is a narrow map. At 100 TB the distinct-word table is
orders of magnitude smaller than the corpus and the rounds are
word-count-bound, not corpus-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq): distinct lowercase-alnum words with corpus counts —
    the only corpus-sized pass in BPE training."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda t: t != "")
    return (df.select(F.explode(toks).alias("word"))
            .groupBy("word").agg(F.count("*").alias("freq")))


def _wrap_chars(col: F.Column) -> F.Column:
    """'abc' -> '(a)(b)(c)': initial symbol sequence = characters."""
    return F.array_join(
        F.transform(F.split(col, ""),
                    lambda c: F.concat(F.lit("("), c, F.lit(")"))), "")


_SYM_RE = r"\(([^)]*)\)"


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """(left, right, cnt): adjacent-symbol pair counts weighted by word
    freq. zip_with over offset slices (total — no indexed transform, see
    textstats.repetition_stats for the InferFiltersFromGenerate trap)."""
    syms = F.regexp_extract_all("seq", F.lit(_SYM_RE), F.lit(1))
    base = seqs.select("freq", syms.alias("s")).where(F.size("s") >= 2)
    pairs = base.select(
        "freq",
        F.explode(F.expr(
            "zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1),"
            " (a, b) -> struct(a AS l, b AS r))")).alias("p"))
    return (pairs.groupBy(F.col("p.l").alias("left"),
                          F.col("p.r").alias("right"))
            .agg(F.sum("freq").alias("cnt")))


def train_bpe(df: DataFrame, text_col: str,
              num_merges: int = 8) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges over the corpus.

    Returns [(left, right, pair_count), ...] in merge order. Each round:
    argmax pair by (count DESC, left ASC, right ASC), then apply the
    merge to every word's symbol sequence. Stops early when no pair is
    left (fully-merged vocabulary).
    """
    seqs = (_word_table(df, text_col)
            .select(_wrap_chars(F.col("word")).alias("seq"), "freq")
            .localCheckpoint(eager=False))
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best = (_pair_counts(seqs)
                .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
                .limit(1).collect())
        if not best:
            break
        left, right, cnt = best[0]["left"], best[0]["right"], best[0]["cnt"]
        merges.append((left, right, int(cnt)))
        seqs = seqs.select(
            F.replace(F.col("seq"), F.lit(f"({left})({right})"),
                      F.lit(f"({left}{right})")).alias("seq"),
            "freq").localCheckpoint(eager=False)
    return merges


def bpe_merge_table(df: DataFrame, text_col: str,
                    num_merges: int = 8) -> DataFrame:
    """Contract-query face of training: (round, left_sym, right_sym,
    merged, pair_count) — one row per learned merge in order."""
    spark = df.sparkSession
    merges = train_bpe(df, text_col, num_merges)
    rows = [(i + 1, l, r, l + r, c) for i, (l, r, c) in enumerate(merges)]
    return spark.createDataFrame(
        rows,
        "round int, left_sym string, right_sym string,"
        " merged string, pair_count bigint")


def bpe_encode(df: DataFrame, id_col: str, text_col: str,
               merges: list[tuple[str, str, int]]) -> DataFrame:
    """(id, n_bpe_tokens): token count per document under the learned
    merges — the number every packing/budgeting stage downstream needs.

    Applies the merge list in training order to each word's character
    sequence (narrow map, chained replaces — no shuffle), then counts
    symbols across the doc's words.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda t: t != "")

    def encode_word(w):
        s = _wrap_chars(w)
        for left, right, _ in merges:
            s = F.replace(s, F.lit(f"({left})({right})"),
                          F.lit(f"({left}{right})"))
        return F.size(F.regexp_extract_all(s, F.lit(_SYM_RE), F.lit(1)))

    return df.select(
        F.col(id_col).alias("id"),
        F.aggregate(toks, F.lit(0),
                    lambda acc, w: acc + encode_word(w))
        .cast("long").alias("n_bpe_tokens"))
