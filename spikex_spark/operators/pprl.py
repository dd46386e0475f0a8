"""Privacy-preserving record linkage: Bloom-filter CLK encodings.

Schnell, Bachteler & Reiher's construction ('09; the basis of every
production PPRL stack): each record's identifying text is reduced to
character q-grams, each gram sets ``k`` positions in an ``m``-bit Bloom
filter, and only those cryptographic long-term keys (CLKs) ever leave
the data owner — similarity is computed on the ENCODINGS with the Dice
coefficient (Bloom-bit Dice approximates q-gram Dice), so two parties
can link records without exchanging a single cleartext value.

Relational form (the bloom_decontaminate recipe): the sorted list of
SET positions IS the bitset — ``2·|A∩B| / (|A|+|B|)`` is two
``array_intersect``/``size`` expressions, pure Catalyst, no UDF.
Positions are md5-derived (``md5(gram || ':' || i) % m``), no RNG
state, so the DuckDB oracle reproduces every bit.

Scale shape: encoding is a narrow map (one per-row transform chain);
Dice scoring is a narrow map over a candidate-pair table. Blocking
still applies — at 10^12 records PPRL pairs come from the same LSH /
phonetic channels, just computed over CLKs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _md5_60


def clk_encode(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", m: int = 1024, k: int = 2,
               q: int = 2, max_chars: int = 64) -> DataFrame:
    """(id, clk, clk_bits): the record's CLK as the SORTED list of set
    bit positions. Normalization (lowercase, strip non-alphanumerics,
    cap at ``max_chars``) is part of the encoding contract; grams are
    the distinct character ``q``-grams of the normalized string."""
    norm = F.substring(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", ""),
        1, max_chars)
    d = df.select(F.col(id_col).alias("id"), norm.alias("_n"))
    grams = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("_n") - F.lit(q - 1),
                                        F.lit(0))),
        lambda i: F.col("_n").substr(i, F.lit(q))))
    pos = F.sort_array(F.array_distinct(F.flatten(F.transform(
        grams,
        lambda g: F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: _md5_60(F.concat(g, F.lit(":"), i.cast("string")))
            % F.lit(m))))))
    out = d.where(F.length("_n") >= q).select(
        "id", pos.alias("clk"))
    return out.select("id", "clk", F.size("clk").alias("clk_bits"))


def clk_dice(pairs: DataFrame, id_cols=("id_a", "id_b"),
             clk_a: str = "clk_a", clk_b: str = "clk_b") -> DataFrame:
    """(ids..., bits_a, bits_b, common, dice): Bloom-bit Dice
    similarity over candidate pairs of CLKs — the PPRL match score,
    computed entirely on encodings. A pure narrow map."""
    inter = F.size(F.array_intersect(F.col(clk_a), F.col(clk_b)))
    na, nb = F.size(F.col(clk_a)), F.size(F.col(clk_b))
    dice = F.round(F.lit(2.0) * inter / (na + nb), 6)
    return pairs.select(*id_cols, na.alias("bits_a"), nb.alias("bits_b"),
                        inter.alias("common"), dice.alias("dice"))
