"""Deduplication family for large-scale training-data pipelines.

Five channels, each a ``queries()`` entry with a DuckDB oracle:

* exact        — md5(text) hash-groupBy; keep min id per hash.
* minhash_lsh  — char-shingle MinHash banding (see blocking.py) → bucket
  join → verified Jaccard; the 100 TB workhorse.
* simhash      — 60-bit simhash over tokens (md5-derived per-token hashes,
  portable to DuckDB); near-dup = same band + hamming ≤ k.
* ngram_jaccard— token n-gram Jaccard via explode + join + group (exact
  similarity, no approximation; quadratic within shared-gram groups).
* embedding    — cosine near-dup over an embedding column (simsearch.py).
* substring    — exact duplicated-span detection/removal via fixed-width
  window fingerprints (the distributed stand-in for Lee et al.'s suffix
  array) + GPT-3-style 13-gram benchmark decontamination.
* line-level   — corpus-wide boilerplate line removal (RefinedWeb-style).

Scale notes: every channel is explode → shuffle-on-key → partial-agg; the
quadratic risk is always the bucket/gram group size, capped the same way as
ER blocks (salt/cap in blocking.py). simhash band join is the cheapest
recall channel at scale (4 exact-match joins, no per-pair verify until
hamming check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import blocking as B

# 60-bit hash from the first 15 hex chars of md5 — positive int64 in Spark,
# DuckDB ('0x'||substr(md5(x),1,15))::bigint, Python int(md5[:15], 16).
_HASH_BITS = 60


def _md5_60(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, canonical_id, text_hash): groups of byte-identical texts.

    canonical = min id per hash. Rows with unique text keep themselves as
    canonical — output covers ALL rows (dedup = filter id == canonical_id),
    INCLUDING null-text rows. NULL text is SELF-canonical: md5(NULL) is
    NULL and a failed fetch is not a byte-identical duplicate of another
    failed fetch, so each null-text doc keeps itself (left join on the
    non-null hashes + coalesce to own id). This keeps the near-dup
    pipeline's invariant keep_near ⊆ keep_exact on null-bearing corpora
    — resolve_documents also leaves null-text docs as singleton clusters
    (ADVICE r4) — and never drops null docs from a keep-list.
    """
    hashed = df.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("text_hash")
    )
    canon = (hashed.where(F.col("text_hash").isNotNull())
             .groupBy("text_hash")
             .agg(F.min("id").alias("_cid"))
             .withColumnRenamed("text_hash", "_th"))
    return (hashed.join(canon, F.col("text_hash") == F.col("_th"), "left")
            .select("id",
                    F.coalesce("_cid", F.col("id")).alias("canonical_id"),
                    "text_hash"))


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) — 60-bit simhash over the distinct token set.

    bit b of simhash = 1 iff sum over tokens of (token_hash bit b ? +1 : -1)
    > 0. Implemented as explode(tokens) → ONE groupBy with 60 per-bit sum
    aggregates — pure Catalyst (whole-stage codegen, map-side partial agg:
    the shuffle carries one 60-column row per doc). Values are identical to
    the earlier explode(tokens)×explode(bits) double-groupBy form, which
    materialized |tokens|·60 rows (~135M at sf1.0) and paid a second
    (id, bit) exchange; measured ~0.95s → ~0.77s warm for the signature
    stage at sf1.0 — a modest win; the near-dup operator's cost lives in
    its band join (see simhash_near_dups).
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda t: t != "",
                )
            )
        ).alias("token"),
    )
    hashed = toks.select("id", _md5_60(F.col("token")).alias("h"))
    # expression trees built as SQL strings (ONE py4j round-trip each
    # instead of ~5 per Column op): the 60 aggregates + 60-term bitsum
    # cost ~550 py4j calls (~0.3 s of driver-side CONSTRUCTION inside
    # every timed rep) in Column form; F.expr parses to the identical
    # Catalyst nodes, so plans and values are untouched (oracle-pinned)
    votes = hashed.groupBy("id").agg(*[
        F.expr(f"sum((shiftright(h, {b}) & 1) * 2 - 1)").alias(f"s{b}")
        for b in range(_HASH_BITS)
    ])
    bitsum = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END)"
        for b in range(_HASH_BITS)
    )
    return votes.select("id", F.expr(bitsum).alias("simhash"))


def simhash_near_dups(df: DataFrame, id_col: str, text_col: str,
                      max_hamming: int = 3, bands: int = 4) -> DataFrame:
    """(id_a, id_b, hamming): pairs with hamming(simhash) ≤ max_hamming.

    Candidate generation = equality on any of ``bands`` bit-bands (15 bits
    each) — a near-dup within the hamming budget shares ≥1 exact band when
    max_hamming < bands (pigeonhole). Verification = bit_count(xor).
    """
    sh = simhash(df, id_col, text_col)
    width = _HASH_BITS // bands
    banded = sh.select(
        "id", "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("simhash"), b * width)
                    .bitwiseAND(F.lit((1 << width) - 1)).alias("bval"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval"))
    left = banded.select("band", "bval", F.col("id").alias("id_a"),
                         F.col("simhash").alias("sh_a"))
    right = banded.select("band", "bval", F.col("id").alias("id_b"),
                          F.col("simhash").alias("sh_b"))
    # hamming filter INSIDE the band-join stage (it commutes with the old
    # distinct — hamming is a function of the pair), then FIRST-MATCHING-
    # BAND emission instead of a distinct: a pair matching in band b is
    # kept only when NO band b' < b also matches, so each qualifying pair
    # is emitted exactly once and the trailing distinct — a full exchange
    # + hash aggregate over every surviving (pair, band) row (tens of
    # millions at sf1.0; 294M pre-filter band-join rows) — disappears
    # outright. The earlier-band check is pure bit arithmetic on the two
    # signatures already present in the row (bands−1 comparisons), and
    # the emitted set is provably identical: a pair sharing k bands was
    # previously emitted k times and deduped; now the copy at its minimal
    # matching band survives alone (pinned by
    # test_simhash_first_band_emission_matches_distinct).
    def _bv(c: F.Column, b: int) -> F.Column:
        return F.shiftright(c, b * width).bitwiseAND(F.lit((1 << width) - 1))

    earlier_match = F.lit(False)
    for bp in range(bands - 1):
        earlier_match = earlier_match | (
            (F.col("band") > bp)
            & (_bv(F.col("sh_a"), bp) == _bv(F.col("sh_b"), bp))
        )
    return (
        left.join(right, ["band", "bval"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .where(F.col("hamming") <= max_hamming)
        .where(~earlier_match)
        .select("id_a", "id_b", "hamming")
    )


def _rare_gram_profile(df: DataFrame, id_col: str, text_col: str,
                       n: int, max_df: int | None):
    """(grams, counts) — per-doc DISTINCT token-n-gram stream and its
    per-doc cardinalities, with the shared hub-gram skew guard: grams
    appearing in more than ``max_df`` documents are dropped from BOTH
    (the gram self-join is quadratic per hub gram)."""
    # tokens materialize in their OWN projection: a lambda body that
    # embeds the split/filter chain re-tokenizes the full text PER
    # POSITION — O(len²) per doc on real-sized pages (the shingle_df
    # trap; column refs are O(1) per element)
    tokd = df.select(
        F.col(id_col).alias("id"),
        F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                 lambda t: t != "").alias("_toks"))
    toks = F.col("_toks")
    grams = tokd.select(
        "id",
        F.explode(
            F.when(
                F.size(toks) >= n,
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - n + 1),
                        lambda i: F.array_join(F.slice(toks, i, n), " "),
                    )
                ),
            ).otherwise(F.array(F.array_join(toks, " "))),
        ).alias("gram"),
    ).where(F.col("gram") != "")
    if max_df is not None:
        # grams are pre-distinct per doc, so count(*) per gram IS document
        # frequency; the hub-gram table is small (only grams OVER the cap)
        # and broadcast-anti-joined away before the quadratic self-join
        hub = (
            grams.groupBy("gram").agg(F.count("*").alias("df"))
            .where(F.col("df") > max_df)
            .select("gram")
        )
        grams = grams.join(F.broadcast(hub), "gram", "left_anti")
    counts = grams.groupBy("id").agg(F.count("*").alias("n_grams"))
    return grams, counts


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, min_jaccard: float = 0.5,
                        max_df: int = 1000,
                        return_counts: bool = False) -> DataFrame:
    """(id_a, id_b, jaccard): EXACT token-n-gram Jaccard over pairs sharing
    ≥1 gram, computed over the RARE-GRAM profile: grams appearing in more
    than ``max_df`` documents ("of the X" hub grams) are dropped from BOTH
    the candidate join and the per-doc counts — the self-join is quadratic
    per hub gram, so an uncapped run detonates at 100 TB. The skew guard is
    ON by default and mirrored in the DuckDB oracle; ``max_df=None``
    disables it. Jaccard stays exact w.r.t. the filtered gram sets."""
    grams, counts = _rare_gram_profile(df, id_col, text_col, n, max_df)
    inter = (
        grams.alias("a")
        .join(grams.alias("b"), "gram")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(counts.withColumnsRenamed({"id": "id_a", "n_grams": "na"}), "id_a")
        .join(counts.withColumnsRenamed({"id": "id_b", "n_grams": "nb"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard",
                *([F.col("inter").alias("i"),
                   (F.col("na") + F.col("nb") - F.col("inter")).alias("u")]
                  if return_counts else []))
    )


def containment_pairs(df: DataFrame, id_col: str, text_col: str,
                      n: int = 3, min_containment: float = 0.8,
                      max_df: int = 1000) -> DataFrame:
    """(contained_id, container_id, inter, n_small, n_big, containment) —
    ASYMMETRIC near-duplication: how much of the smaller document's
    n-gram profile appears in the larger one (Broder 1997's containment,
    the companion measure to resemblance/Jaccard).

    Jaccard misses subset duplication by construction — a page fully
    quoted inside a 10× larger aggregator scores ``|A|/|B| ≈ 0.1`` and
    sails past every resemblance threshold, yet it is exactly the
    redundancy an LLM-training corpus wants deduplicated.  Containment
    ``C = |A∩B| / min(|A|,|B|)`` is 1.0 for that pair.

    ``contained_id`` is the doc with the smaller rare-gram profile
    (ties: smaller id — deterministic), ``container_id`` the other.
    Shares :func:`ngram_jaccard_pairs`'s rare-gram machinery, hub-gram
    skew guard included (same 100-TB posture: no unguarded quadratic
    gram join; the oracle mirrors the guard).
    """
    grams, counts = _rare_gram_profile(df, id_col, text_col, n, max_df)
    inter = (
        grams.alias("a")
        .join(grams.alias("b"), "gram")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    small_first = (F.col("na") < F.col("nb")) | (
        (F.col("na") == F.col("nb")) & (F.col("id_a") < F.col("id_b"))
    )
    cont = F.round(
        F.col("inter").cast("double")
        / F.least("na", "nb").cast("double"),
        6,
    )
    return (
        inter.join(counts.withColumnsRenamed(
            {"id": "id_a", "n_grams": "na"}), "id_a")
        .join(counts.withColumnsRenamed(
            {"id": "id_b", "n_grams": "nb"}), "id_b")
        .withColumn("containment", cont)
        .where(F.col("containment") >= min_containment)
        .select(
            F.when(small_first, F.col("id_a")).otherwise(F.col("id_b"))
            .alias("contained_id"),
            F.when(small_first, F.col("id_b")).otherwise(F.col("id_a"))
            .alias("container_id"),
            F.col("inter").cast("long").alias("inter"),
            F.least("na", "nb").cast("long").alias("n_small"),
            F.greatest("na", "nb").cast("long").alias("n_big"),
            "containment",
        )
    )


def lsh_expected_recall(pairs: DataFrame,
                        configs=((1, 8), (2, 4), (4, 2), (8, 1)),
                        i_col: str = "i", u_col: str = "u",
                        max_union: int = 10_000) -> DataFrame:
    """(bands, rows, n_pairs, exp_recall): the LSH parameter planner —
    for each (bands b, rows-per-band r) factorization of b·r hashes,
    the EXPECTED fraction of the given (near-dup) pairs that banded
    MinHash would emit as candidates, i.e. the mean over pairs of the
    S-curve ``p(s) = 1 − (1 − s^r)^b``. Pick LSH params from this
    table, not from guesswork — the design-for-scale step before the
    bucket join exists.

    Exactness: libm ``pow`` differs across engines, so p is evaluated
    as the RATIONAL ``1 − (u^r − i^r)^b / u^(r·b)`` from each pair's
    integer (intersection, union) gram counts — repeated decimal(38,0)
    multiplications (HUGEINT in the oracle), one double division, the
    per-pair value snapped to micro-units before an exact integer
    mean. Pairs with union > ``max_union`` are excluded (u^(r·b) must
    fit 38 digits; a near-dup pair with a 10k-gram union is beyond any
    sane LSH design point anyway) — the guard is part of the operator
    contract, applied identically by the oracle."""
    dec = "decimal(38,0)"

    def _ipow(x: F.Column, e: int) -> F.Column:
        acc = x
        for _ in range(e - 1):
            acc = acc * x
        return acc

    base = pairs.where(F.col(u_col) <= max_union)
    rows = []
    for b, r in configs:
        u = F.col(u_col).cast(dec)
        i = F.col(i_col).cast(dec)
        num = _ipow(_ipow(u, r) - _ipow(i, r), b)
        den = _ipow(u, r * b)
        p = F.lit(1.0) - num.cast("double") / den.cast("double")
        rows.append(F.struct(
            F.lit(b).alias("bands"), F.lit(r).alias("rows_per_band"),
            F.round(p * F.lit(1e6), 0).cast("long").alias("p_u")))
    ex = base.select(F.explode(F.array(*rows)).alias("c")).select("c.*")
    return (ex.groupBy("bands", "rows_per_band")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.sum("p_u").alias("_sp"))
            .select("bands", "rows_per_band", "n_pairs",
                    F.round(F.col("_sp") / (F.col("n_pairs")
                                            * F.lit(1e6)), 6)
                    .alias("exp_recall")))


def minhash_near_dups(df: DataFrame, id_col: str, text_col: str,
                      min_jaccard: float = 0.7, k: int = 5,
                      num_hashes: int = 16, bands: int = 4,
                      bucket_cap: int = 1000) -> DataFrame:
    """(id_a, id_b, jaccard): LSH candidates verified with EXACT shingle
    Jaccard (the candidate set is approximate, the reported scores exact).

    ``bucket_cap`` bounds per-bucket membership (first ``cap`` ids) — a
    million-clone boilerplate page otherwise turns its bucket into a
    quadratic pair bomb; deterministic and mirrored in the oracle.

    Verification shape: the shingle SET stays an ARRAY per doc and each
    candidate pair is verified with one ``array_intersect`` — two joins of
    |pairs| rows each. The previous per-shingle form (cands ⋈ exploded
    shingles ⋈ exploded shingles → groupBy pair) materialized
    |pairs|·|shingles/doc| intermediate rows: measured 1.96M candidate
    pairs × ~295 shingles ≈ 580M rows through two joins and a giant
    aggregate at sf1.0 — the whole query was 57s, ~50 of them here.
    Shingles are packed to int64 when they fit 7 bytes (the normalized
    alphabet is [a-z0-9 ], one byte per char, so hex() is an INJECTIVE
    encoding and intersection counts are provably unchanged); longer
    shingles intersect as strings.
    """
    # ONE materialization feeds BOTH the signature chain (exploded) and the
    # per-pair verification arrays. For packable shingles (k ≤ 7) the
    # checkpoint holds the PACKED long arrays (≈40% the bytes of the
    # string arrays, and the pack transform runs once instead of once per
    # verify side); the signature stream reconstructs each shingle's bytes
    # losslessly — decode(unhex(conv(v,10,16))) inverts conv(hex(s),16,10)
    # exactly (first byte ≥ 0x20 ⇒ no leading hex zero), so
    # md5(reconstructed) ≡ md5(shingle) bit-for-bit and the oracle's
    # signatures are untouched (pinned by the old-vs-new equivalence test).
    arr = B.shingle_arrays(df, id_col, text_col, k=k)
    if k <= 7:
        packed = arr.select(
            "id",
            F.transform("shingles",
                        lambda s: F.conv(F.hex(s), 16, 10).cast("long"))
            .alias("sh_set"),
            F.size("shingles").alias("n_sh"),
        ).localCheckpoint(eager=False)
        # md5 accepts BINARY: unhex(conv(v)) IS the original shingle's
        # UTF-8 bytes, so the signature chain skips the decode() pass —
        # md5(bytes) ≡ md5(string) bit-for-bit (pinned by the old-vs-new
        # equivalence test)
        sh = packed.select("id", F.explode("sh_set").alias("v")).select(
            "id",
            F.unhex(F.conv(F.col("v").cast("string"), 10, 16))
            .alias("shingle"))
    else:
        arr = arr.localCheckpoint(eager=False)
        packed = arr.select("id", F.col("shingles").alias("sh_set"),
                            F.size("shingles").alias("n_sh"))
        sh = arr.select("id", F.explode("shingles").alias("shingle"))
    sig = B.minhash_signatures(sh, num_hashes=num_hashes)
    buckets = B.lsh_buckets(sig, bands=bands, rows_per_band=num_hashes // bands)
    # fused cap + map-side pair enumeration (capped_pair_explode) with the
    # per-doc shingle COUNT riding the member structs (one narrow
    # shuffle_hash join onto the 4-rows-per-doc bucket table), and the
    # EXACT length prefilter applied INSIDE the enumeration: J(A,B) ≤
    # min(|A|,|B|)/max(|A|,|B|), so a pair can only reach the (rounded)
    # threshold when the size ratio does — non-viable pairs die before the
    # distinct and never meet the 2.4 KB shingle arrays. The 1e-6 slack
    # covers round(j, 6) landing on the threshold from below
    # (round-half-up ⇒ J ≥ t − 5e-7 can still print ≥ t); no pair that
    # could pass is dropped. Measured vs the join-then-filter form at
    # sf1.0-scale: 5.6 → 4.9 s for the whole query, same rows.
    buckets_n = buckets.join(packed.select("id", "n_sh")
                             .hint("shuffle_hash"), "id")
    ratio = None
    if min_jaccard > 0.0:
        t = min_jaccard - 1e-6
        ratio = (lambda p: F.least(p["n_sh_a"], p["n_sh_b"]).cast("double")
                 >= F.lit(t) * F.greatest(p["n_sh_a"], p["n_sh_b"]))
    cands = B.capped_pair_explode(buckets_n, key_col=["band", "bucket"],
                                  id_col="id", cap=bucket_cap,
                                  carry=["n_sh"], pair_filter=ratio) \
        .withColumnsRenamed({"n_sh_a": "na", "n_sh_b": "nb"})
    # SHUFFLE_HASH on the array side: sort-merge would SORT the pair stream
    # with 2.4KB arrays attached (measured ~2× this stage at sf1.0); the
    # per-partition hash build is the doc-array slice (bounded, skew-free —
    # ids are unique), never the pair stream. A broadcast measured ~1s
    # faster at sf1.0 (120MB relation) but broadcasting per-doc payload
    # arrays is the scale-unsafe shape — the corpus side must stay
    # partitionable.
    inter = (
        cands.join(packed.select(F.col("id").alias("id_a"),
                                 F.col("sh_set").alias("set_a"))
                   .hint("shuffle_hash"), "id_a")
        .join(packed.select(F.col("id").alias("id_b"),
                            F.col("sh_set").alias("set_b"))
              .hint("shuffle_hash"), "id_b")
        # explode-of-one = generator barrier: without it Catalyst pushes
        # the downstream jaccard/inter filters INTO the join condition and
        # re-inlines array_intersect there — the committed r6 "after" plan
        # evaluated the intersect FOUR times per pair (3× in the join
        # condition + 1× in the projection); measured 13–26 s vs ~7 s
        # single-eval for the verify stage at sf1.0-scale. Values are
        # untouched — the filters still apply, just above the barrier.
        .select("id_a", "id_b",
                F.explode(F.array(
                    F.size(F.array_intersect("set_a", "set_b")))).alias("inter"),
                "na", "nb")
        # the exploded form only produced pairs with ≥1 common shingle;
        # keep that contract so min_jaccard=0.0 behaves identically
        .where(F.col("inter") > 0)
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_containment_est(df: DataFrame, id_col: str, text_col: str,
                            min_containment: float = 0.5, k: int = 5,
                            num_hashes: int = 16, bands: int = 4,
                            bucket_cap: int = 1000) -> DataFrame:
    """(contained_id, container_id, agree, n_small, n_big, est_jaccard,
    est_containment) — SKETCH-ONLY containment estimation over LSH
    candidates: ``J^ = agree/H`` from MinHash signature agreement, then
    Broder's identity ``C = J·(|A|+|B|) / ((1+J)·min(|A|,|B|))`` with
    exact shingle cardinalities.

    The scale path for :func:`containment_pairs`: the exact version
    joins the gram streams of every candidate pair; this one touches
    only the H-long signatures plus two per-doc counts — at 10^12 docs
    the estimate runs where the exact join cannot.  ``agree·(na+nb)``
    and ``(H+agree)·min`` are exact int64s; one final rounded division.
    The estimate can exceed 1.0 for size-skewed fully-contained pairs
    (the identity's min-denominator) — that's signal, not error.
    """
    sh = B.shingle_df(df, id_col, text_col, k=k)
    sig = B.minhash_signatures(sh, num_hashes=num_hashes)
    buckets = B.lsh_buckets(sig, bands=bands,
                            rows_per_band=num_hashes // bands)
    buckets = B.cap_blocks(buckets, key_col=["band", "bucket"],
                           id_col="id", cap=bucket_cap)
    cands = (
        buckets.select("band", "bucket", F.col("id").alias("id_a"))
        .join(buckets.select("band", "bucket", F.col("id").alias("id_b")),
              ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    agree_expr = sum(
        F.when(F.col(f"a_mh{s}") == F.col(f"b_mh{s}"), 1).otherwise(0)
        for s in range(num_hashes)
    ).cast("long")
    sa = sig.select(F.col("id").alias("id_a"),
                    *[F.col(f"mh{s}").alias(f"a_mh{s}")
                      for s in range(num_hashes)])
    sb = sig.select(F.col("id").alias("id_b"),
                    *[F.col(f"mh{s}").alias(f"b_mh{s}")
                      for s in range(num_hashes)])
    counts = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    j = (
        cands.join(sa, "id_a").join(sb, "id_b")
        .select("id_a", "id_b", agree_expr.alias("agree"))
        .join(counts.withColumnsRenamed({"id": "id_a", "n_sh": "na"}),
              "id_a")
        .join(counts.withColumnsRenamed({"id": "id_b", "n_sh": "nb"}),
              "id_b")
    )
    small_first = (F.col("na") < F.col("nb")) | (
        (F.col("na") == F.col("nb")) & (F.col("id_a") < F.col("id_b"))
    )
    est_c = F.round(
        (F.col("agree") * (F.col("na") + F.col("nb"))).cast("double")
        / ((F.lit(num_hashes) + F.col("agree"))
           * F.least("na", "nb")).cast("double"),
        6,
    )
    return (
        j.withColumn("est_containment", est_c)
        .where(F.col("est_containment") >= min_containment)
        .select(
            F.when(small_first, F.col("id_a")).otherwise(F.col("id_b"))
            .alias("contained_id"),
            F.when(small_first, F.col("id_b")).otherwise(F.col("id_a"))
            .alias("container_id"),
            "agree",
            F.least("na", "nb").cast("long").alias("n_small"),
            F.greatest("na", "nb").cast("long").alias("n_big"),
            F.round(F.col("agree") / F.lit(float(num_hashes)), 6)
            .alias("est_jaccard"),
            "est_containment",
        )
    )


def _space_tokens(text_col: str) -> F.Column:
    """Space-split non-empty tokens — the pack_sequences/decontamination
    tokenization (positions must survive a re-join with ' ')."""
    return F.filter(F.split(F.col(text_col), " "), lambda t: t != "")


def _token_windows(toks: F.Column, window: int) -> F.Column:
    """All ``window``-token windows as joined strings; [] when the doc is
    shorter than one window. The when() guard keeps the expression TOTAL —
    InferFiltersFromGenerate copies generator inputs into scan-side
    Filters where an outer guard would no longer protect an index."""
    return F.when(
        F.size(toks) >= window,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - window + 1),
            lambda i: F.array_join(F.slice(toks, i, window), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _explode_windows(df: DataFrame, text_col: str, window: int,
                     id_col: str | None = None) -> DataFrame:
    """([id,] win): token windows exploded, with the token array bound
    in its OWN projection first — passing ``_space_tokens(col)`` straight
    into ``_token_windows`` embeds the split chain in the per-position
    lambda, re-tokenizing the full text per window (O(len²) per doc on
    real-sized pages; the shingle_df trap)."""
    cols = [F.col(id_col).alias("id")] if id_col else []
    tokd = df.select(*cols, _space_tokens(text_col).alias("_toks"))
    keep = ["id"] if id_col else []
    return tokd.select(
        *keep,
        F.explode(_token_windows(F.col("_toks"), window)).alias("win"))


def substring_dup_spans(df: DataFrame, id_col: str, text_col: str,
                        window: int = 12) -> DataFrame:
    """(id, span_start, span_end): maximal exact-duplicated token spans —
    the detection half of suffix-style training-data dedup (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"),
    re-expressed for Spark as fixed-width window fingerprints instead of
    a monolithic suffix array.

    A ``window``-token window is duplicated iff its exact text occurs at
    ≥2 (doc, pos) positions corpus-wide; overlapping/adjacent duplicated
    windows merge into maximal spans (1-based token offsets, inclusive).

    Shape at scale: the corpus-wide count shuffles 64-bit xxhash64
    fingerprints with map-side partial agg — never window text. The
    duplicated-fingerprint set (rare by construction) joins back
    broadcast-style under AQE, and an exact recount on the surviving
    window TEXT shields against hash collisions before any span is
    declared — the text recount touches only candidate rows. Span merge
    is a per-doc window function (docs are the partition key, no skew).
    """
    # tokens in their own projection — an inlined token chain inside the
    # window lambda re-splits the full text per position (O(len²)/doc)
    tokd = df.select(F.col(id_col).alias("id"),
                     _space_tokens(text_col).alias("_toks"))
    wins = tokd.select(
        "id",
        F.posexplode(_token_windows(F.col("_toks"), window)).alias("p", "win"),
    ).select("id", (F.col("p") + 1).cast("long").alias("pos"),
             F.xxhash64("win").alias("h"), "win")
    # the explode feeds the hash count AND the join back — checkpoint so
    # the window construction runs once (same pattern as minhash_near_dups)
    wins = wins.localCheckpoint(eager=False)
    dup_h = (wins.groupBy("h").agg(F.count("*").alias("n"))
             .where(F.col("n") >= 2).select("h"))
    cand = wins.join(dup_h, "h").localCheckpoint(eager=False)
    dup_win = (cand.groupBy("win").agg(F.count("*").alias("n"))
               .where(F.col("n") >= 2).select("win"))
    dup = cand.join(dup_win, "win").select("id", "pos")
    byid = Window.partitionBy("id").orderBy("pos")
    prev = F.lag("pos").over(byid)
    brk = (prev.isNull() | (F.col("pos") > prev + window)).cast("int")
    islands = dup.select(
        "id", "pos",
        F.sum(brk).over(byid.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"))
    return (islands.groupBy("id", "island")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + window - 1).alias("span_end"))
            .select("id", "span_start", "span_end"))


def substring_dedup(df: DataFrame, id_col: str, text_col: str,
                    window: int = 12) -> DataFrame:
    """(id, n_tokens, dup_tokens, dup_ratio, n_spans, cleaned_text):
    per-document rollup of :func:`substring_dup_spans` plus the text with
    every duplicated span removed.

    Removal is symmetric (ALL occurrences of a duplicated span go) —
    the deterministic variant of Lee et al.'s keep-one policy, which
    needs a global canonical choice; corpus curation normally filters on
    ``dup_ratio`` anyway. Covers ALL input docs (zeros when clean).
    Cleaned text is rebuilt from the per-doc span list (few spans) with
    an indexed array filter — no second shuffle of the token explode.
    """
    spans = substring_dup_spans(df, id_col, text_col, window=window)
    per_doc = (spans.groupBy("id")
               .agg(F.collect_list(F.struct("span_start", "span_end"))
                    .alias("spans"),
                    F.sum(F.col("span_end") - F.col("span_start") + 1)
                    .alias("dup_tokens"),
                    F.count("*").alias("n_spans")))
    base = df.select(F.col(id_col).alias("id"),
                     _space_tokens(text_col).alias("toks"))
    j = base.join(per_doc, "id", "left").select(
        "id", "toks",
        F.coalesce("spans", F.array().cast(
            "array<struct<span_start:long,span_end:long>>")).alias("spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"))
    covered = lambda i: F.exists(  # noqa: E731 — 1-based token position
        F.col("spans"),
        lambda s: (i + 1 >= s["span_start"]) & (i + 1 <= s["span_end"]))
    n_tokens = F.size("toks").cast("long")
    return j.select(
        "id", n_tokens.alias("n_tokens"), "dup_tokens",
        F.when(n_tokens > 0,
               F.round(F.col("dup_tokens") / n_tokens, 6))
        .otherwise(F.lit(0.0)).alias("dup_ratio"),
        "n_spans",
        F.array_join(
            F.filter(F.col("toks"), lambda t, i: ~covered(i)), " ")
        .alias("cleaned_text"))


def decontaminate(df: DataFrame, id_col: str, text_col: str,
                  bench_df: DataFrame, bench_text_col: str | None = None,
                  n: int = 13) -> DataFrame:
    """(id, n_hit_windows, contaminated): flag training documents sharing
    any exact ``n``-gram with a benchmark/eval set — GPT-3-style 13-gram
    decontamination (Brown et al. 2020 §C), the step every training
    corpus runs so eval numbers stay meaningful.

    ``n_hit_windows`` counts the doc's window positions whose n-gram
    appears anywhere in ``bench_df``; output covers ALL training docs.

    Shape at scale: the benchmark gram set is small by definition (eval
    suites, not the corpus) — distinct-ed and broadcast, so the training
    side is explode → broadcast-hash semi-join → per-doc partial-agg
    count: the 100-TB side never shuffles on the gram.
    """
    bcol = bench_text_col or text_col
    bench_grams = _explode_windows(bench_df, bcol, n).distinct()
    train = _explode_windows(df, text_col, n, id_col=id_col)
    hits = (train.join(F.broadcast(bench_grams), "win", "left_semi")
            .groupBy("id").agg(F.count("*").alias("n_hit_windows")))
    ids = df.select(F.col(id_col).alias("id"))
    return (ids.join(hits, "id", "left")
            .select("id",
                    F.coalesce("n_hit_windows", F.lit(0)).cast("long")
                    .alias("n_hit_windows"))
            .withColumn("contaminated", F.col("n_hit_windows") > 0))


def line_dedup_docs(df: DataFrame, id_col: str, text_col: str,
                    min_dup: int = 2) -> DataFrame:
    """Corpus-level boilerplate line removal (RefinedWeb-style): drop every
    line whose EXACT text occurs at least ``min_dup`` times across the
    whole corpus (nav bars, cookie banners, footers), keep document line
    order, report kept/total counts.

    Returns (id, n_lines, n_kept, cleaned_text). Empty lines never count
    as boilerplate (they are document structure, not content).

    Shape at scale: one shuffle keyed on the line text with map-side
    partial counts (the boilerplate lines ARE the hot keys — partial agg
    collapses them executor-side), a shuffle join back on the same key,
    then a per-document roll-up. collect_list holds one document's lines,
    bounded by the upstream max-document-size filter, never the corpus.
    """
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    hot = (lines.where(F.col("line") != "")
           .groupBy("line").agg(F.count("*").alias("n"))
           .where(F.col("n") >= min_dup)
           .select("line", F.lit(True).alias("_hot")))
    flagged = (lines.join(hot, "line", "left")
               .select("id", "pos", "line",
                       F.coalesce(~F.col("_hot"), F.lit(True)).alias("keep")))
    return (flagged.groupBy("id")
            .agg(F.count("*").alias("n_lines"),
                 F.sum(F.col("keep").cast("long")).alias("n_kept"),
                 F.array_join(
                     F.transform(
                         F.filter(
                             F.array_sort(F.collect_list(
                                 F.struct("pos", "line", "keep"))),
                             lambda s: s["keep"]),
                         lambda s: s["line"]),
                     "\n").alias("cleaned_text")))


def line_dedup_grouped(df: DataFrame, id_col: str, text_col: str,
                       group_col: str, min_dup: int = 2) -> DataFrame:
    """Group-scoped boilerplate line removal — the per-host/per-shard
    deployment of :func:`line_dedup_docs` (CCNet dedups per shard;
    RefinedWeb discusses site-level templates): a nav bar repeated
    across ONE site is boilerplate *there*, but the same line appearing
    once on another host is that page's content — corpus-global
    counting over-fires exactly on the highest-value shared phrases at
    web scale. Hot lines are counted within ``group_col`` (the host),
    so each group makes its own keep/drop decision.

    Returns (id, group, n_lines, n_kept, cleaned_text).

    Shape at scale: identical to the corpus-level operator with
    (group, line) as the hot key — partial agg still collapses hot
    lines map-side, and the join back is on the SAME compound key, so
    the shuffle partitioning is reused (one exchange, not two). The
    group column also bounds every count by the group's size: no
    planet-wide hot key exists by construction.
    """
    lines = df.select(
        F.col(id_col).alias("id"), F.col(group_col).alias("group"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    hot = (lines.where(F.col("line") != "")
           .groupBy("group", "line").agg(F.count("*").alias("n"))
           .where(F.col("n") >= min_dup)
           .select("group", "line", F.lit(True).alias("_hot")))
    flagged = (lines.join(hot, ["group", "line"], "left")
               .select("id", "group", "pos", "line",
                       F.coalesce(~F.col("_hot"), F.lit(True)).alias("keep")))
    return (flagged.groupBy("id", "group")
            .agg(F.count("*").alias("n_lines"),
                 F.sum(F.col("keep").cast("long")).alias("n_kept"),
                 F.array_join(
                     F.transform(
                         F.filter(
                             F.array_sort(F.collect_list(
                                 F.struct("pos", "line", "keep"))),
                             lambda s: s["keep"]),
                         lambda s: s["line"]),
                     "\n").alias("cleaned_text")))


def bloom_decontaminate(df: DataFrame, id_col: str, text_col: str,
                        bench_df: DataFrame, bench_text_col: str | None = None,
                        n: int = 13, m: int = 1 << 20,
                        k: int = 3) -> DataFrame:
    """(id, n_maybe_grams, contaminated): Bloom-filter n-gram
    decontamination — the constant-memory variant of :func:`decontaminate`.

    At 100 TB the exact method's broadcast is the benchmark's full distinct
    n-gram STRING set; the Bloom variant broadcasts only ``k`` bit
    positions per gram out of an ``m``-bit space — a fixed-size structure
    independent of gram length, the standard trick when the membership set
    outgrows a string broadcast (and the first pass before exact
    confirmation). One-sided error: every truly shared gram is flagged
    (no false negatives); ``n_maybe_grams`` counts the doc's DISTINCT
    grams the filter cannot rule out, so a (rare) hash collision can
    overcount — callers confirm flagged docs with the exact join.

    Bit positions are md5-derived (``_md5_60(win || ':' || i) % m``) so the
    DuckDB oracle reproduces them bit-for-bit; the relational form keeps
    the whole thing pure Catalyst: the position table IS the bitset, and
    the probe is explode → broadcast-hash join → all-k check — the corpus
    side never shuffles on the gram.
    """
    bcol = bench_text_col or text_col
    ks = F.sequence(F.lit(0), F.lit(k - 1))

    def positions(win: F.Column) -> F.Column:
        return F.explode(
            F.transform(ks, lambda i: F.pmod(
                _md5_60(F.concat(win, F.lit(":"), i.cast("string"))),
                F.lit(m))))

    bits = (_explode_windows(bench_df, bcol, n).distinct()
        .select(positions(F.col("win")).alias("pos"))
        .distinct())
    grams = _explode_windows(df, text_col, n, id_col=id_col).distinct()
    probe = grams.select("id", "win", positions(F.col("win")).alias("pos"))
    maybe = (probe.join(F.broadcast(bits), "pos", "left_semi")
             .groupBy("id", "win").agg(F.count("*").alias("hits"))
             .where(F.col("hits") == k)
             .groupBy("id").agg(F.count("*").alias("n_maybe_grams")))
    ids = df.select(F.col(id_col).alias("id"))
    return (ids.join(maybe, "id", "left")
            .select("id",
                    F.coalesce("n_maybe_grams", F.lit(0)).cast("long")
                    .alias("n_maybe_grams"))
            .withColumn("contaminated", F.col("n_maybe_grams") > 0))


def jaccard_prefix_pairs(df: DataFrame, id_col: str, text_col: str,
                         threshold: float = 0.5, n: int = 1) -> DataFrame:
    """(id_a, id_b, jaccard): EXACT token-n-gram-set Jaccard ≥ threshold
    via prefix filtering (AllPairs/PPJoin) — the exact-similarity join
    that scales WITHOUT the hub-gram cap ngram_jaccard_pairs needs.
    ``n=1`` joins on unigram token sets; ``n≥2`` on token n-grams (the
    granularity where near-dup thresholds are discriminative — unigram
    SETS of templated web text overlap heavily across unrelated docs).

    Order every token by global rarity (document frequency asc, token
    asc). Two sets with ``J(a,b) ≥ t`` MUST share a token inside each
    set's prefix of length ``|x| − ⌈t·|x|⌉ + 1`` under that shared order
    (if all prefix tokens mismatched, the overlap left in the suffixes is
    too small to reach t). So candidates come only from prefix-token
    collisions — and prefixes hold each document's RAREST tokens, which
    makes the candidate self-join structurally skew-free: the "of the"
    hub token that detonates the naive shared-token join never enters a
    prefix of a document with more than a handful of tokens. No recall
    loss, no cap semantics — the filter is lossless by construction (the
    oracle runs the naive all-shared-token join and must agree exactly).

    Shape at scale: one shuffle to attach document frequencies, one
    groupBy(doc) to build the sorted set, one self-join on PREFIX tokens
    only, then per-candidate exact verification with ``array_intersect``
    on the carried sorted sets (bounded by per-doc set size). Jaccard is
    one exact division, rounded to 6.
    """
    # tokens bound in their own projection first — an inlined chain in
    # the n-gram lambda re-tokenizes the text per position (O(len²)/doc)
    tokd = df.select(
        F.col(id_col).alias("id"),
        F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                 lambda t: t != "").alias("_toks"))
    toks = F.col("_toks")
    if n > 1:
        units = F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - n + 1),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array(F.array_join(toks, " ")))
    else:
        units = toks
    tok_rows = (tokd.select("id",
                            F.explode(F.array_distinct(units)).alias("tok"))
                .where(F.col("tok") != ""))
    dfreq = tok_rows.groupBy("tok").agg(F.count("*").alias("dfreq"))
    per_doc = (tok_rows.join(dfreq, "tok")
               .groupBy("id")
               .agg(F.array_sort(F.collect_list(
                        F.struct("dfreq", "tok"))).alias("ordered"),
                    F.count("*").alias("n_tok")))
    # ε-guard: if t·n is mathematically an integer k but the float product
    # lands at k+ε, ceil() returns k+1 and the prefix goes one token short
    # — a silent false-negative. Realistic |t·n| keeps float error ≪ 1e-9,
    # so subtracting it never under-rounds a genuine fraction.
    prefix_len = (F.col("n_tok")
                  - F.ceil(F.lit(threshold) * F.col("n_tok") - F.lit(1e-9))
                  + 1).cast("int")
    prefixes = per_doc.select(
        "id",
        F.explode(F.slice(
            F.transform(F.col("ordered"), lambda x: x["tok"]),
            F.lit(1), prefix_len)).alias("tok"))
    cand = (prefixes.alias("a").join(prefixes.alias("b"), "tok")
            .where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct())
    sets = per_doc.select(
        "id", F.transform(F.col("ordered"), lambda x: x["tok"]).alias("ts"),
        "n_tok")
    out = (cand
           .join(sets.withColumnsRenamed(
               {"id": "id_a", "ts": "ta", "n_tok": "na"}), "id_a")
           .join(sets.withColumnsRenamed(
               {"id": "id_b", "ts": "tb", "n_tok": "nb"}), "id_b")
           .withColumn("inter",
                       F.size(F.array_intersect("ta", "tb")).cast("long"))
           .withColumn("_j",
                       F.col("inter").cast("double")
                       / (F.col("na") + F.col("nb") - F.col("inter"))
                       .cast("double")))
    # threshold on the UNROUNDED value: the prefix theorem guarantees
    # candidates only for true J >= t — filtering on round(J, 6) would
    # admit pairs at J in [t−5e-7, t) that never became candidates
    return (out.where(F.col("_j") >= threshold)
            .select("id_a", "id_b", F.round(F.col("_j"), 6).alias("jaccard")))


def bag_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                      min_jaccard: float = 0.5,
                      max_df: int = 1000) -> DataFrame:
    """(id_a, id_b, inter_w, total_a, total_b, bag_jaccard): EXACT
    multiset (weighted) Jaccard over token COUNTS —
    ``Σ_t min(c_a,c_b) / Σ_t max(c_a,c_b)`` — the frequency-aware
    sibling of set-based ``ngram_jaccard_pairs``: a page that repeats
    one template sentence 50 times shares nearly all its DISTINCT
    tokens with a page containing it once (set Jaccard high), but its
    token BAG is dominated by the repeats (bag Jaccard low), so the
    multiset view separates true near-dups from repetition artifacts.

    Only ``Σ min`` over shared tokens is ever joined for —
    ``Σ max = total_a + total_b − Σ min`` — so the pair computation is
    one equi-join on token plus two broadcastable total lookups; all
    accumulations are int64 counts, the single final division is the
    only float (bit-identical cross-engine).

    Skew guard (same recipe as the rare-gram profile): tokens whose
    document frequency exceeds ``max_df`` are dropped from counts and
    totals alike — the token self-join is quadratic per hub token, and
    "the"/"and" class hubs would detonate it at corpus scale. Jaccard
    stays exact w.r.t. the filtered vocabulary.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != "")
    tc = (df.select(F.col(id_col).alias("id"), F.explode(toks).alias("tok"))
          .groupBy("id", "tok").agg(F.count("*").alias("c")))
    hub = (tc.groupBy("tok").agg(F.count("*").alias("df"))
           .where(F.col("df") > max_df).select("tok"))
    tc = tc.join(F.broadcast(hub), "tok", "left_anti")
    totals = tc.groupBy("id").agg(F.sum("c").alias("total"))
    inter = (
        tc.alias("a").join(tc.alias("b"), "tok")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.sum(F.least(F.col("a.c"), F.col("b.c"))).alias("inter_w"))
    )
    out = (
        inter
        .join(totals.withColumnsRenamed({"id": "id_a", "total": "total_a"}),
              "id_a")
        .join(totals.withColumnsRenamed({"id": "id_b", "total": "total_b"}),
              "id_b")
        .withColumn(
            "_bj",
            F.col("inter_w")
            / (F.col("total_a") + F.col("total_b") - F.col("inter_w"))
            .cast("double"))
        .where(F.col("_bj") >= min_jaccard)
    )
    return out.select(
        "id_a", "id_b", "inter_w", "total_a", "total_b",
        F.round(F.col("_bj"), 6).alias("bag_jaccard"))
