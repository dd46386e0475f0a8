"""Corpus-assembly operators: deterministic sampling + sequence packing.

The last mile of a training-data pipeline: pick a reproducible subset
per stratum (language/source quotas) and lay documents out into
fixed-size token blocks for the trainer. Both are deterministic
functions of the data — rerunning on the same table gives byte-identical
assignments, which is what makes checkpoint/resume and multi-team
reproduction possible.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(df: DataFrame, key_col: str, id_col: str,
                      k: int) -> DataFrame:
    """Keep a deterministic pseudo-random ``k`` rows per ``key_col``
    stratum: rank by ``md5(key:id)`` (a stable shuffle, not "first k in
    storage order" — that would bias toward old crawl segments), tie-break
    on id. One shuffle on the stratum key; row_number needs no global
    sort. Returns (id, key, sample_rank).
    """
    h = F.md5(F.concat_ws(":", F.col(key_col), F.col(id_col).cast("string")))
    w = Window.partitionBy(key_col).orderBy(h, F.col(id_col))
    return (df.select(F.col(id_col).alias("id"),
                      F.col(key_col).alias("key"),
                      F.row_number().over(w).alias("sample_rank"))
            .where(F.col("sample_rank") <= k))


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    chunk_tokens: int = 64, stride: int = 48) -> DataFrame:
    """(id, chunk_id, start_token, n_tokens, chunk_text): overlapping
    fixed-size token windows per document — the chunking step every
    embedding/RAG pipeline runs before vectorizing.

    Chunks start at token 1, 1+stride, 1+2·stride, … (1-based over the
    space-split non-empty tokens); the last chunk may be short; a doc
    shorter than one chunk yields a single chunk with all its tokens;
    empty docs yield nothing. ``stride < chunk_tokens`` gives overlap.

    Pure Catalyst narrow map (one explode, no shuffle) — chunk count per
    doc is 1 + ceil(max(n-chunk,0)/stride), computed in integer math so
    the DuckDB oracle reproduces it exactly. The when() guard keeps the
    sequence() total (sequence(0,-1) DESCENDS — see _token_windows).
    """
    if stride < 1:
        raise ValueError("stride must be >= 1")
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    base = df.select(F.col(id_col).alias("id"), toks.alias("t"),
                     F.size(toks).cast("long").alias("n"))
    extra = (F.greatest(F.col("n") - chunk_tokens, F.lit(0))
             + (stride - 1)) / stride
    nc = F.lit(1) + F.floor(extra).cast("int")
    chunks = F.when(
        F.col("n") > 0, F.sequence(F.lit(0), nc - 1)
    ).otherwise(F.array().cast("array<int>"))
    start = lambda i: (F.lit(1) + i * stride).cast("long")  # noqa: E731
    return (base.select("id", "t", "n", F.explode(chunks).alias("i"))
            .select(
                "id", F.col("i").alias("chunk_id"),
                start(F.col("i")).alias("start_token"),
                F.least(F.lit(chunk_tokens).cast("long"),
                        F.col("n") - start(F.col("i")) + 1).alias("n_tokens"),
                F.array_join(
                    F.slice("t", start(F.col("i")).cast("int"), chunk_tokens),
                    " ").alias("chunk_text")))


def pack_sequences(df: DataFrame, id_col: str, text_col: str,
                   block_tokens: int = 2048,
                   num_ranges: int = 64) -> DataFrame:
    """Assign each document its position in the packed token stream:
    documents concatenate in ``id_col`` order and fixed blocks of
    ``block_tokens`` are cut across document boundaries (standard LM
    packing). Returns (id, n_tokens, start_token, block_id, block_offset)
    where block_id/block_offset locate the document's first token.

    Scale shape: a naive ``Window.orderBy(id)`` running sum would drag
    the whole corpus through ONE partition. Instead: range-repartition by
    id, per-partition running sums (window partitioned by the range id),
    and a driver-side prefix of the ~``num_ranges`` per-partition
    subtotals broadcast-joined back — the classic two-phase scan. The
    only all-data shuffle is the range partitioning itself.

    Token count = non-empty single-space words (mirrors the repetition /
    textstats tokenization so the oracle can reproduce it exactly).
    """
    toks = F.size(F.filter(F.split(F.col(text_col), " "),
                           lambda t: t != "")).cast("long")
    base = (df.select(F.col(id_col).alias("id"), toks.alias("n_tokens"))
            .repartitionByRange(num_ranges, F.col("id"))
            .withColumn("_pid", F.spark_partition_id()))
    # ~num_ranges rows: the per-range subtotals ARE driver-size by design
    subtotals = (base.groupBy("_pid").agg(F.sum("n_tokens").alias("_sub"))
                 .orderBy("_pid").collect())
    prefix, acc = [], 0
    for r in subtotals:
        prefix.append((r["_pid"], acc))
        acc += r["_sub"]
    pref_df = F.broadcast(
        base.sparkSession.createDataFrame(prefix, "_pid int, _prefix long"))
    w = Window.partitionBy("_pid").orderBy("id")
    return (base.join(pref_df, "_pid")
            .withColumn("_cum", F.sum("n_tokens").over(w))
            .select(
                "id", "n_tokens",
                (F.col("_prefix") + F.col("_cum") - F.col("n_tokens"))
                .alias("start_token"))
            .withColumn("block_id",
                        F.floor(F.col("start_token") / block_tokens))
            .withColumn("block_offset",
                        F.col("start_token") % block_tokens))


def corpus_rollup(df: DataFrame, dims: Sequence[str], size_col: str,
                  all_label: str = "<all>") -> DataFrame:
    """Hierarchical corpus accounting: one ROLLUP over ``dims`` giving
    per-(d1, d2, ...), per-d1-subtotal, and grand-total rows in a single
    pass — (dims..., n_rows, total_size, avg_size).

    Subtotal levels show ``all_label`` instead of NULL, distinguished from
    GENUINE NULL dim values via ``grouping()`` (a real NULL group renders
    as ``<null>``, never conflated with a subtotal), so the output needs
    no grouping-id column and stays engine-portable. ``avg_size`` is the
    single exact division total/n (both int64), bit-reproducible.

    Scale shape: Spark executes rollup as ONE Expand + ONE hash aggregate
    with map-side partial agg — (levels+1)× the agg input rows, zero extra
    shuffles vs a flat groupBy. The alternative (one groupBy per level +
    union) re-reads the table per level.
    """
    agged = df.rollup(*dims).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col(size_col)).alias("total_size"),
        *[F.grouping(d).alias(f"_g_{d}") for d in dims],
    )
    out_dims = [
        F.when(F.col(f"_g_{d}") == 1, all_label)
        .otherwise(F.coalesce(F.col(d).cast("string"), F.lit("<null>")))
        .alias(d)
        for d in dims]
    return agged.select(
        *out_dims, "n_rows", "total_size",
        (F.col("total_size") / F.col("n_rows")).alias("avg_size"))


def group_quantiles(df: DataFrame, group_col: str, value_col: str,
                    probs: Sequence[float] = (0.25, 0.5, 0.75, 0.9),
                    approx: bool = False) -> DataFrame:
    """Per-group distribution stats: (group, n, min, max, p{25,50,...}).

    Exact mode uses ``percentile`` (linear interpolation, the same type-7
    estimator DuckDB's ``quantile_cont`` implements) — a per-group sort,
    fine up to groups that fit a task's spill budget and what the oracle
    checks. ``approx=True`` switches to ``approx_percentile`` (KLL-style
    mergeable sketch, no per-group sort) — the 100-TB path, same schema,
    rows-only checkable since sketch error is implementation-defined.
    """
    v = F.col(value_col)
    if approx:
        q = F.percentile_approx(v, list(probs))
    else:
        q = F.percentile(v, F.array(*[F.lit(p) for p in probs]))
    names = [f"p{int(round(p * 100))}" for p in probs]  # 0.57*100=56.999…
    return (df.groupBy(F.col(group_col).alias("grp"))
            .agg(F.count("*").alias("n"),
                 F.min(v).alias("vmin"),
                 F.max(v).alias("vmax"),
                 q.alias("_q"))
            .select("grp", "n", "vmin", "vmax",
                    *[F.round(F.col("_q")[i].cast("double"), 6).alias(nm)
                      for i, nm in enumerate(names)]))


def weighted_sample(df: DataFrame, key_col: str, id_col: str,
                    weight_col: str, k: int) -> DataFrame:
    """Deterministic weighted sampling without replacement, ``k`` rows per
    stratum (Efraimidis–Spirakis A-ES): item i gets priority
    ``-ln(u_i)/w_i`` with ``u_i`` md5-derived from (key, id); the k
    SMALLEST priorities win, which selects each item with probability
    proportional to its weight — the quality-weighted corpus subsample.

    The md5-derived ``u`` makes the draw a pure function of the data
    (rerun-stable, resume-safe — the stratified_sample contract, with
    weights). Priorities are int64-scaled (×1e9) so ordering is engine-
    exact; ties break on id. Non-positive weights are excluded (they have
    no sampling probability).

    Scale shape: one narrow map for the priority, one shuffle on the
    stratum key for the per-key top-k; the map side could pre-prune to
    local k minima (same as any top-k). No global sort.
    """
    h = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.col(key_col), F.col(id_col).cast("string"))), 1, 15),
        16, 10).cast("long")
    u = (h + F.lit(1).cast("long")).cast("double") / F.lit(float(1 << 60))
    w = F.col(weight_col).cast("double")
    p = F.round(-F.log(u) / w * F.lit(1e9), 0).cast("long")
    base = (df.where(w > 0)
            .select(F.col(key_col).alias("key"),
                    F.col(id_col).alias("id"),
                    F.col(weight_col).alias("weight"),
                    p.alias("priority_scaled")))
    win = Window.partitionBy("key").orderBy("priority_scaled", "id")
    return (base.withColumn("sample_rank", F.row_number().over(win))
            .where(F.col("sample_rank") <= k))


def group_trend(df: DataFrame, group_col: str, ts_col: str,
                value_col: str) -> DataFrame:
    """(grp, n, slope, intercept): closed-form least-squares trend of a
    value over time per group — drift detection over event streams /
    crawl-quality time series without any iterative fitting.

    x = whole minutes since the group's first event (exact int64 via
    timestamp_diff, works for TIMESTAMP and _NTZ); y = value in int64
    cents. The five sufficient statistics (n, Σx, Σy, Σxy, Σx²) are
    exact integer sums; the slope/intercept combine them in ONE fixed
    double expression, identical in both engines. Degenerate groups
    (single point / zero time spread) yield NULL slope rather than a
    division blow-up.

    Shape: one window (min ts per group) + one groupBy on the SAME key —
    the aggregate reuses the window's partitioning, so the whole operator
    costs a single shuffle.
    """
    g = F.col(group_col)
    w = Window.partitionBy(group_col)
    diff = F.timestamp_diff("MICROSECOND", F.min(ts_col).over(w),
                            F.col(ts_col))
    y = F.round(F.col(value_col) * 100, 0).cast("long")
    # integer `div`, NOT double /-then-cast: a double quotient of an exact
    # multiple can land at k−ε and truncate to k−1
    base = (df.select(g.alias("grp"), diff.alias("diff_us"), y.alias("y"))
            .select("grp", F.expr("diff_us div 60000000").alias("x"), "y"))
    s = base.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"))
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    denom = nd * sxx - sx * sx
    slope = F.when(denom != 0, (nd * sxy - sx * sy) / denom)
    intercept = F.when(denom != 0, (sy - (nd * sxy - sx * sy) / denom * sx) / nd)
    return s.select("grp", "n",
                    F.round(slope, 6).alias("slope"),
                    F.round(intercept, 6).alias("intercept"))


def corpus_split(df: DataFrame, id_col: str,
                 ratios: Sequence[tuple[str, int]] = (
                     ("train", 9800), ("val", 100), ("test", 100)),
                 salt: str = "split") -> DataFrame:
    """(id, bucket, split): deterministic train/val/test assignment —
    bucket = md5(salt:id) mod 10000, split by cumulative basis points.

    Hash-based (not row-number-based) so membership depends ONLY on the
    id: re-running on a grown corpus never moves an existing document
    between splits (the leakage-by-reshuffle failure mode), and any shard
    can be assigned independently — a narrow map, no shuffle at all.
    ``salt`` versions the split; ratios are integer basis points summing
    to ≤ 10000 (any remainder falls into the last split).
    """
    bps = [b for _, b in ratios]
    if sum(bps) > 10000:
        raise ValueError("ratios exceed 10000 basis points")
    h = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit(salt), F.col(id_col).cast("string"))), 1, 15),
        16, 10).cast("long")
    bucket = F.pmod(h, F.lit(10000))
    expr = None
    acc = 0
    for name, width in ratios:
        acc += width
        cond = bucket < acc
        expr = (F.when(cond, name) if expr is None
                else expr.when(cond, name))
    expr = expr.otherwise(ratios[-1][0])
    return df.select(F.col(id_col).alias("id"), bucket.alias("bucket"),
                     expr.alias("split"))


def zorder_key(df: DataFrame, col_a: str, col_b: str,
               bits: int = 16, file_bits: int = 6) -> DataFrame:
    """(…df columns…, zkey, file_bucket): Morton/Z-order interleaving of
    two non-negative integer dimensions — the lakehouse layout primitive
    (Delta ``OPTIMIZE ZORDER``): rows close in BOTH dimensions land in
    the same file bucket, so a scan filtering on either column prunes
    most buckets instead of only the one it was range-partitioned by.

    The low ``bits`` bits of each dimension interleave (a→even, b→odd
    positions); ``file_bucket`` is the key's top ``file_bits`` bits —
    the 2^file_bits-way layout assignment a writer would partition by.
    Pure integer bit arithmetic in one narrow map: no shuffle here; the
    shuffle is whatever repartition the caller does ON the bucket.
    """
    mask = (1 << bits) - 1
    terms_a = " | ".join(
        f"(((__za >> {i}) & 1) << {2 * i})" for i in range(bits))
    terms_b = " | ".join(
        f"(((__zb >> {i}) & 1) << {2 * i + 1})" for i in range(bits))
    with_dims = df.withColumns({
        "__za": F.col(col_a).cast("long").bitwiseAND(F.lit(mask)),
        "__zb": F.col(col_b).cast("long").bitwiseAND(F.lit(mask)),
    })
    keyed = with_dims.withColumn(
        "zkey", F.expr(f"({terms_a}) | ({terms_b})").cast("long"))
    return (keyed
            .withColumn("file_bucket",
                        F.expr(f"zkey >> {2 * bits - file_bits}")
                        .cast("long"))
            .drop("__za", "__zb"))


def cluster_split(members: DataFrame, cluster_col: str = "cluster_id",
                  id_col: str = "doc_id",
                  ratios: Sequence[tuple[str, int]] = (
                      ("train", 9800), ("val", 100), ("test", 100)),
                  salt: str = "split") -> DataFrame:
    """(id, cluster, bucket, split): LEAKAGE-SAFE train/val/test split —
    the hash is taken over the CLUSTER id, so every member of a near-dup
    cluster lands in the same split.

    ``corpus_split`` hashes the document id, which is growth-stable but
    leaks: two near-duplicate documents hash independently, and a test
    document with a train-side twin inflates eval scores (the classic
    contamination mode that motivates dedup-before-split). Splitting on
    the cluster key closes that channel for every duplicate the ER
    clustering catches, while keeping all of corpus_split's properties —
    deterministic, growth-stable (clusters keep their min-id key as they
    absorb members only if the canonical member is stable; re-clustered
    corpora re-version via ``salt``), and a narrow map + one equi-join.
    """
    assign = corpus_split(
        members.select(F.col(cluster_col)).distinct(),
        cluster_col, ratios=ratios, salt=salt)
    return (members
            .join(assign.withColumnRenamed("id", cluster_col), cluster_col)
            .select(F.col(id_col).alias("id"),
                    F.col(cluster_col).alias("cluster"),
                    "bucket", "split"))


def zipf_curve(df: DataFrame, id_col: str, text_col: str,
               top_k: int = 100) -> DataFrame:
    """(rank, token, freq, ln_rank_e7, ln_freq_e7, slope) — the corpus's
    Zipf rank-frequency profile plus the fitted log-log slope (healthy
    natural-language crawls sit near -1; machine-generated or
    boilerplate-flooded corpora drift off it — the cheapest whole-corpus
    health monitor there is).

    Numeric discipline: ln(rank) and ln(freq) snap to int64 at 1e7 scale
    (lm.py convention), the least-squares moments accumulate in
    decimal(38,0) (clustereval ARI convention — e7 squares overflow
    int64), and ONLY the final slope ratio touches floats (round-6).
    Top-k selection is a distributed TakeOrdered, not a global window.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
    )
    freq = (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token").agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(top_k)
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("token").asc())
    pts = (
        freq.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "ln_rank_e7",
            F.round(F.log(F.col("rank").cast("double")) * 1e7, 0)
            .cast("long"),
        )
        .withColumn(
            "ln_freq_e7",
            F.round(F.log(F.col("freq").cast("double")) * 1e7, 0)
            .cast("long"),
        )
    )
    dec = "decimal(38,0)"
    x = F.col("ln_rank_e7").cast(dec)
    y = F.col("ln_freq_e7").cast(dec)
    m = pts.agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    slope = F.round(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("double"),
        6,
    )
    return (
        pts.crossJoin(F.broadcast(m.select(slope.alias("slope"))))
        .select("rank", "token", "freq", "ln_rank_e7", "ln_freq_e7",
                "slope")
    )


def heaps_curve(df: DataFrame, id_col: str, text_col: str,
                buckets: int = 20) -> DataFrame:
    """(bucket, n_tokens, new_types, cum_tokens, cum_types) — vocabulary
    growth (Heaps' law) at bucket granularity: documents are laid out in
    id order, coarsened into ``buckets`` id-range buckets, and each
    bucket reports the token instances it adds and the types seen for
    the FIRST time in it, plus the running totals.

    A corpus whose type curve flattens too early is template-flooded; one
    that grows too fast is noise/codes — either way the diagnostic fires
    before any model is trained.  All integer arithmetic end to end.

    Scale shape: bucket = floor(id·B/(max_id+1)) — one broadcast max +
    a narrow map (id order is the crawl-order proxy; bucket sizes follow
    the id distribution).  First-seen bucket per type is one groupBy
    min; the cumulative window runs over ``buckets`` rows, never over
    documents.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
    )
    base = df.select(F.col(id_col).cast("long").alias("id"),
                     toks.alias("toks"))
    mx = base.agg((F.max("id") + 1).alias("mx"))
    bucketed = base.crossJoin(F.broadcast(mx)).select(
        F.floor(F.col("id") * buckets / F.col("mx")).cast("long")
        .alias("bucket"),
        "toks",
    )
    per_bucket = bucketed.groupBy("bucket").agg(
        F.sum(F.size("toks")).cast("long").alias("n_tokens")
    )
    first_seen = (
        bucketed.select("bucket", F.explode("toks").alias("token"))
        .groupBy("token").agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket").agg(F.count("*").cast("long").alias("new_types"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket.join(first_seen, "bucket", "left")
        .na.fill({"new_types": 0})
        .select(
            "bucket", "n_tokens", "new_types",
            F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
            F.sum("new_types").over(w).cast("long").alias("cum_types"),
        )
    )


def corpus_diversity(df: DataFrame, id_col: str, text_col: str,
                     group_col: str, sample_per_group: int = 30) -> DataFrame:
    """(group, n_sampled, n_pairs, mean_pairwise_jaccard, diversity):
    lexical diversity per corpus slice — 1 − mean pairwise multiset
    (bag) Jaccard over a DETERMINISTIC sample of each group's
    ``sample_per_group`` smallest ids. The cheap self-BLEU stand-in the
    curation dashboards want: a slice whose pages all paraphrase one
    template scores low diversity even when no pair crosses a dedup
    threshold.

    The pair stage is sample², never corpus² — at 100 TB the sampled
    token-count table is a few thousand rows per group and broadcasts.
    Determinism: per-pair Jaccard is one division of exact int64 token
    counts, snapped to 1e6 before the group mean (the NMI recipe); the
    sample is order-free (smallest ids, no RNG).
    """
    from pyspark.sql import Window as W
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != "")
    win = W.partitionBy("grp").orderBy("id")
    samp = (df.select(F.col(id_col).alias("id"),
                      F.col(group_col).alias("grp"), toks.alias("_t"))
            .withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") <= sample_per_group))
    tc = (samp.select("id", "grp", F.explode("_t").alias("tok"))
          .groupBy("id", "grp", "tok").agg(F.count("*").alias("c")))
    totals = tc.groupBy("id").agg(F.sum("c").alias("total"))
    inter = (
        tc.alias("a").join(tc.alias("b"),
                           (F.col("a.tok") == F.col("b.tok"))
                           & (F.col("a.grp") == F.col("b.grp")))
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.grp").alias("grp"),
                 F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.sum(F.least(F.col("a.c"), F.col("b.c"))).alias("iw"))
    )
    # all sampled pairs, including zero-overlap ones (their Jaccard is 0
    # and must enter the mean) — build the pair frame from the sample
    ids = samp.select("id", "grp")
    pairs = (ids.alias("x").join(ids.alias("y"), "grp")
             .where(F.col("x.id") < F.col("y.id"))
             .select("grp", F.col("x.id").alias("id_a"),
                     F.col("y.id").alias("id_b")))
    j = (pairs.join(inter, ["grp", "id_a", "id_b"], "left")
         .join(totals.withColumnsRenamed({"id": "id_a", "total": "ta"}),
               "id_a")
         .join(totals.withColumnsRenamed({"id": "id_b", "total": "tb"}),
               "id_b")
         .select(
             "grp",
             F.round(F.coalesce(F.col("iw"), F.lit(0))
                     / (F.col("ta") + F.col("tb")
                        - F.coalesce(F.col("iw"), F.lit(0)))
                     .cast("double") * 1_000_000, 0)
             .cast("long").alias("jm")))
    n_s = samp.groupBy(F.col("grp")).agg(F.count("*").alias("n_sampled"))
    per = j.groupBy("grp").agg(F.count("*").alias("n_pairs"),
                               F.sum("jm").alias("js"))
    return (per.join(n_s, "grp")
            .select(F.col("grp").alias("group"), "n_sampled", "n_pairs",
                    F.round(F.col("js") / (F.col("n_pairs")
                                           * F.lit(1_000_000.0)), 6)
                    .alias("mean_pairwise_jaccard"),
                    F.round(F.lit(1.0) - F.col("js")
                            / (F.col("n_pairs") * F.lit(1_000_000.0)), 6)
                    .alias("diversity")))
