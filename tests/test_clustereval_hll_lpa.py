"""B-cubed/ARI clustering evaluation, HLL sketch, label propagation,
and the tf-idf cosine prefix join."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spikex_spark.operators.clustereval import (adjusted_rand_index,
                                                bcubed_metrics)
from spikex_spark.operators import hll as H
from spikex_spark.operators.lpa import community_sizes, label_propagation


def _pg(spark):
    pred = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "c")],
        ["id", "pred"])
    gold = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, "y"), (5, "y"), (6, "z")],
        ["id", "gold"])
    return pred, gold


def test_bcubed_hand_computed(spark):
    pred, gold = _pg(spark)
    row = bcubed_metrics(pred, gold).collect()[0]
    # per-item precision: 2/3,2/3,1/3,1,1,1 -> 14/18; recall mirrors
    assert row["n_items"] == 6
    assert row["precision"] == round(14 / 18, 6)
    assert row["recall"] == round(14 / 18, 6)
    assert row["f1"] == round(14 / 18, 6)


def test_bcubed_identity_is_perfect(spark):
    pred, _ = _pg(spark)
    row = bcubed_metrics(
        pred, pred.withColumnRenamed("pred", "gold")).collect()[0]
    assert (row["precision"], row["recall"], row["f1"]) == (1.0, 1.0, 1.0)


def test_bcubed_singletons_vs_one_cluster(spark):
    # pred all-singletons, gold one cluster: precision 1, recall 1/n
    n = 8
    pred = spark.createDataFrame([(i, i) for i in range(n)], ["id", "pred"])
    gold = spark.createDataFrame([(i, 0) for i in range(n)], ["id", "gold"])
    row = bcubed_metrics(pred, gold).collect()[0]
    assert row["precision"] == 1.0
    assert row["recall"] == round(1 / n, 6)


def test_ari_hand_computed(spark):
    pred, gold = _pg(spark)
    row = adjusted_rand_index(pred, gold).collect()[0]
    # cells (a,x)=2 (a,y)=1 (b,y)=2 (c,z)=1 -> S_c=2, S_a=4, S_b=4, S_n=15
    assert (row["s_cells"], row["s_pred"], row["s_gold"]) == (2, 4, 4)
    assert row["ari"] == round(2 * (2 * 15 - 16) / (15 * 8 - 32), 6)


def test_ari_identity_and_degenerate(spark):
    pred, _ = _pg(spark)
    assert adjusted_rand_index(
        pred, pred.withColumnRenamed("pred", "gold")).collect()[0]["ari"] == 1.0
    # both all-singletons: den2 == 0 -> convention 1.0
    p = spark.createDataFrame([(i, i) for i in range(4)], ["id", "pred"])
    g = spark.createDataFrame([(i, i + 10) for i in range(4)], ["id", "gold"])
    assert adjusted_rand_index(p, g).collect()[0]["ari"] == 1.0


def test_hll_registers_dense_and_bounded(spark):
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(300)], ["grp", "v"])
    regs = H.hll_registers(df, "grp", "v").collect()
    assert len(regs) == 64                      # dense: every register
    assert all(0 <= r["rho"] <= 57 for r in regs)
    assert {r["register"] for r in regs} == set(range(64))


def test_hll_estimate_raw_and_linear_counting(spark):
    big = spark.createDataFrame(
        [("big", f"v{i}") for i in range(2000)], ["grp", "v"])
    small = spark.createDataFrame(
        [("small", f"w{i}") for i in range(40)], ["grp", "v"])
    est = {r["grp"]: r for r in H.hll_estimate(
        H.hll_registers(big.union(small), "grp", "v")).collect()}
    # raw regime (m=64 -> ~13% stddev; allow 3 sigma)
    assert abs(est["big"]["est_distinct"] - 2000) / 2000 < 0.4
    # linear-counting regime: must engage (v_zero > 0) and be close
    assert est["small"]["v_zero"] > 0
    lc = 64.0 * math.log(64.0 / est["small"]["v_zero"])
    assert est["small"]["est_distinct"] == round(lc, 4)
    assert abs(est["small"]["est_distinct"] - 40) / 40 < 0.35


def test_hll_merge_equals_single_pass(spark):
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(500)] +
        [("h", f"u{i}") for i in range(80)], ["grp", "v"])
    a = df.where(F.col("v") < "u9")       # split is arbitrary, overlapping
    b = df.where(F.col("v") >= "u4")
    merged = H.hll_merge(H.hll_registers(a, "grp", "v"),
                         H.hll_registers(b, "grp", "v"))
    full = H.hll_registers(df, "grp", "v")
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_hll_group_only_in_one_shard_survives_merge(spark):
    a = spark.createDataFrame([("only_a", "x1"), ("both", "y1")],
                              ["grp", "v"])
    b = spark.createDataFrame([("both", "y2")], ["grp", "v"])
    merged = H.hll_merge(H.hll_registers(a, "grp", "v"),
                         H.hll_registers(b, "grp", "v"))
    grps = {r["grp"] for r in merged.select("grp").distinct().collect()}
    assert grps == {"only_a", "both"}


def test_lpa_two_triangles_with_bridge(spark):
    from spikex_spark.operators.graph import undirected
    ed = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"),
         ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d")], ["src", "dst"])
    lab = {r["id"]: r["label"]
           for r in label_propagation(undirected(ed), rounds=3).collect()}
    assert lab["a"] == lab["b"] == lab["c"]
    assert lab["d"] == lab["e"] == lab["f"]
    assert lab["a"] != lab["d"]          # the bridge must NOT merge them
    sizes = {r["label"]: r["size"]
             for r in community_sizes(
                 label_propagation(undirected(ed), rounds=3)).collect()}
    assert sorted(sizes.values()) == [3, 3]


def test_lpa_deterministic_min_label_ties(spark):
    from spikex_spark.operators.graph import undirected
    # a path a-b: round 1 votes tie 1-1 everywhere -> min label wins
    ed = spark.createDataFrame([("b", "a")], ["src", "dst"])
    lab = {r["id"]: r["label"]
           for r in label_propagation(undirected(ed), rounds=2).collect()}
    assert lab == {"a": "a", "b": "a"}


def test_cosine_prefix_join_matches_naive(spark):
    from spikex_spark.operators.cosinejoin import cosine_tfidf_pairs
    # deterministic subset (limit() can re-pick rows across jobs)
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").where("doc_id <= 150")
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in cosine_tfidf_pairs(
               docs, "doc_id", "text", threshold_pct=70).collect()}
    # naive reference: exact integer weights, all shared-token pairs
    toks = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(F.filter(
            F.split(F.lower("text"), "[^a-z0-9]+"),
            lambda t: t != "")).alias("tok")
    ).groupBy("id", "tok").agg(F.count("*").alias("tf"))
    n_docs = toks.select("id").distinct().count()
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("dfq"))
    w = (toks.join(dfreq, "tok")
         .select("id", "tok",
                 (F.col("tf") * F.round(
                     F.log(F.lit(1.0) + F.lit(float(n_docs)) / F.col("dfq"))
                     * 1000).cast("long")).alias("w")))
    norms = {r["id"]: r["n"] for r in
             w.groupBy("id").agg(
                 F.sum(F.col("w") * F.col("w")).alias("n")).collect()}
    dots = (w.alias("a").join(w.alias("b"), "tok")
            .where(F.col("a.id") < F.col("b.id"))
            .groupBy(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"))
            .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot")).collect())
    want = {}
    for r in dots:
        c = r["dot"] / math.sqrt(float(norms[r["ia"]]) * float(norms[r["ib"]]))
        if c >= 0.70:
            want[(r["ia"], r["ib"])] = round(c, 6)
    assert got == want
    assert len(got) > 0                  # synth near-dups must trigger


def test_cosine_self_similarity_is_one(spark):
    from spikex_spark.operators.cosinejoin import cosine_tfidf_pairs
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"),
         (3, "zeta eta theta")], ["doc_id", "text"])
    rows = cosine_tfidf_pairs(docs, "doc_id", "text",
                              threshold_pct=90).collect()
    assert [(r["id_a"], r["id_b"], r["cosine"])
            for r in rows] == [(1, 2, 1.0)]


def test_edit_join_matches_naive_random_short_strings(spark):
    # binary alphabet + lengths 0..8 stress the short-bucket path and
    # every segment-scheme edge; lossless means set-equal to the naive
    # cross join at every k
    import random
    from spikex_spark.operators.editjoin import edit_distance_join
    rng = random.Random(7)
    rows = [(i, "".join(rng.choice("ab") for _ in range(rng.randint(0, 8))))
            for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "key"])
    for k in (1, 2):
        got = {(r["id_a"], r["id_b"], r["dist"])
               for r in edit_distance_join(df, "id", "key", k=k).collect()}
        naive = (df.alias("a").crossJoin(df.alias("b"))
                 .where(F.col("a.id") < F.col("b.id"))
                 .select(F.col("a.id").alias("ia"),
                         F.col("b.id").alias("ib"),
                         F.levenshtein("a.key", "b.key").alias("d"))
                 .where(F.col("d") <= k).collect())
        want = {(r["ia"], r["ib"], r["d"]) for r in naive}
        assert got == want, (k, len(got), len(want))


def test_edit_join_doc_prefixes_nonempty(spark):
    from spikex_spark.operators.editjoin import edit_distance_join
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    keyed = docs.select("doc_id", F.substring("text", 1, 30).alias("key"))
    rows = edit_distance_join(keyed, "doc_id", "key", k=2).collect()
    assert all(0 <= r["dist"] <= 2 for r in rows)
    assert all(r["id_a"] < r["id_b"] for r in rows)
    assert len(rows) == len({(r["id_a"], r["id_b"]) for r in rows})


def test_mutual_best_match_rounds(spark):
    from spikex_spark.operators.matching import mutual_best_match
    # 2-3 is the local max; 1 re-points to 4 only after 2 is retired
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.95), (1, 4, 0.7)],
        ["id_a", "id_b", "score"])
    got = {(r["id_a"], r["id_b"], r["match_round"])
           for r in mutual_best_match(pairs, rounds=2).collect()}
    assert got == {(2, 3, 1), (1, 4, 2)}


def test_mutual_best_match_is_one_to_one(spark):
    from spikex_spark.operators.matching import mutual_best_match
    import random
    rng = random.Random(3)
    pairs = spark.createDataFrame(
        [(a, b, round(rng.random(), 3))
         for a in range(20) for b in range(a + 1, 20) if rng.random() < 0.3],
        ["id_a", "id_b", "score"])
    rows = mutual_best_match(pairs, rounds=3).collect()
    seen = [x for r in rows for x in (r["id_a"], r["id_b"])]
    assert len(seen) == len(set(seen))        # every node matched at most once


def test_common_neighbor_similarity_hub_cut(spark):
    from spikex_spark.operators.graph import (common_neighbor_similarity,
                                              undirected)
    ed = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("a", "y"), ("b", "y"), ("c", "y")],
        ["src", "dst"])
    rows = {(r["id_a"], r["id_b"]): r
            for r in common_neighbor_similarity(
                undirected(ed), max_center_degree=2).collect()}
    # y (deg 3) is hub-cut as a CENTER: (a,b) counts only x, not y —
    # but y still contributes to DEGREES (full-graph denominators)
    assert rows[("a", "b")]["common"] == 1
    assert rows[("a", "b")]["jaccard"] == round(1 / (2 + 2 - 1), 6)
    assert rows[("x", "y")]["common"] == 2    # wedges at a and b
    assert rows[("x", "y")]["jaccard"] == round(2 / (2 + 3 - 2), 6)
    assert ("a", "c") not in rows             # only shared neighbor is y (cut)


def test_cooccurrence_hand_counts_and_short_docs(spark):
    from spikex_spark.operators.cooc import token_cooccurrence
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "x"), (3, ""), (4, "a b")],
        ["doc_id", "text"])
    rows = {(r["w1"], r["w2"]): r
            for r in token_cooccurrence(
                docs, "doc_id", "text", window=2, min_count=1).collect()}
    # doc1 window-2 pairs: (a,b)x3 + (a,a) + (b,b); doc4 adds (a,b)
    assert rows[("a", "b")]["c_pair"] == 4
    assert rows[("a", "a")]["c_pair"] == 1
    assert rows[("b", "b")]["c_pair"] == 1
    # totals: T = 4+1+0+2 = 7 tokens, Tp = (3+2) + 0 + 0 + 1 = 6 pairs
    r = rows[("a", "b")]
    assert (r["c_w1"], r["c_w2"]) == (3, 3)
    assert r["pmi"] == round(math.log((4 * 7 * 7) / (6 * 3 * 3)), 6)
    # docs 2 and 3 (too short for any window) must not fault the stage
    assert ("x", "x") not in rows


def test_cooccurrence_min_count_bounds_output(spark):
    from spikex_spark.operators.cooc import token_cooccurrence
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lo = token_cooccurrence(docs, "doc_id", "text",
                            window=3, min_count=50).count()
    hi = token_cooccurrence(docs, "doc_id", "text",
                            window=3, min_count=5).count()
    assert 0 < lo < hi


def test_bottomk_merge_equals_single_pass(spark):
    from spikex_spark.operators.qsketch import bottomk_merge, bottomk_sample
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = ev.where(F.col("event_id") % 2 == 0)
    b = ev.where(F.col("event_id") % 2 == 1)
    merged = bottomk_merge(
        bottomk_sample(a, "event_type", "event_id", "value", k=64),
        bottomk_sample(b, "event_type", "event_id", "value", k=64), k=64)
    full = bottomk_sample(ev, "event_type", "event_id", "value", k=64)
    # set-compare via collect: exceptAll over this union+window plan trips
    # a Catalyst INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND rebinding bug
    ms = sorted(map(tuple, merged.collect()))
    fs = sorted(map(tuple, full.collect()))
    assert ms == fs


def test_sample_quantiles_small_group_is_exact(spark):
    from spikex_spark.operators.qsketch import bottomk_sample, sample_quantiles
    # group smaller than k: the sample IS the group, estimates are exact
    df = spark.createDataFrame(
        [("g", i, float(v)) for i, v in enumerate([5, 1, 9, 3, 7])],
        ["grp", "id", "v"])
    est = {r["q"]: r for r in sample_quantiles(
        bottomk_sample(df, "grp", "id", "v", k=64),
        qs=(0.25, 0.5, 1.0)).collect()}
    # sorted values [1,3,5,7,9]; ceil(.25*5)=2 -> 3; ceil(.5*5)=3 -> 5
    assert est[0.25]["est"] == 3.0
    assert est[0.5]["est"] == 5.0
    assert est[1.0]["est"] == 9.0
    assert est[0.5]["n_sample"] == 5


def test_sample_quantiles_close_to_exact_on_large_group(spark):
    from spikex_spark.operators.qsketch import bottomk_sample, sample_quantiles
    df = spark.createDataFrame(
        [("g", i, float((i * 7919) % 10007)) for i in range(5000)],
        ["grp", "id", "v"])
    est = {r["q"]: r["est"] for r in sample_quantiles(
        bottomk_sample(df, "grp", "id", "v", k=256),
        qs=(0.5,)).collect()}
    # median of a ~uniform 0..10007 population; k=256 -> stderr ~3%
    assert abs(est[0.5] - 5003) / 10007 < 0.12


def test_streaming_hll_equals_batch(spark, tmp_path):
    from spikex_spark.operators.hll import hll_sparse_registers
    from spikex_spark.streaming.stream import run_to_memory
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.mode("overwrite").parquet(str(tmp_path / "d"))
    toks_of = lambda df: df.select(
        F.col("lang").alias("g0"),
        F.explode(F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                           lambda t: t != "")).alias("token"))
    stream = spark.readStream.schema(docs.schema).parquet(
        str(tmp_path / "d"))
    drained = run_to_memory(
        hll_sparse_registers(toks_of(stream), "g0", "token"),
        "t_stream_hll", mode="complete")
    batch = hll_sparse_registers(toks_of(docs), "g0", "token")
    assert sorted(map(tuple, drained.collect())) == \
        sorted(map(tuple, batch.collect()))


def test_cluster_split_coassigns_members(spark):
    from spikex_spark.operators.corpus import cluster_split
    members = spark.createDataFrame(
        [(i, i // 3) for i in range(60)], ["doc_id", "cluster_id"])
    out = cluster_split(members)
    # every cluster maps to exactly ONE split (the leakage-safety claim)
    per = (out.groupBy("cluster")
           .agg(F.countDistinct("split").alias("n")).collect())
    assert all(r["n"] == 1 for r in per)
    assert out.count() == 60
    # and the assignment matches corpus_split of the cluster keys
    from spikex_spark.operators.corpus import corpus_split
    want = {r["id"]: r["split"] for r in corpus_split(
        members.select("cluster_id").distinct(), "cluster_id").collect()}
    got = {r["cluster"]: r["split"]
           for r in out.select("cluster", "split").distinct().collect()}
    assert got == want


# --------------------------------------------------------------------------
# clustereval.nmi_metrics
# --------------------------------------------------------------------------

def _nmi_reference(assign_pred, assign_gold):
    """Plain-float NMI over two {id: label} dicts for cross-checking."""
    from collections import Counter
    n = len(assign_pred)
    cells = Counter((assign_pred[i], assign_gold[i]) for i in assign_pred)
    a = Counter(assign_pred.values())
    b = Counter(assign_gold.values())
    i = sum(c / n * math.log(n * c / (a[p] * b[g]))
            for (p, g), c in cells.items())
    hu = sum(x / n * math.log(n / x) for x in a.values())
    hv = sum(x / n * math.log(n / x) for x in b.values())
    if hu == 0 and hv == 0:
        return 1.0
    if hu == 0 or hv == 0:
        return 0.0
    return i / math.sqrt(hu * hv)


def test_nmi_hand_computed(spark):
    from spikex_spark.operators.clustereval import nmi_metrics
    pred, gold = _pg(spark)
    row = nmi_metrics(pred, gold).collect()[0]
    ap = {1: "a", 2: "a", 3: "a", 4: "b", 5: "b", 6: "c"}
    ag = {1: "x", 2: "x", 3: "y", 4: "y", 5: "y", 6: "z"}
    assert row["n_items"] == 6
    assert abs(row["nmi"] - _nmi_reference(ap, ag)) < 1e-5


def test_nmi_identity_and_degenerate(spark):
    from spikex_spark.operators.clustereval import nmi_metrics
    pred, _ = _pg(spark)
    ident = nmi_metrics(
        pred, pred.withColumnRenamed("pred", "gold")).collect()[0]
    assert ident["nmi"] == 1.0
    # one side a single cluster: its entropy is 0 -> NMI 0
    one = spark.createDataFrame([(i, 0) for i in range(1, 7)],
                                ["id", "gold"])
    assert nmi_metrics(pred, one).collect()[0]["nmi"] == 0.0
    # both sides single clusters -> 1.0 by convention
    onep = spark.createDataFrame([(i, 9) for i in range(1, 7)],
                                 ["id", "pred"])
    assert nmi_metrics(onep, one).collect()[0]["nmi"] == 1.0


def test_muc_hand_computed(spark):
    from spikex_spark.operators.clustereval import muc_metrics
    pred, gold = _pg(spark)
    row = muc_metrics(pred, gold).collect()[0]
    # gold x={1,2} split over {a}: 1 link kept; y={3,4,5} over {a,b}: 1;
    # z singleton: 0 -> R = 2/3; precision mirrors (a spans x,y; b in y)
    assert (row["r_num"], row["r_den"]) == (2, 3)
    assert (row["p_num"], row["p_den"]) == (2, 3)
    assert row["precision"] == round(2 / 3, 6)
    assert row["recall"] == round(2 / 3, 6)
    assert row["f1"] == round(2 / 3, 6)


def test_muc_identity_and_degenerate(spark):
    from spikex_spark.operators.clustereval import muc_metrics
    pred, _ = _pg(spark)
    row = muc_metrics(
        pred, pred.withColumnRenamed("pred", "gold")).collect()[0]
    assert (row["precision"], row["recall"], row["f1"]) == (1.0, 1.0, 1.0)
    # MUC is blind to singletons: all-singleton sides are 0/0 -> 0.0
    p = spark.createDataFrame([(i, i) for i in range(4)], ["id", "pred"])
    g = spark.createDataFrame([(i, 0) for i in range(4)], ["id", "gold"])
    row = muc_metrics(p, g).collect()[0]
    assert (row["precision"], row["recall"], row["f1"]) == (0.0, 0.0, 0.0)


def test_silhouette_tight_far_clusters(spark):
    from spikex_spark.operators.clustereval import silhouette_by_cluster
    cl = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 20), (5, 30)],
        ["id", "cluster_id"])
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.05]),       # tight cluster 10
         (3, [0.0, 1.0]), (4, [0.05, 1.0]),       # tight cluster 20, far
         (5, [-1.0, -1.0])],                      # singleton cluster 30
        ["id", "emb"])
    out = {r["cluster_id"]: r for r in
           silhouette_by_cluster(cl, vecs).collect()}
    assert out[10]["n_sampled"] == 2 and out[20]["n_sampled"] == 2
    # within-distance ~0.001, between ~1.0 -> silhouette near 1
    assert out[10]["mean_silhouette"] > 0.9
    assert out[20]["mean_silhouette"] > 0.9
    # singleton sample: a(i) undefined -> 0 by convention
    assert out[30]["mean_silhouette"] == 0.0


def test_silhouette_overlapping_clusters_score_low(spark):
    from pyspark.sql import functions as F
    from spikex_spark.operators.clustereval import silhouette_by_cluster
    # two interleaved "clusters" on the same direction: silhouette ~<= 0
    cl = spark.createDataFrame(
        [(i, i % 2) for i in range(6)], ["id", "cluster_id"])
    vecs = spark.createDataFrame(
        [(i, [1.0, 0.001 * i]) for i in range(6)], ["id", "emb"])
    out = silhouette_by_cluster(cl, vecs).agg(
        F.max("mean_silhouette").alias("mx")).collect()[0]
    assert out["mx"] <= 0.05


def _muc_ref(pred: dict, gold: dict):
    """Pure-Python MUC (Vilain '95) over id->cluster dicts."""
    from collections import defaultdict

    def side(part, other):
        clusters = defaultdict(set)
        for i, c in part.items():
            clusters[c].add(i)
        num = den = 0
        for members in clusters.values():
            num += len(members) - len({other[i] for i in members})
            den += len(members) - 1
        return num, den

    p_num, p_den = side(pred, gold)
    r_num, r_den = side(gold, pred)
    prec = p_num / p_den if p_den else 0.0
    rec = r_num / r_den if r_den else 0.0
    f1 = (2 * p_num * r_num / (p_num * r_den + r_num * p_den)
          if p_num * r_den + r_num * p_den else 0.0)
    return round(prec, 6), round(rec, 6), round(f1, 6)


def test_muc_matches_reference_on_random_clusterings(spark):
    import random

    from spikex_spark.operators.clustereval import muc_metrics
    for seed in (7, 21, 99):
        rng = random.Random(seed)
        n = 60
        pred = {i: rng.randrange(8) for i in range(n)}
        gold = {i: rng.randrange(6) for i in range(n)}
        p = spark.createDataFrame(list(pred.items()), ["id", "pred"])
        g = spark.createDataFrame(list(gold.items()), ["id", "gold"])
        row = muc_metrics(p, g).collect()[0]
        want = _muc_ref(pred, gold)
        assert (row["precision"], row["recall"], row["f1"]) == want, seed


def _silhouette_ref(cl: dict, vecs: dict):
    """Pure-Python mean silhouette per cluster, cosine distance, full
    pairwise (valid when every cluster fits the sample cap)."""
    import math
    from collections import defaultdict

    def cos_d(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        c = 0.0 if na == 0 or nb == 0 else dot / (na * nb)
        return round((1.0 - c) * 10**4) / 10**4   # operator's 1e4 snap

    clusters = defaultdict(list)
    for i, c in cl.items():
        clusters[c].append(i)
    out = {}
    for c, members in clusters.items():
        ss = []
        for i in members:
            if len(members) < 2:
                ss.append(0.0)
                continue
            a = sum(cos_d(vecs[i], vecs[j])
                    for j in members if j != i) / (len(members) - 1)
            bs = [sum(cos_d(vecs[i], vecs[j]) for j in o) / len(o)
                  for oc, o in clusters.items() if oc != c]
            if not bs:
                ss.append(0.0)
                continue
            b = min(bs)
            m = max(a, b)
            ss.append(0.0 if m == 0 else (b - a) / m)
        out[c] = sum(ss) / len(ss)
    return out


def test_silhouette_matches_reference_on_random_data(spark):
    import random

    from spikex_spark.operators.clustereval import silhouette_by_cluster
    for seed in (3, 42):
        rng = random.Random(seed)
        n, dim = 30, 6
        cl = {i: rng.randrange(4) for i in range(n)}
        vecs = {i: [rng.uniform(-1, 1) for _ in range(dim)]
                for i in range(n)}
        cdf = spark.createDataFrame(list(cl.items()), ["id", "cluster_id"])
        vdf = spark.createDataFrame(
            [(i, v) for i, v in vecs.items()], ["id", "emb"])
        got = {r["cluster_id"]: r["mean_silhouette"] for r in
               silhouette_by_cluster(cdf, vdf,
                                     sample_per_cluster=n).collect()}
        want = _silhouette_ref(cl, vecs)
        for c in want:
            assert abs(got[c] - want[c]) < 5e-3, (seed, c, got[c], want[c])
