"""SNM blocking, meta-blocking, ER quality control, survivorship."""

from __future__ import annotations

from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# snm.global_rank / sorted_neighborhood
# --------------------------------------------------------------------------

def _rank_rows(spark, num_ranges):
    from spikex_spark.operators.snm import global_rank
    df = spark.createDataFrame(
        [("b", 2), ("a", 1), ("b", 1), ("c", 9), ("a", 7), ("c", 3)],
        "k string, id long")
    out = global_rank(df, ["k", "id"], num_ranges=num_ranges)
    return sorted((r["k"], r["id"], r["rank"]) for r in out.collect())


def test_global_rank_matches_sorted_order(spark):
    rows = _rank_rows(spark, 4)
    expect = sorted((k, i) for k, i, _ in rows)
    assert [(k, i) for k, i, r in sorted(rows, key=lambda t: t[2])] == expect
    assert sorted(r for _, _, r in rows) == [1, 2, 3, 4, 5, 6]


def test_global_rank_partition_count_invariant(spark):
    assert _rank_rows(spark, 2) == _rank_rows(spark, 16) == _rank_rows(spark, 1)


def test_sorted_neighborhood_window_pairs(spark):
    from spikex_spark.operators.snm import sorted_neighborhood
    # sorted by key: ids 10(a) 11(b) 12(c) 13(d); window=2 pairs adjacent only
    df = spark.createDataFrame(
        [(10, "a"), (11, "b"), (12, "c"), (13, "d")], "id long, k string")
    out = sorted_neighborhood(df, [F.col("k")], "id", window=2)
    got = sorted((r["id_a"], r["id_b"]) for r in out.collect())
    assert got == [(10, 11), (11, 12), (12, 13)]


def test_sorted_neighborhood_multipass_counts_agreement(spark):
    from spikex_spark.operators.snm import sorted_neighborhood
    # pass1 sorts by k1 (10,11 adjacent); pass2 by k2 (10,11 adjacent too,
    # 12 moves first) -> (10,11) proposed twice
    df = spark.createDataFrame(
        [(10, "a", "y"), (11, "b", "z"), (12, "c", "a")],
        "id long, k1 string, k2 string")
    out = sorted_neighborhood(df, [F.col("k1"), F.col("k2")], "id", window=2)
    got = {(r["id_a"], r["id_b"]): r["n_passes"] for r in out.collect()}
    assert got == {(10, 11): 2, (11, 12): 1, (10, 12): 1}


def test_sorted_neighborhood_crosses_range_boundaries(spark):
    """Every consecutive pair must appear even when ranks span range
    partitions — the failure mode a per-partition lead() would have."""
    from spikex_spark.operators.snm import sorted_neighborhood
    n = 40
    df = spark.createDataFrame(
        [(i, f"k{i:03d}") for i in range(n)], "id long, k string")
    out = sorted_neighborhood(df, [F.col("k")], "id", window=2, num_ranges=8)
    got = sorted((r["id_a"], r["id_b"]) for r in out.collect())
    assert got == [(i, i + 1) for i in range(n - 1)]


# --------------------------------------------------------------------------
# metablocking
# --------------------------------------------------------------------------

def test_cbs_pairs_counts_common_blocks(spark):
    from spikex_spark.operators.metablocking import cbs_pairs
    rows = [("b1", 1), ("b1", 2), ("b2", 1), ("b2", 2), ("b2", 3)]
    df = spark.createDataFrame(rows, "block_id string, id long")
    got = {(r["id_a"], r["id_b"]): r["cbs"]
           for r in cbs_pairs(df).collect()}
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}


def test_purge_blocks_drops_whole_oversize_block(spark):
    from spikex_spark.operators.metablocking import cbs_pairs
    rows = ([("hub", i) for i in range(5)]
            + [("b1", 1), ("b1", 2)])
    df = spark.createDataFrame(rows, "block_id string, id long")
    got = {(r["id_a"], r["id_b"]): r["cbs"]
           for r in cbs_pairs(df, max_block_size=4).collect()}
    assert got == {(1, 2): 1}          # hub contributed nothing at all


def test_wep_prune_keeps_at_or_above_mean(spark):
    from spikex_spark.operators.metablocking import wep_prune
    # weights 1,1,4 -> mean 2: keep only the 4 (exact integer compare)
    df = spark.createDataFrame(
        [(1, 2, 1), (1, 3, 1), (2, 3, 4)], "id_a long, id_b long, cbs long")
    got = [(r["id_a"], r["id_b"]) for r in wep_prune(df).collect()]
    assert got == [(2, 3)]
    # weights 2,2 -> mean 2: >= keeps both
    df2 = spark.createDataFrame(
        [(1, 2, 2), (1, 3, 2)], "id_a long, id_b long, cbs long")
    assert wep_prune(df2).count() == 2


# --------------------------------------------------------------------------
# erqc
# --------------------------------------------------------------------------

def test_blocking_metrics_triple(spark):
    from spikex_spark.operators.erqc import blocking_metrics
    cand = spark.createDataFrame(
        [(1, 2), (3, 1), (4, 5)], "id_a long, id_b long")
    gold = spark.createDataFrame(
        [(2, 1), (1, 3), (6, 7)], "id_a long, id_b long")
    recs = spark.createDataFrame([(i,) for i in range(1, 9)], "id long")
    r = blocking_metrics(cand, gold, recs).collect()[0]
    assert (r["n_records"], r["n_candidates"], r["n_gold"], r["tp"]) \
        == (8, 3, 3, 2)
    assert r["reduction_ratio"] == round(1 - 3 / 28, 6)
    assert r["pairs_completeness"] == round(2 / 3, 6)
    assert r["pairs_quality"] == round(2 / 3, 6)


def test_threshold_sweep_counts_uncandidated_gold_as_fn(spark):
    from spikex_spark.operators.erqc import threshold_sweep
    scored = spark.createDataFrame(
        [(1, 2, 0.9), (1, 3, 0.6), (4, 5, 0.9)],
        "id_a long, id_b long, score double")
    gold = spark.createDataFrame(
        [(1, 2), (1, 3), (8, 9)], "id_a long, id_b long")
    out = {r["threshold"]: (r["tp"], r["fp"], r["fn"])
           for r in threshold_sweep(scored, gold, [0.5, 0.8]).collect()}
    assert out[0.5] == (2, 1, 1)       # (8,9) never scored -> fn
    assert out[0.8] == (1, 1, 2)       # (1,3) drops below, (8,9) still fn
    r = [x for x in threshold_sweep(scored, gold, [0.8]).collect()][0]
    assert r["precision"] == 0.5 and r["recall"] == round(1 / 3, 6)


def test_cluster_cohesion_chain_density(spark):
    from spikex_spark.operators.erqc import cluster_cohesion
    clusters = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (9, 900)],
        "doc_id long, cluster_id long")
    # chain 1-2-3: 2 edges of 3 possible -> density 2/3; 9 is a singleton
    edges = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.8)], "id_a long, id_b long, score double")
    got = {r["cluster_id"]: r for r in
           cluster_cohesion(clusters, edges).collect()}
    c = got[100]
    assert (c["n_members"], c["n_edges"]) == (3, 2)
    assert c["density"] == round(2 / 3, 6)
    assert c["min_score"] == 0.8 and c["avg_score"] == 0.85
    s = got[900]
    assert (s["n_members"], s["n_edges"], s["density"],
            s["min_score"], s["avg_score"]) == (1, 0, 0.0, 0.0, 0.0)


def test_cluster_cohesion_ignores_cross_cluster_edges(spark):
    from spikex_spark.operators.erqc import cluster_cohesion
    clusters = spark.createDataFrame(
        [(1, 100), (2, 200)], "doc_id long, cluster_id long")
    edges = spark.createDataFrame(
        [(1, 2, 0.9)], "id_a long, id_b long, score double")
    got = {r["cluster_id"]: r["n_edges"]
           for r in cluster_cohesion(clusters, edges).collect()}
    assert got == {100: 0, 200: 0}


# --------------------------------------------------------------------------
# survivorship
# --------------------------------------------------------------------------

def test_golden_records_modal_and_keep(spark):
    from spikex_spark.operators.survivorship import golden_records
    clusters = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 40)],
        "doc_id long, cluster_id long")
    recs = spark.createDataFrame(
        [(1, "en", "s1", 5), (2, "en", "s2", 9), (3, "de", "s2", 9),
         (4, None, "s3", 1)],
        "doc_id long, lang string, source string, n_chars long")
    got = {r["cluster_id"]: r for r in golden_records(
        clusters, recs, ["lang", "source"],
        size_col="n_chars").collect()}
    g = got[10]
    # lang: en(2) beats de(1); source: s2(2) beats s1(1)
    assert (g["n_members"], g["lang"], g["source"]) == (3, "en", "s2")
    # keep: longest n_chars=9 tie -> min doc_id=2
    assert g["keep_id"] == 2
    s = got[40]
    assert (s["n_members"], s["keep_id"], s["lang"], s["source"]) \
        == (1, 4, None, "s3")          # all-NULL lang publishes NULL


def test_golden_records_tie_breaks_to_smallest_value(spark):
    from spikex_spark.operators.survivorship import golden_records
    clusters = spark.createDataFrame(
        [(1, 10), (2, 10)], "doc_id long, cluster_id long")
    recs = spark.createDataFrame(
        [(1, "fr"), (2, "en")], "doc_id long, lang string")
    g = golden_records(clusters, recs, ["lang"]).collect()[0]
    assert g["lang"] == "en" and g["keep_id"] == 1


# --------------------------------------------------------------------------
# linkage.fs_em (unsupervised EM)
# --------------------------------------------------------------------------

def _em_pairs(spark, repartition=None):
    # 60 clear matches (both fields agree), 40 clear non-matches, a few
    # noisy rows in each class
    rows = ([(i, i + 1000, True, True) for i in range(55)]
            + [(i, i + 1000, True, False) for i in range(55, 60)]
            + [(i, i + 2000, False, False) for i in range(60, 95)]
            + [(i, i + 2000, False, True) for i in range(95, 100)])
    df = spark.createDataFrame(
        rows, "id_a long, id_b long, a_x boolean, a_y boolean")
    return df.repartition(repartition) if repartition else df


def test_fs_em_separates_mixture(spark):
    from spikex_spark.operators.linkage import fs_em
    est = fs_em(_em_pairs(spark), ["a_x", "a_y"], rounds=3)
    assert est["m"]["a_x"] > est["u"]["a_x"]
    assert est["m"]["a_y"] > est["u"]["a_y"]
    assert 0.3 < est["lambda"] < 0.9          # ~60% of pairs are matches


def test_fs_em_partitioning_invariant(spark):
    from spikex_spark.operators.linkage import fs_em
    a = fs_em(_em_pairs(spark, 1), ["a_x", "a_y"], rounds=3)
    b = fs_em(_em_pairs(spark, 16), ["a_x", "a_y"], rounds=3)
    assert a == b                              # exact — int micro-unit sums


def test_fs_em_posteriors_rank_patterns(spark):
    from spikex_spark.operators.linkage import fs_em_posteriors
    out = fs_em_posteriors(_em_pairs(spark), ["a_x", "a_y"], rounds=3)
    by_pattern = {}
    for r in out.collect():
        by_pattern.setdefault((r["a_x"], r["a_y"]), set()).add(r["p_match"])
    # identical agreement pattern -> identical posterior (pure function)
    assert all(len(v) == 1 for v in by_pattern.values())
    assert max(by_pattern[(True, True)]) > 0.95
    assert min(by_pattern[(False, False)]) < 0.05


def test_fs_em_params_schema_and_lam_consistency(spark):
    from spikex_spark.operators.linkage import fs_em_params
    df = fs_em_params(_em_pairs(spark), ["a_x", "a_y"], rounds=2)
    rows = df.collect()
    assert df.columns == ["field", "m", "u", "lam"]
    assert len({r["lam"] for r in rows}) == 1  # shared scalar


def test_snap_ratio_half_up_exact():
    from spikex_spark.operators.linkage import _snap_ratio
    assert _snap_ratio(1, 2) == 500000
    assert _snap_ratio(1, 3) == 333333
    assert _snap_ratio(2, 3) == 666667
    # exact decimal tie rounds HALF-UP (python round() would give 0)
    assert _snap_ratio(1, 2_000_000) == 1      # 0.0000005 -> 1 micro
    # clamp
    assert _snap_ratio(0, 5) == 1
    assert _snap_ratio(5, 5) == 999_999


# --------------------------------------------------------------------------
# phonetic (soundex) blocking keys
# --------------------------------------------------------------------------

# the classics that distinguish soundex variants: Spark implements the
# full h/w rule (same-code letters across h/w collapse; across vowels
# they repeat) — these pins keep the DuckDB oracle honest
_SOUNDEX_CLASSICS = {
    "robert": "R163", "rupert": "R163", "ashcraft": "A261",
    "ashcroft": "A261", "tymczak": "T522", "pfister": "P236",
    "honeyman": "H555", "white": "W300", "wright": "W623",
    "wheaton": "W350", "burroughs": "B620", "burrows": "B620",
    "lukasiewicz": "L222", "lloyd": "L300", "oooo": "O000",
    "h": "H000", "w": "W000", "a": "A000",
}


def test_soundex_classics_and_key_format(spark):
    from spikex_spark.operators.phonetic import soundex_blocking_keys
    rows = [(i, w) for i, w in enumerate(_SOUNDEX_CLASSICS)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r["phonetic_key"]
           for r in soundex_blocking_keys(df).collect()}
    for i, (w, want) in enumerate(_SOUNDEX_CLASSICS.items()):
        assert got[i] == want, (w, got[i], want)


def test_soundex_key_joins_first_n_tokens(spark):
    from spikex_spark.operators.phonetic import soundex_blocking_keys
    df = spark.createDataFrame(
        [(1, "Robert C. WRIGHT  jr the2nd extra words"),
         (2, ""), (3, "12 34")],
        "doc_id long, text string")
    got = {r["id"]: r["phonetic_key"]
           for r in soundex_blocking_keys(df).collect()}
    # non-alpha splits tokens; first 3 alphabetic tokens only
    assert got[1] == "R163-C000-W623"
    assert got[2] == "" and got[3] == ""


# --------------------------------------------------------------------------
# linkage.tf_table / fs_score_tf (Winkler term-frequency adjustment)
# --------------------------------------------------------------------------

def test_fs_tf_rare_value_agreement_outweighs_common(spark):
    import math

    from spikex_spark.operators.linkage import (fs_score_tf, fs_weights,
                                                tf_table)
    # 10 records: 8 share value "en", 2 share value "gd"
    recs = spark.createDataFrame(
        [(i, "en") for i in range(8)] + [(8, "gd"), (9, "gd")],
        "id long, v string")
    # 4 pairs: two agreeing (one on the common value, one on the rare
    # one), two disagreeing; labels make m estimable
    pairs = spark.createDataFrame(
        [(0, 1, True, True, "en"),
         (8, 9, True, True, "gd"),
         (0, 8, False, False, None),
         (1, 9, False, False, None)],
        "id_a long, id_b long, match boolean, a_v boolean, value string")
    weights = fs_weights(pairs, "match", ["a_v"])
    out = fs_score_tf(pairs, weights, tf_table(recs, "v"), "a_v")
    rows = {(r["id_a"], r["id_b"]): r for r in out.collect()}
    # m = (2+1)/(2+2) = 0.75; rare: ln(0.75*10/2), common: ln(0.75*10/8)
    assert rows[(8, 9)]["fs_tf_scaled"] == round(
        math.log(0.75 * 10 / 2) * 1e7)
    assert rows[(0, 1)]["fs_tf_scaled"] == round(
        math.log(0.75 * 10 / 8) * 1e7)
    assert rows[(8, 9)]["fs_tf_scaled"] > rows[(0, 1)]["fs_tf_scaled"]
    # disagreeing pairs keep the global disagreement weight
    wd = {r["field"]: r["w_disagree"] for r in weights.collect()}["a_v"]
    assert rows[(0, 8)]["fs_tf_scaled"] == wd
    assert rows[(1, 9)]["fs_tf_scaled"] == wd


# --------------------------------------------------------------------------
# phonetic.suffix_blocking_keys
# --------------------------------------------------------------------------

def test_suffix_blocking_keys_enumeration_and_cap(spark):
    from spikex_spark.operators.phonetic import suffix_blocking_keys
    df = spark.createDataFrame(
        [(1, "Smithers!"), (2, "X Smithers"), (3, "ab")],
        "doc_id long, text string")
    out = suffix_blocking_keys(df, key_len=16, min_suffix=5)
    got = sorted((r["id"], r["suffix"]) for r in out.collect())
    # doc 1 key 'smithers' -> suffixes len>=5: smithers, mithers, ithers, thers
    # doc 2 key 'xsmithers' adds x-prefixed ones; doc 3 too short
    assert (1, "smithers") in got and (1, "thers") in got
    assert (2, "xsmithers") in got and (2, "thers") in got
    assert all(i != 3 for i, _ in got)
    assert all(len(s) >= 5 for _, s in got)
    # truncated prefix still shares suffix blocks: docs 1 and 2 co-block
    shared = {s for i, s in got if i == 1} & {s for i, s in got if i == 2}
    assert "thers" in shared
    # cap drops the shared blocks when max_block=1: every suffix of
    # 'smithers' is also a suffix of 'xsmithers', so only the latter's
    # full key survives
    capped = suffix_blocking_keys(df, key_len=16, min_suffix=5, max_block=1)
    rows = [(r["id"], r["suffix"]) for r in capped.collect()]
    assert rows == [(2, "xsmithers")]


def test_fs_decide_three_way(spark):
    from spikex_spark.operators.linkage import fs_decide
    df = spark.createDataFrame(
        [(1, 2, 5.0), (3, 4, 0.0), (5, 6, -3.0), (7, 8, 2.0)],
        "id_a long, id_b long, fs_score double")
    got = {(r["id_a"], r["id_b"]): r["decision"]
           for r in fs_decide(df, upper=2.0, lower=-1.0).collect()}
    assert got == {(1, 2): "link", (3, 4): "possible",
                   (5, 6): "nonlink", (7, 8): "link"}


def test_fs_levels_hand_computed(spark):
    import math

    from spikex_spark.operators.linkage import (fs_score_levels,
                                                fs_weights_levels)
    # 3 matches, 3 non-matches; one field with 3 levels
    pairs = spark.createDataFrame(
        [(1, 2, True, 2), (3, 4, True, 2), (5, 6, True, 1),
         (7, 8, False, 0), (9, 10, False, 0), (11, 12, False, 1)],
        "id_a long, id_b long, match boolean, g int")
    levels = {"g": 3}
    w = {(r["field"], r["level"]): r
         for r in fs_weights_levels(pairs, "match", levels).collect()}
    # Laplace over 3 levels: m_2 = (2+1)/(3+3), u_2 = (0+1)/(3+3)
    assert w[("g", 2)]["m"] == 0.5
    assert w[("g", 2)]["u"] == round(1 / 6, 6)
    assert w[("g", 2)]["w"] == round(math.log((3 / 6) / (1 / 6)) * 1e7)
    assert w[("g", 0)]["w"] == round(math.log((1 / 6) / (3 / 6)) * 1e7)
    out = {(r["id_a"], r["id_b"]): r["fs_scaled"] for r in fs_score_levels(
        pairs, fs_weights_levels(pairs, "match", levels), levels).collect()}
    assert out[(1, 2)] == w[("g", 2)]["w"]
    assert out[(11, 12)] == w[("g", 1)]["w"]
    # the middle level carries its own (here zero-ish) evidence:
    # m_1 = u_1 = 2/6 -> weight 0
    assert w[("g", 1)]["w"] == 0


def test_waterfall_pairs_pass1_wins(spark):
    from spikex_spark.operators.linkage import waterfall_pairs
    det = spark.createDataFrame([(2, 1), (3, 4)], "id_a long, id_b long")
    prob = spark.createDataFrame(
        [(1, 2), (5, 6), (6, 5)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r["method"]
           for r in waterfall_pairs(det, prob).collect()}
    # (1,2) matched deterministically (canonicalized from (2,1)); the
    # probabilistic duplicate of it is suppressed; (5,6) deduped
    assert got == {(1, 2): "deterministic", (3, 4): "deterministic",
                   (5, 6): "probabilistic"}


def test_channel_stats_counts_unique_and_gold(spark):
    from spikex_spark.operators.erqc import channel_stats
    a = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    b = spark.createDataFrame([(2, 1), (5, 6)], "id_a long, id_b long")
    gold = spark.createDataFrame([(1, 2), (5, 6)], "id_a long, id_b long")
    got = {r["channel"]: (r["n_pairs"], r["n_unique"], r["gold_hits"])
           for r in channel_stats({"a": a, "b": b}, gold=gold).collect()}
    # (1,2) shared (b's (2,1) canonicalizes); (3,4) unique to a; (5,6) to b
    assert got == {"a": (2, 1, 1), "b": (2, 1, 2)}
    nog = {r["channel"]: r["gold_hits"]
           for r in channel_stats({"a": a, "b": b}).collect()}
    assert nog == {"a": None, "b": None}


def test_score_calibration_bins_and_precision(spark):
    from spikex_spark.operators.erqc import score_calibration
    scored = spark.createDataFrame(
        [(1, 2, 0.95), (3, 4, 0.92), (5, 6, 0.55), (7, 8, 1.0)],
        "id_a long, id_b long, score double")
    gold = spark.createDataFrame([(2, 1), (5, 6)], "id_a long, id_b long")
    got = {r["bin"]: r for r in
           score_calibration(scored, gold, bins=10).collect()}
    assert got[9]["n_pairs"] == 3            # 0.95, 0.92, and clamped 1.0
    assert got[9]["n_gold"] == 1
    assert got[9]["precision"] == round(1 / 3, 6)
    assert got[5]["precision"] == 1.0 and got[5]["lo"] == 0.5


def test_group_linkage_mirror_sites(spark):
    from spikex_spark.operators.erqc import group_linkage
    members = spark.createDataFrame(
        [(1, "siteA"), (2, "siteA"), (3, "siteB"), (4, "siteB"),
         (5, "siteC")],
        "doc_id long, source string")
    matched = spark.createDataFrame(
        [(1, 3), (2, 4), (1, 2)],      # two cross-site + one intra (dropped)
        "id_a long, id_b long")
    got = {(r["grp_a"], r["grp_b"]): r for r in group_linkage(
        matched, members, id_col="doc_id", group_col="source").collect()}
    assert set(got) == {("siteA", "siteB")}
    r = got[("siteA", "siteB")]
    assert (r["n_matched"], r["size_a"], r["size_b"]) == (2, 2, 2)
    assert r["dice"] == 1.0


def test_transitivity_violations_open_triangles(spark):
    from spikex_spark.operators.erqc import transitivity_violations
    matched = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (5, 6), (4, 6)],
        "id_a long, id_b long")
    scored = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.85), (1, 3, 0.4)],
        "id_a long, id_b long, score double")
    got = [(r["id_a"], r["id_center"], r["id_c"], r["score_ac"])
           for r in transitivity_violations(matched, scored).collect()]
    # 1-2-3 is open (1,3 unmatched, scored 0.4); 4-5-6 closed -> silent
    assert got == [(1, 2, 3, 0.4)]
    nos = transitivity_violations(matched).collect()
    assert [(r["id_a"], r["score_ac"]) for r in nos] == [(1, None)]


def test_progressive_recall_budget_curve(spark):
    from spikex_spark.operators.erqc import progressive_recall
    # weights rank pairs (1,2) > (3,4) > (5,6); gold = {(1,2),(5,6),(7,8)}
    weighted = spark.createDataFrame(
        [(1, 2, 5), (3, 4, 3), (5, 6, 1)], "id_a long, id_b long, cbs long")
    gold = spark.createDataFrame(
        [(2, 1), (5, 6), (7, 8)], "id_a long, id_b long")
    got = {r["budget"]: (r["n_found"], r["n_gold"], r["recall"])
           for r in progressive_recall(weighted, gold, [1, 2, 3]).collect()}
    third = round(1 / 3, 6)
    assert got[1] == (1, 3, third)          # top pair is gold
    assert got[2] == (1, 3, third)          # (3,4) is not
    assert got[3] == (2, 3, round(2 / 3, 6))  # (5,6) arrives; (7,8) never


def test_chao1_hand_computed(spark):
    from spikex_spark.operators.evaluation import chao1_estimate
    # sizes: 1,1,1,2,2,5 -> c=6, f1=3, f2=2, chao1 = 6 + 3*2/(2*3) = 7
    rows = ([(i, 100 + i) for i in range(3)]
            + [(10, 200), (11, 200), (12, 201), (13, 201)]
            + [(20 + i, 300) for i in range(5)])
    df = spark.createDataFrame(rows, "doc_id long, cluster_id long")
    r = chao1_estimate(df).collect()[0]
    assert (r["n_items"], r["c_observed"], r["f1"], r["f2"]) == (12, 6, 3, 2)
    assert r["chao1"] == 7.0
    assert r["coverage"] == round(6 / 7, 6)
    # f2 = 0 stays defined (bias-corrected form)
    one = spark.createDataFrame([(1, 9), (2, 8)], "doc_id long, cluster_id long")
    assert chao1_estimate(one).collect()[0]["chao1"] == 3.0
