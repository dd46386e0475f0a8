"""As-of join, integer PageRank, rollup, and group quantiles."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spikex_spark.operators.asof import asof_join
from spikex_spark.operators.corpus import corpus_rollup, group_quantiles
from spikex_spark.operators.graph import pagerank


def _ts(s: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _mk_events(spark, left_rows, right_rows):
    l = spark.createDataFrame(left_rows, ["event_id", "user_id", "ts"])  # noqa: E741
    r = spark.createDataFrame(right_rows,
                              ["event_id", "user_id", "ts", "value"])
    return l, r


def test_asof_backward_latest_prior_wins(spark):
    l, r = _mk_events(  # noqa: E741
        spark,
        [(100, 1, _ts(50)), (101, 1, _ts(5)), (102, 2, _ts(50))],
        [(1, 1, _ts(10), 1.0), (2, 1, _ts(40), 2.0), (3, 2, _ts(60), 3.0)],
    )
    got = {row["event_id"]: row for row in asof_join(
        l, r, "user_id", "ts", "ts", ["event_id", "value"],
        right_tie="event_id").collect()}
    assert got[100]["asof_event_id"] == 2 and got[100]["asof_value"] == 2.0
    assert got[100]["asof_gap_us"] == 10_000_000
    assert got[101]["asof_event_id"] is None          # nothing at or before
    assert got[101]["asof_gap_us"] is None
    assert got[102]["asof_event_id"] is None          # right is after left


def test_asof_equal_ts_visible_and_tie_breaks_on_max_id(spark):
    l, r = _mk_events(  # noqa: E741
        spark,
        [(100, 1, _ts(10))],
        [(1, 1, _ts(10), 1.0), (2, 1, _ts(10), 2.0)],
    )
    row = asof_join(l, r, "user_id", "ts", "ts", ["event_id", "value"],
                    right_tie="event_id").collect()[0]
    assert row["asof_event_id"] == 2 and row["asof_gap_us"] == 0


def test_asof_tolerance_nulls_stale_matches(spark):
    l, r = _mk_events(  # noqa: E741
        spark,
        [(100, 1, _ts(100))],
        [(1, 1, _ts(10), 1.0)],
    )
    row = asof_join(l, r, "user_id", "ts", "ts", ["value"],
                    right_tie="event_id",
                    tolerance_us=5_000_000).collect()[0]
    assert row["asof_value"] is None and row["asof_gap_us"] is None


def _pr_expected(edges, iters=5, scale=10**12):
    nodes = sorted({x for e in edges for x in e})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    n = len(nodes)
    init = scale // n
    base = (15 * init) // 100
    r = {v: init for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for a, b in edges:
            s[b] += r[a] // out[a]
        r = {v: base + (85 * s[v]) // 100 for v in nodes}
    return r


def test_pagerank_matches_integer_recurrence(spark):
    edges = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"), ("b", "c")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r for r in pagerank(df, iterations=5).collect()}
    want = _pr_expected(edges)
    assert {k: v["rank_scaled"] for k, v in got.items()} == want
    for v in got.values():
        assert v["rank"] == v["rank_scaled"] / 1e12


def test_pagerank_symmetric_two_cycle_is_stationary(spark):
    df = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    got = {r["id"]: r["rank_scaled"]
           for r in pagerank(df, iterations=3).collect()}
    assert got["a"] == got["b"] == 5 * 10**11


def test_corpus_rollup_levels(spark):
    df = spark.createDataFrame(
        [("en", "web", 10), ("en", "web", 30), ("en", "book", 20),
         ("de", "web", 40)],
        ["lang", "source", "n_chars"])
    got = {(r["lang"], r["source"]): r
           for r in corpus_rollup(df, ["lang", "source"], "n_chars").collect()}
    assert got[("en", "web")]["n_rows"] == 2
    assert got[("en", "web")]["total_size"] == 40
    assert got[("en", "<all>")]["n_rows"] == 3
    assert got[("en", "<all>")]["avg_size"] == 20.0
    assert got[("<all>", "<all>")]["total_size"] == 100
    assert len(got) == 3 + 2 + 1   # 3 leaf pairs + 2 lang subtotals + total


def test_group_quantiles_exact_and_approx_schema(spark):
    df = spark.createDataFrame(
        [("en", v) for v in [1, 2, 3, 4, 5]] + [("de", 10)],
        ["lang", "n_chars"])
    exact = {r["grp"]: r for r in
             group_quantiles(df, "lang", "n_chars").collect()}
    assert exact["en"]["p50"] == 3.0 and exact["en"]["p25"] == 2.0
    assert exact["en"]["vmin"] == 1 and exact["en"]["vmax"] == 5
    assert exact["de"]["p90"] == 10.0
    approx = group_quantiles(df, "lang", "n_chars", approx=True)
    assert approx.columns == exact["en"].__fields__


def test_triangle_counts_known_graph(spark):
    from spikex_spark.operators.graph import triangle_counts
    # K4 on a,b,c,d (4 triangles, each node in 3) + pendant e (0) +
    # duplicate/self-loop/reverse noise that must not change counts
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("d", "e"), ("b", "a"), ("a", "a"), ("a", "b")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["id"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 0}


def test_triangle_counts_triangle_free(spark):
    from spikex_spark.operators.graph import triangle_counts
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"])
    got = triangle_counts(df).collect()
    assert all(r["triangles"] == 0 for r in got) and len(got) == 4


def test_tfidf_top_terms_ranks_rare_terms_first(spark):
    import math
    from spikex_spark.operators.retrieval import tfidf_top_terms
    df = spark.createDataFrame(
        [(0, "common rare common"), (1, "common common"), (2, "common"),
         (3, "common")],
        ["doc_id", "text"])
    got = {(r["doc_id"], r["rank"]): r
           for r in tfidf_top_terms(df, "doc_id", "text", k=2).collect()}
    # rare: ln(1+4/1)=1.609 beats common's tf=2 · ln(1+4/4)=1.386
    assert got[(0, 1)]["term"] == "rare"
    assert got[(0, 2)]["term"] == "common"
    w_rare = int(round(math.log(1.0 + 4.0 / 1.0) * 1e7))
    assert got[(0, 1)]["score"] == w_rare / 1e7
    assert got[(1, 1)]["term"] == "common" and (2, 2) not in got


def test_weighted_sample_matches_aes_recompute(spark):
    import hashlib
    import math

    from spikex_spark.operators.corpus import weighted_sample
    rows = [("en", i, (i % 7) * 100 + 1) for i in range(40)] + \
           [("en", 99, 0), ("en", 98, -5)]          # non-positive excluded
    df = spark.createDataFrame(rows, ["lang", "doc_id", "n_chars"])
    got = weighted_sample(df, "lang", "doc_id", "n_chars", k=5).collect()

    def pri(key, i, w):
        h = int(hashlib.md5(f"{key}:{i}".encode()).hexdigest()[:15], 16)
        u = (h + 1) / float(1 << 60)
        return int(round(-math.log(u) / w * 1e9))

    want = sorted(((pri("en", i, w), i) for _, i, w in rows if w > 0))[:5]
    assert [(r["priority_scaled"], r["id"]) for r in
            sorted(got, key=lambda r: r["sample_rank"])] == want
    assert all(r["id"] not in (98, 99) for r in got)


def test_weighted_sample_prefers_heavy_items(spark):
    from spikex_spark.operators.corpus import weighted_sample
    # 200 light (w=1) vs 200 heavy (w=1000) items: a proportional draw of
    # 50 should be overwhelmingly heavy (P[light] ~ 1/1000 per slot)
    rows = [("x", i, 1) for i in range(200)] + \
           [("x", 1000 + i, 1000) for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "i", "w"])
    got = weighted_sample(df, "k", "i", "w", k=50).collect()
    heavy = sum(1 for r in got if r["id"] >= 1000)
    assert len(got) == 50 and heavy >= 45


def test_json_field_stats_parses_and_drops_bad_rows(spark):
    from spikex_spark.operators.relational import json_field_stats
    rows = [("click", '{"k": 3}', 1.25), ("click", '{"k": 7}', 2.50),
            ("view", '{"x": 1}', 9.0),          # path missing -> dropped
            ("view", 'not json', 9.0),          # unparseable -> dropped
            ("view", '{"k": "ten"}', 9.0),      # non-numeric -> dropped
            ("view", '{"k": 10}', 0.01)]
    df = spark.createDataFrame(rows, ["event_type", "props", "value"])
    got = {r["grp"]: r for r in json_field_stats(
        df, "event_type", "props", "$.k", "value").collect()}
    assert got["click"]["n"] == 2 and got["click"]["sum_k"] == 10
    assert got["click"]["sum_value_cents"] == 375
    assert got["view"]["n"] == 1 and got["view"]["min_k"] == 10


def test_pivot_counts_explicit_values(spark):
    from spikex_spark.operators.relational import pivot_counts
    rows = [(1, "click"), (1, "click"), (1, "view"), (2, "error"),
            (2, "other")]                        # 'other' only in total
    df = spark.createDataFrame(rows, ["user_id", "event_type"])
    got = {r["key"]: r for r in pivot_counts(
        df, "user_id", "event_type", ["click", "view", "error"]).collect()}
    assert got[1]["n_click"] == 2 and got[1]["n_view"] == 1
    assert got[1]["n_error"] == 0 and got[1]["n_total"] == 3
    assert got[2]["n_error"] == 1 and got[2]["n_total"] == 2


def test_pair_metrics_counts_and_divisions(spark):
    from spikex_spark.operators.evaluation import pair_metrics
    pred = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (2, 1), (7, 7)],   # dup orient + self
        ["id_a", "id_b"])
    ref = spark.createDataFrame(
        [(2, 1), (3, 4), (8, 9)], ["id_a", "id_b"])
    row = pair_metrics(pred, ref).collect()[0]
    assert (row["tp"], row["fp"], row["fn"]) == (2, 1, 1)
    assert row["precision"] == round(2 / 3, 6)
    assert row["recall"] == 0.666667
    assert row["f1"] == round(4 / 6, 6)     # 2tp / (2tp + fp + fn)


def test_pair_metrics_empty_pred_is_zero_not_null(spark):
    from spikex_spark.operators.evaluation import pair_metrics
    pred = spark.createDataFrame([], "id_a long, id_b long")
    ref = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    row = pair_metrics(pred, ref).collect()[0]
    assert (row["tp"], row["fp"], row["fn"]) == (0, 0, 1)
    assert row["precision"] == 0.0 and row["f1"] == 0.0


def test_cluster_size_histogram(spark):
    from spikex_spark.operators.evaluation import cluster_size_histogram
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate([10, 10, 10, 20, 20, 30])],
        ["doc_id", "cluster_id"])
    got = {r["cluster_size"]: r["n_clusters"]
           for r in cluster_size_histogram(df).collect()}
    assert got == {3: 1, 2: 1, 1: 1}


def test_fs_weights_and_score_exact(spark):
    import math

    from spikex_spark.operators.linkage import fs_score, fs_weights
    # 4 matches (3 agree on f), 6 non-matches (1 agrees on f)
    rows = ([(i, i + 100, True, i < 3) for i in range(4)]
            + [(i, i + 200, False, i == 0) for i in range(6)])
    df = spark.createDataFrame(rows, ["id_a", "id_b", "match", "f"])
    w = {r["field"]: r for r in fs_weights(df, "match", ["f"]).collect()}
    m, u = (3 + 1) / (4 + 2), (1 + 1) / (6 + 2)
    assert w["f"]["m"] == round(m, 6) and w["f"]["u"] == round(u, 6)
    assert w["f"]["w_agree"] == int(round(math.log(m / u) * 1e7))
    assert w["f"]["w_disagree"] == int(round(
        math.log((1 - m) / (1 - u)) * 1e7))
    scored = {(r["id_a"], r["id_b"]): r for r in fs_score(
        df, fs_weights(df, "match", ["f"]), ["f"]).collect()}
    assert scored[(0, 100)]["fs_scaled"] == w["f"]["w_agree"]
    assert scored[(3, 103)]["fs_scaled"] == w["f"]["w_disagree"]
    assert scored[(0, 100)]["fs_score"] == w["f"]["w_agree"] / 1e7


def test_fs_weights_smoothing_keeps_ln_finite(spark):
    from spikex_spark.operators.linkage import fs_weights
    # field NEVER agrees in matches and ALWAYS in non-matches: raw m=0,
    # u=1 would blow ln(); add-one keeps every weight finite
    rows = [(1, 2, True, False), (3, 4, False, True)]
    df = spark.createDataFrame(rows, ["id_a", "id_b", "match", "f"])
    r = fs_weights(df, "match", ["f"]).collect()[0]
    assert r["w_agree"] is not None and r["w_disagree"] is not None
    assert r["m"] == round(1 / 3, 6) and r["u"] == round(2 / 3, 6)


def test_asof_join_randomized_vs_naive(spark):
    """Seeded random corpus: the merge-sorted-union as-of join must equal
    the O(n·m) naive recompute on every row."""
    import random

    rng = random.Random(42)
    lefts = [(i, rng.randint(1, 5), _ts(rng.randint(0, 500)))
             for i in range(120)]
    rights = [(1000 + i, rng.randint(1, 5), _ts(rng.randint(0, 500)),
               float(i)) for i in range(200)]
    l = spark.createDataFrame(lefts, ["event_id", "user_id", "ts"])  # noqa: E741
    r = spark.createDataFrame(rights,
                              ["event_id", "user_id", "ts", "value"])
    got = {row["event_id"]: (row["asof_event_id"], row["asof_value"])
           for row in asof_join(l, r, "user_id", "ts", "ts",
                                ["event_id", "value"],
                                right_tie="event_id").collect()}
    for eid, u, ts in lefts:
        cands = [(rts, rid, v) for rid, ru, rts, v in rights
                 if ru == u and rts <= ts]
        want = (None, None) if not cands else (
            max(cands)[1], max(cands)[2])
        assert got[eid] == want, eid


def test_group_trend_recovers_exact_line(spark):
    from spikex_spark.operators.corpus import group_trend
    # y = 2.00·x + 5.00 (x in minutes): slope in cents/min = 200
    rows = [(1, _ts(60 * x), 2.0 * x + 5.0) for x in (0, 1, 2, 3, 10)]
    rows += [(2, _ts(0), 9.99)]                     # degenerate group
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = {r["grp"]: r for r in
           group_trend(df, "user_id", "ts", "value").collect()}
    assert got[1]["slope"] == 200.0 and got[1]["intercept"] == 500.0
    assert got[2]["slope"] is None and got[2]["intercept"] is None
    assert got[2]["n"] == 1


def test_asof_join_bucketed_equals_plain(spark):
    """The hot-key-safe bucketed variant is semantics-identical to the
    single-window join — randomized data forced across 'minute' bucket
    boundaries, including empty buckets between activity bursts."""
    import random

    from spikex_spark.operators.asof import asof_join_bucketed

    rng = random.Random(7)
    lefts = [(i, rng.randint(1, 3), _ts(rng.randint(0, 1800)))
             for i in range(150)]
    rights = [(1000 + i, rng.randint(1, 3), _ts(rng.randint(0, 1800)),
               float(i)) for i in range(80)]
    l = spark.createDataFrame(lefts, ["event_id", "user_id", "ts"])  # noqa: E741
    r = spark.createDataFrame(rights,
                              ["event_id", "user_id", "ts", "value"])
    plain = {row["event_id"]: (row["asof_event_id"], row["asof_value"],
                               row["asof_gap_us"])
             for row in asof_join(l, r, "user_id", "ts", "ts",
                                  ["event_id", "value"],
                                  right_tie="event_id").collect()}
    bucketed = {row["event_id"]: (row["asof_event_id"], row["asof_value"],
                                  row["asof_gap_us"])
                for row in asof_join_bucketed(
                    l, r, "user_id", "ts", "ts", ["event_id", "value"],
                    right_tie="event_id", bucket="minute").collect()}
    assert bucketed == plain and len(bucketed) == 150


def test_asof_join_bucketed_equal_ts_ties(spark):
    from spikex_spark.operators.asof import asof_join_bucketed
    l = spark.createDataFrame([(100, 1, _ts(10))],  # noqa: E741
                              ["event_id", "user_id", "ts"])
    r = spark.createDataFrame(
        [(1, 1, _ts(10), 1.0), (2, 1, _ts(10), 2.0)],
        ["event_id", "user_id", "ts", "value"])
    row = asof_join_bucketed(l, r, "user_id", "ts", "ts",
                             ["event_id", "value"], right_tie="event_id",
                             bucket="minute").collect()[0]
    assert row["asof_event_id"] == 2 and row["asof_gap_us"] == 0


def test_corpus_split_deterministic_and_growth_stable(spark):
    import hashlib

    from spikex_spark.operators.corpus import corpus_split
    df1 = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    df2 = spark.createDataFrame([(i,) for i in range(400)], ["doc_id"])
    s1 = {r["id"]: r["split"] for r in
          corpus_split(df1, "doc_id").collect()}
    s2 = {r["id"]: r["split"] for r in
          corpus_split(df2, "doc_id").collect()}
    # growing the corpus never reassigns an existing doc
    assert all(s2[i] == s1[i] for i in s1)
    # matches the md5 recompute and the declared boundaries
    for i in (0, 7, 123):
        b = int(hashlib.md5(f"split:{i}".encode()).hexdigest()[:15],
                16) % 10000
        want = "train" if b < 9800 else ("val" if b < 9900 else "test")
        assert s1[i] == want


def test_corpus_split_rejects_overflowing_ratios(spark):
    import pytest

    from spikex_spark.operators.corpus import corpus_split
    df = spark.createDataFrame([(1,)], ["doc_id"])
    with pytest.raises(ValueError):
        corpus_split(df, "doc_id", ratios=(("a", 9000), ("b", 2000)))


def test_zorder_key_interleaves_and_buckets(spark):
    from spikex_spark.operators.corpus import zorder_key
    df = spark.createDataFrame(
        [(0, 0b1010, 0b0110), (1, 0, 0), (2, 0xFFFF, 0xFFFF),
         (3, 0x1FFFF, 0)],                    # overflow bit masked off
        ["i", "a", "b"])
    got = {r["i"]: r for r in zorder_key(df, "a", "b").collect()}

    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got[0]["zkey"] == morton(0b1010, 0b0110)
    assert got[1]["zkey"] == 0
    assert got[2]["zkey"] == (1 << 32) - 1 and got[2]["file_bucket"] == 63
    assert got[3]["zkey"] == morton(0xFFFF, 0)   # 17th bit dropped
    # locality: nearby (a,b) share the bucket, far-apart points don't
    assert got[1]["file_bucket"] != got[2]["file_bucket"]


def test_pivot_counts_keeps_null_key_group(spark):
    from pyspark.sql import types as T

    from spikex_spark.operators.relational import pivot_counts
    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ])
    rows = [(1, "click"), (None, "click"), (None, "view")]
    df = spark.createDataFrame(rows, schema)
    got = {r["key"]: r for r in pivot_counts(
        df, "user_id", "event_type", ["click", "view"]).collect()}
    assert got[None]["n_click"] == 1 and got[None]["n_view"] == 1
    assert got[None]["n_total"] == 2 and got[1]["n_total"] == 1


def test_corpus_rollup_distinguishes_real_null_dims(spark):
    from pyspark.sql import types as T

    from spikex_spark.operators.corpus import corpus_rollup
    schema = T.StructType([
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])
    df = spark.createDataFrame(
        [("en", "web", 10), (None, "web", 20)], schema)
    got = {(r["lang"], r["source"]): r["n_rows"] for r in
           corpus_rollup(df, ["lang", "source"], "n_chars").collect()}
    assert got[("<null>", "web")] == 1         # genuine NULL group
    assert got[("<null>", "<all>")] == 1       # its lang subtotal
    assert got[("<all>", "<all>")] == 2        # grand total over ALL rows


def test_asof_bucketed_keeps_null_key_and_ts_rows(spark):
    from pyspark.sql import types as T

    from spikex_spark.operators.asof import asof_join, asof_join_bucketed
    ls = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ])
    rs = T.StructType(ls.fields + [T.StructField("value", T.DoubleType())])
    l = spark.createDataFrame(  # noqa: E741
        [(100, None, _ts(10)), (101, 1, None), (102, 1, _ts(10))], ls)
    r = spark.createDataFrame([(1, 1, _ts(5), 1.0)], rs)
    kw = dict(key="user_id", left_ts="ts", right_ts="ts",
              right_cols=["value"], right_tie="event_id")
    plain = {x["event_id"]: x["asof_value"]
             for x in asof_join(l, r, **kw).collect()}
    bucketed = {x["event_id"]: x["asof_value"]
                for x in asof_join_bucketed(l, r, bucket="minute",
                                            **kw).collect()}
    assert set(bucketed) == set(plain) == {100, 101, 102}
    assert bucketed[102] == plain[102] == 1.0
    assert bucketed[100] is None


def test_asof_bucketed_supports_tolerance(spark):
    from spikex_spark.operators.asof import asof_join_bucketed
    l = spark.createDataFrame([(100, 1, _ts(100))],  # noqa: E741
                              ["event_id", "user_id", "ts"])
    r = spark.createDataFrame([(1, 1, _ts(10), 1.0)],
                              ["event_id", "user_id", "ts", "value"])
    row = asof_join_bucketed(l, r, "user_id", "ts", "ts", ["value"],
                             right_tie="event_id", bucket="minute",
                             tolerance_us=5_000_000).collect()[0]
    assert row["asof_value"] is None and row["asof_gap_us"] is None


def test_corpus_diversity_orders_template_vs_distinct(spark):
    from spikex_spark.operators.corpus import corpus_diversity
    rows = (
        # group 't': same template everywhere -> low diversity
        [(i, "t", "the same exact template sentence here") for i in range(4)]
        # group 'd': fully distinct vocabularies -> diversity 1.0
        + [(10, "d", "alpha beta gamma"), (11, "d", "delta epsilon zeta"),
           (12, "d", "eta theta iota")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "grp", "text"])
    out = {r["group"]: r for r in corpus_diversity(
        df, "doc_id", "text", "grp", sample_per_group=10).collect()}
    assert out["t"]["n_pairs"] == 6 and out["t"]["diversity"] == 0.0
    assert out["d"]["n_pairs"] == 3 and out["d"]["diversity"] == 1.0


def test_corpus_diversity_sample_is_smallest_ids(spark):
    from spikex_spark.operators.corpus import corpus_diversity
    # ids 0,1 identical; id 999 distinct — with sample 2 only 0,1 enter
    rows = [(0, "g", "aa bb cc"), (1, "g", "aa bb cc"),
            (999, "g", "xx yy zz")]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "text"])
    out = corpus_diversity(df, "doc_id", "text", "grp",
                           sample_per_group=2).collect()[0]
    assert out["n_sampled"] == 2 and out["mean_pairwise_jaccard"] == 1.0
