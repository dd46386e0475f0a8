"""ranking_auc: exact tie-corrected Mann-Whitney ROC AUC."""
from __future__ import annotations

import pytest


def _auc(spark, rows):
    from spikex_spark.operators.evaluation import ranking_auc

    df = spark.createDataFrame(rows, "score double, y int")
    return ranking_auc(df).collect()[0]


def _brute(rows):
    """Pairwise definition: P(s_pos > s_neg) + 0.5 P(s_pos = s_neg)."""
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    num = sum(1.0 if p > n else 0.5 if p == n else 0.0
              for p in pos for n in neg)
    return num / (len(pos) * len(neg))


def test_perfect_and_inverted(spark):
    rows = [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)]
    assert _auc(spark, rows)["auc"] == 1.0
    rows_inv = [(s, 1 - y) for s, y in rows]
    assert _auc(spark, rows_inv)["auc"] == 0.0


def test_ties_match_pairwise_definition(spark):
    rows = [(0.5, 1), (0.5, 0), (0.7, 1), (0.3, 0), (0.5, 1), (0.2, 0)]
    got = _auc(spark, rows)
    assert got["auc"] == pytest.approx(_brute(rows), abs=1e-6)
    assert got["gini"] == pytest.approx(2 * _brute(rows) - 1, abs=1e-6)
    assert (got["n_pos"], got["n_neg"]) == (3, 3)


def test_random_case_matches_brute_force(spark):
    import random

    rng = random.Random(11)
    rows = [(round(rng.random(), 2), rng.randint(0, 1)) for _ in range(60)]
    if not any(y for _, y in rows) or all(y for _, y in rows):
        rows += [(0.5, 0), (0.5, 1)]
    assert _auc(spark, rows)["auc"] == pytest.approx(_brute(rows), abs=1e-6)


def test_degenerate_single_class_is_null(spark):
    got = _auc(spark, [(0.5, 1), (0.6, 1)])
    assert got["auc"] is None and got["gini"] is None


def test_logistic_contributions_reconstruct_logit(spark):
    from spikex_spark.operators.linkage import (logistic_contributions,
                                                logistic_score,
                                                logistic_train)

    rows = [
        (1, 2, 1.0, 0.95, 0.90),
        (1, 3, 0.0, 0.20, 0.10),
        (2, 3, 1.0, 0.85, 0.80),
        (4, 5, 0.0, 0.40, 0.30),
    ]
    feat = spark.createDataFrame(
        rows, "id_a long, id_b long, y double, jw double, jacc double")
    wts = logistic_train(feat, ["jw", "jacc"], rounds=3)
    contribs = logistic_contributions(feat, wts, ["jw", "jacc"]).collect()
    by_pair = {}
    for r in contribs:
        by_pair.setdefault((r["id_a"], r["id_b"]), []).append(r)
    assert all(len(v) == 3 for v in by_pair.values())  # bias + 2 features
    # exact identity: every contribution is w_micro * f_micro
    for v in by_pair.values():
        for r in v:
            assert r["contrib_p12"] == r["w_micro"] * r["f_micro"]
    # z reconstructed from contributions reproduces the scorer's p_micro
    import math
    scores = {(r["id_a"], r["id_b"]): r["p_micro"]
              for r in logistic_score(feat, wts, ["jw", "jacc"]).collect()}
    for pair, v in by_pair.items():
        z = sum(r["contrib_p12"] for r in v) / 1e12
        pm = math.floor(1.0 / (1.0 + math.exp(-z)) * 1e6 + 0.5)
        assert pm == scores[pair]


def test_jackknife_fold_hash_portable(spark):
    """ADVICE r4: negative ids fold identically to the DuckDB mirror
    (Spark pmod vs sign-keeping %), and string ids are rejected up
    front instead of silently bucketing to NULL."""
    import duckdb
    import pytest as _pt

    from spikex_spark.operators.evaluation import pair_metrics_jackknife

    pred = spark.createDataFrame(
        [(-5, 3), (-7, -2), (4, 9), (1, 8)], "id_a long, id_b long")
    ref = spark.createDataFrame(
        [(-5, 3), (4, 9), (2, 6)], "id_a long, id_b long")
    rows = pair_metrics_jackknife(pred, ref, buckets=10).collect()
    got = {(r["bucket"], r["tp"], r["fp"], r["fn"]) for r in rows}
    assert all(b is not None and 0 <= b < 10 for b, *_ in got)

    con = duckdb.connect()
    con.execute("CREATE TABLE p (a BIGINT, b BIGINT)")
    con.execute("CREATE TABLE g (a BIGINT, b BIGINT)")
    con.executemany("INSERT INTO p VALUES (?, ?)",
                    [(-5, 3), (-7, -2), (4, 9), (1, 8)])
    con.executemany("INSERT INTO g VALUES (?, ?)",
                    [(-5, 3), (4, 9), (2, 6)])
    oracle = con.execute("""
      WITH j AS (
        SELECT (((((coalesce(p.a, g.a) % 10) + 10) % 10) * 31
                 + (((coalesce(p.b, g.b) % 10) + 10) % 10)) % 10)::INT
                 AS bucket,
               (p.a IS NOT NULL AND g.a IS NOT NULL)::BIGINT AS is_tp,
               (p.a IS NOT NULL AND g.a IS NULL)::BIGINT AS is_fp,
               (p.a IS NULL AND g.a IS NOT NULL)::BIGINT AS is_fn
        FROM p FULL JOIN g ON p.a = g.a AND p.b = g.b),
      per AS (SELECT bucket, sum(is_tp) AS btp, sum(is_fp) AS bfp,
                     sum(is_fn) AS bfn FROM j GROUP BY 1),
      tot AS (SELECT sum(is_tp) AS ttp, sum(is_fp) AS tfp,
                     sum(is_fn) AS tfn FROM j)
      SELECT bucket, (ttp - btp)::BIGINT, (tfp - bfp)::BIGINT,
             (tfn - bfn)::BIGINT FROM per CROSS JOIN tot
    """).fetchall()
    assert got == {tuple(r) for r in oracle}

    sp = spark.createDataFrame([("x", "y")], "id_a string, id_b string")
    with _pt.raises(TypeError, match="integral"):
        pair_metrics_jackknife(sp, sp, buckets=10)
