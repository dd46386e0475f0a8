from __future__ import annotations

import pytest

from spikex_spark.operators.schemes import greedy_blocking_scheme

# channel -> candidate pairs; gold = {(1,2),(3,4),(5,6),(7,8)}
CHANNELS = {
    # covers 3 gold pairs but is expensive (6 pairs)
    "wide": [(1, 2), (3, 4), (5, 6), (10, 11), (12, 13), (14, 15)],
    # covers 2 gold pairs cheaply
    "cheap": [(1, 2), (3, 4)],
    # the only channel that covers (7,8); overlaps elsewhere
    "tail": [(7, 8), (5, 6), (20, 21)],
    # gold-free noise
    "noise": [(30, 31), (32, 33)],
}
GOLD = [(1, 2), (3, 4), (5, 6), (7, 8)]


def _brute(channels, gold, rounds=None):
    g = set(gold)
    ch = {k: {tuple(sorted(p)) for p in v} for k, v in channels.items()}
    n = len(ch) if rounds is None else min(rounds, len(ch))
    covered_gold, covered = set(), set()
    out = []
    cg = cc = 0
    for r in range(1, n + 1):
        stats = sorted(
            (-len((ch[k] & g) - covered_gold), len(ch[k] - covered), k)
            for k in ch
        )
        ng, nc, k = -stats[0][0], stats[0][1], stats[0][2]
        cg += ng
        cc += nc
        out.append((r, k, ng, nc, cg, cc))
        covered_gold |= ch[k] & g
        covered |= ch[k]
        del ch[k]
    return out


def _run(spark, channels, gold, rounds=None):
    dfs = {
        k: spark.createDataFrame(v, "id_a long, id_b long")
        for k, v in channels.items()
    }
    gdf = spark.createDataFrame(gold, "id_a long, id_b long")
    rows = greedy_blocking_scheme(dfs, gdf, rounds=rounds).collect()
    return [
        (r["round"], r["channel"], r["new_gold"], r["new_cands"],
         r["cum_gold"], r["cum_cands"])
        for r in sorted(rows, key=lambda x: x["round"])
    ]


def test_greedy_schedule_matches_bruteforce(spark):
    got = _run(spark, CHANNELS, GOLD)
    assert got == _brute(CHANNELS, GOLD)
    # wide wins round 1 (3 gold), tail adds its irreplaceable pair next
    assert got[0][1] == "wide" and got[0][2] == 3
    assert got[1][1] == "tail" and got[1][2] == 1
    # later rounds add zero gold; cheap beats noise on cost (2 == 2) ->
    # alphabetical tie-break
    assert [g[1] for g in got[2:]] == ["cheap", "noise"]
    # cheap's pairs are fully covered by wide -> zero NEW candidates
    assert got[2][3] == 0


def test_rounds_budget(spark):
    got = _run(spark, CHANNELS, GOLD, rounds=2)
    assert len(got) == 2
    assert got == _brute(CHANNELS, GOLD, rounds=2)


def test_tie_break_on_cost_then_name(spark):
    channels = {
        "b_costly": [(1, 2), (10, 11), (12, 13)],
        "a_cheap": [(1, 2), (10, 11)],
    }
    gold = [(1, 2)]
    got = _run(spark, channels, gold)
    # equal gold coverage -> fewer candidates wins
    assert got[0][1] == "a_cheap"
    assert got == _brute(channels, gold)
