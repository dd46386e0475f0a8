"""CDC apply_changes (MERGE semantics) and snapshot_diff."""

from __future__ import annotations

from spikex_spark.operators.cdc import apply_changes, snapshot_diff


def _snap(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, bal double")


def test_apply_changes_upsert_delete_lww(spark):
    snap = _snap(spark)
    # key 1: two changes, highest seq wins; key 2: delete; key 9: insert
    changes = spark.createDataFrame(
        [(1, 100, "U", "a1", 11.0),
         (1, 200, "U", "a2", 12.0),
         (2, 150, "D", None, None),
         (9, 50, "I", "new", 99.0)],
        "id long, seq long, op string, name string, bal double")
    out = {r["id"]: (r["name"], r["bal"])
           for r in apply_changes(snap, changes, ["id"], "seq").collect()}
    assert out == {1: ("a2", 12.0), 3: ("c", 30.0), 9: ("new", 99.0)}


def test_apply_changes_delete_then_reinsert_by_seq(spark):
    snap = _snap(spark)
    changes = spark.createDataFrame(
        [(3, 10, "D", None, None), (3, 20, "I", "c2", 33.0)],
        "id long, seq long, op string, name string, bal double")
    out = {r["id"]: r["name"]
           for r in apply_changes(snap, changes, ["id"], "seq").collect()}
    assert out[3] == "c2"       # the later insert wins over the delete


def test_snapshot_diff_iud(spark):
    old = _snap(spark)
    new = spark.createDataFrame(
        [(1, "a", 10.0),          # unchanged -> absent from diff
         (2, "b", 21.0),          # payload changed -> U
         (4, "d", 40.0)],         # new key -> I ; key 3 dropped -> D
        "id long, name string, bal double")
    rows = {r["id"]: r for r in snapshot_diff(old, new, ["id"]).collect()}
    assert set(rows) == {2, 3, 4}
    assert rows[2]["op"] == "U" and rows[2]["bal"] == 21.0
    assert rows[3]["op"] == "D" and rows[3]["name"] is None
    assert rows[4]["op"] == "I" and rows[4]["name"] == "d"


def test_diff_then_apply_roundtrip(spark):
    # applying the diff as a CDC batch reproduces the new snapshot
    from pyspark.sql import functions as F
    old = _snap(spark)
    new = spark.createDataFrame(
        [(2, "b", 21.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, name string, bal double")
    diff = snapshot_diff(old, new, ["id"]).withColumn(
        "seq", F.monotonically_increasing_id())
    applied = apply_changes(old, diff, ["id"], "seq")
    assert (sorted(map(tuple, applied.collect()))
            == sorted(map(tuple, new.collect())))


def test_null_safe_payload_compare(spark):
    old = spark.createDataFrame([(1, None)], "id long, name string")
    new_same = spark.createDataFrame([(1, None)], "id long, name string")
    assert snapshot_diff(old, new_same, ["id"]).count() == 0
    new_set = spark.createDataFrame([(1, "x")], "id long, name string")
    assert snapshot_diff(old, new_set, ["id"]).collect()[0]["op"] == "U"
