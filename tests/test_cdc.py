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


def test_stream_apply_changes_maintains_snapshot(spark, tmp_path):
    """Two micro-batches of CDC changes merged into a parquet snapshot
    via foreachBatch: batch 1 updates + inserts, batch 2 deletes and
    re-updates — the final snapshot reflects both in arrival order."""
    import json

    from spikex_spark.streaming.stream import stream_apply_changes

    snap_dir = str(tmp_path / "snap")
    _snap(spark).write.parquet(snap_dir)

    chg_dir = tmp_path / "changes"
    chg_dir.mkdir()
    b1 = [{"id": 1, "seq": 10, "op": "U", "name": "a1", "bal": 11.0},
          {"id": 9, "seq": 11, "op": "I", "name": "new", "bal": 99.0}]
    b2 = [{"id": 2, "seq": 20, "op": "D", "name": None, "bal": None},
          {"id": 1, "seq": 21, "op": "U", "name": "a2", "bal": 12.0}]
    (chg_dir / "b1.json").write_text(
        "\n".join(json.dumps(r) for r in b1))
    (chg_dir / "b2.json").write_text(
        "\n".join(json.dumps(r) for r in b2))
    # the file source orders batches by mtime — pin it so b1 precedes b2
    import os
    os.utime(chg_dir / "b1.json", (1_000_000_000, 1_000_000_000))
    os.utime(chg_dir / "b2.json", (1_000_000_100, 1_000_000_100))

    schema = ("id long, seq long, op string, name string, bal double")
    changes = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1)
               .json(str(chg_dir)))
    q = stream_apply_changes(changes, snap_dir, ["id"], "seq",
                             checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination()

    out = {r["id"]: (r["name"], r["bal"])
           for r in spark.read.parquet(snap_dir).collect()}
    assert out == {1: ("a2", 12.0), 3: ("c", 30.0), 9: ("new", 99.0)}
