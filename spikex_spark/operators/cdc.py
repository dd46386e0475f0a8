"""Change-data-capture over snapshot tables: MERGE-apply and diff.

The flagship input is an Iceberg-shaped table of crawled pages; in
production it is maintained by change batches (new crawls, recrawls,
takedowns), not rewritten. These two operators are the engine-side CDC
primitives — the semantics of Delta/Iceberg ``MERGE INTO`` and of a
Debezium changelog apply — expressed as plain DataFrame algebra:

* :func:`apply_changes` — upsert/delete a keyed change batch into a
  snapshot, last-writer-wins by a sequence column;
* :func:`snapshot_diff` — recover the minimal changelog (I/U/D) between
  two snapshot versions, the inverse operation.

Scale shape: ``apply_changes`` shuffles ONLY the change batch (one
window over the changes, grouped by key); the snapshot is touched by a
single left-anti join against the changed-key set, which a CDC-sized
batch makes broadcastable — the 100-TB snapshot never shuffles.
``snapshot_diff`` is one full-outer equi-join on the key, payload
comparison is a narrow null-safe expression.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(snapshot: DataFrame, changes: DataFrame,
                  key_cols: Sequence[str], seq_col: str,
                  op_col: str = "op") -> DataFrame:
    """The new snapshot after applying a CDC batch: per key the
    highest-``seq_col`` change wins (``seq_col`` must be unique per key
    — it is a changelog sequence number); op 'D' deletes the key, any
    other op upserts the change row's payload (which must carry the
    snapshot's columns). Unchanged keys pass through untouched."""
    win = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    latest = (changes.withColumn("_rn", F.row_number().over(win))
              .where(F.col("_rn") == 1).drop("_rn"))
    # the changed-key set is CDC-batch-sized: broadcast it so the big
    # snapshot side is a narrow anti-join scan, never a shuffle
    changed_keys = latest.select(*key_cols)
    kept = snapshot.join(F.broadcast(changed_keys), list(key_cols),
                         "left_anti")
    upserts = (latest.where(F.col(op_col) != "D")
               .select(*snapshot.columns))
    return kept.unionByName(upserts)


def snapshot_diff(old: DataFrame, new: DataFrame,
                  key_cols: Sequence[str]) -> DataFrame:
    """The minimal changelog turning ``old`` into ``new``: one row per
    differing key — op 'I' (only in new), 'D' (only in old), 'U' (in
    both, any payload column differing under null-safe comparison).
    Output: key columns + op + the NEW payload (nulls for 'D'). Both
    inputs must share a schema; keys must be unique in each."""
    keys = list(key_cols)
    payload = [c for c in old.columns if c not in keys]
    o = old.select(
        *[F.col(c).alias(f"_o_{c}") for c in keys],
        *[F.col(c).alias(f"_op_{c}") for c in payload])
    n = new.select(
        *[F.col(c).alias(f"_n_{c}") for c in keys],
        *[F.col(c).alias(f"_np_{c}") for c in payload])
    cond = None
    for c in keys:
        eq = F.col(f"_o_{c}") == F.col(f"_n_{c}")
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")
    in_old = F.col(f"_o_{keys[0]}").isNotNull()
    in_new = F.col(f"_n_{keys[0]}").isNotNull()
    same = None
    for c in payload:
        eq = F.col(f"_op_{c}").eqNullSafe(F.col(f"_np_{c}"))
        same = eq if same is None else same & eq
    if same is None:
        same = F.lit(True)
    op = (F.when(~in_old, F.lit("I"))
          .when(~in_new, F.lit("D"))
          .when(~same, F.lit("U")))
    out_keys = [F.coalesce(F.col(f"_o_{c}"), F.col(f"_n_{c}")).alias(c)
                for c in keys]
    out_payload = [F.col(f"_np_{c}").alias(c) for c in payload]
    return (j.select(*out_keys, op.alias("op"), *out_payload)
            .where(F.col("op").isNotNull()))
