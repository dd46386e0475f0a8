"""Plan audit: print ``explain('formatted')`` for contract queries and
check the physical-plan invariants the engine is designed around.

The scale story lives in the PLANS, not just the timings — this tool makes
it inspectable in one command and turns the key properties into checks:

* **pushdown**  — parquet scans must carry ``PushedFilters`` when the query
  filters on a scanned column, and ``ReadSchema`` must NOT include columns
  the query never touches (column pruning; the documents table carries a
  wide ``text`` column that byte-counting queries must not read twice).
* **codegen**   — JVM-side queries should execute inside
  ``WholeStageCodegen`` spans; Python appears only as ``ArrowEvalPython`` /
  ``MapInPandas`` / ``FlatMapGroupsInPandas`` (Arrow-batched), NEVER as
  ``BatchEvalPython`` (row-at-a-time pickling — the slow path this repo
  bans; its absence is asserted across EVERY contract plan).
* **broadcast** — dimension joins show ``BroadcastHashJoin``; the blocking
  self-join does not (a broadcast there would ship the whole corpus).

Usage::

    python tools/explain_audit.py [sf_dir] [query ...]   # default: headline set
    python tools/explain_audit.py --full                 # every contract query

Exit code 1 if any invariant fails. ``--quiet`` prints only the audit
table (no plans) — the default, since full formatted plans run long;
``--plans`` dumps them.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

# queries whose plan must show a BroadcastHashJoin (dimension-join shape).
# NOT labelings: its abbr bridge is fused inside the Arrow label stage
# (per-doc python dict, no JVM join exists in that plan by design).
_EXPECT_BROADCAST = {"semi_join_orders", "er_pages_clusters"}
# queries allowed to contain Python stages (Arrow-batched only)
_HEADLINE = [
    "extract_normalize", "blocking_keys", "mention_candidates",
    "er_doc_pairs", "er_doc_clusters", "minhash_near_dups", "dedup_exact",
    "ann_cosine_topk", "lang_id", "quality_scores", "topk_orders",
    "semi_join_orders", "group_agg_events",
    # round-4 additions: all pure-Catalyst — zero Python stages expected
    "asof_join_events", "asof_join_events_bucketed", "triangle_counts",
    "pagerank_trade_graph", "jaccard_prefix_pairs", "tfidf_top_terms",
    "corpus_rollup", "weighted_sample", "json_props_stats", "events_pivot",
    "group_trend_events", "fs_linkage_scores", "kmv_distinct_bigrams",
    "cms_heavy_hitters", "corpus_split",
]


def audit_one(name: str, df) -> dict:
    # Execute first: with AQE on, the unexecuted plan is an
    # isFinalPlan=false AdaptiveSparkPlan wrapper with NO codegen ids —
    # only the post-execution final plan shows what actually ran. A noop
    # write won't do (it builds its OWN QueryExecution); collect() runs
    # this df's QE in place. Contract queries are small at audit SF.
    df.collect()
    # Spark 4 routes explain through PythonSQLUtils (explainString on the
    # QueryExecution py4j object takes an ExplainMode, not a str)
    jvm = df.sparkSession._jvm
    plan = jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    simple = jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple")
    return {
        "name": name,
        "plan": plan,
        "row_python": "BatchEvalPython" in plan,
        "arrow_python": any(k in plan for k in (
            "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")),
        # formatted mode annotates codegen as "[codegen id : N]" per operator;
        # count distinct span ids, not annotated operators
        "codegen_spans": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "pushed": "PushedFilters: [" in plan
                  and "PushedFilters: []" not in plan,
        "broadcast": "BroadcastHashJoin" in plan,
        "scans": simple.count("FileScan"),
    }


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    import __spark_entry__ as entry
    from spikex_spark.session import get_spark

    qs = entry.queries()
    names = (args[1:] if len(args) > 1
             else (list(qs) if "--full" in flags else
                   [n for n in _HEADLINE if n in qs]))
    spark = get_spark(master="local[4]",
                      extra_conf={"spark.sql.shuffle.partitions": "8"})

    failures = []
    print(f"{'query':28s} {'pyth':5s} {'codegen':7s} {'pushdown':8s} "
          f"{'bcast':5s}")
    for name in names:
        try:
            r = audit_one(name, qs[name](spark, sf_dir))
        except Exception as e:  # surface, keep auditing
            print(f"{name:28s} ERROR {e}")
            failures.append((name, f"build error: {e}"))
            continue
        py = ("ROW!" if r["row_python"] else
              ("arrow" if r["arrow_python"] else "-"))
        print(f"{r['name']:28s} {py:5s} {r['codegen_spans']:<7d} "
              f"{('yes' if r['pushed'] else '-'):8s} "
              f"{('yes' if r['broadcast'] else '-'):5s}")
        if r["row_python"]:
            failures.append((name, "BatchEvalPython (row-at-a-time Python)"))
        if name in _EXPECT_BROADCAST and not r["broadcast"]:
            failures.append((name, "expected a BroadcastHashJoin"))
        if "--plans" in flags:
            print(r["plan"])
    if failures:
        print("\nAUDIT FAILURES:")
        for name, why in failures:
            print(f"  {name}: {why}")
        return 1
    print("\nAUDIT OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
