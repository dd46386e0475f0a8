"""Per-query isolation bench (guide §1.4) — NOT the driver's bench.

Times individual declared queries with the noop sink at
$SPARK_GRAFT_SF_DIR, min-of-N reps with memo clearing (same methodology as
bench.py), and optionally dumps .explain("formatted") to plans/<tag>/.

Usage:
    python bench_extra.py q1 q2 ...            # time queries
    BENCH_EXTRA_PLANS=plans/r06 BENCH_EXTRA_SUFFIX=_before \
        python bench_extra.py q1 q2 ...        # also dump plans
    BENCH_EXTRA_REPS=2 python bench_extra.py ...

Prints one JSON line {"queries": {...}, "sf": ..., "cpus": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = max(1, int(os.environ.get("BENCH_EXTRA_REPS", "2")))
    plans_dir = os.environ.get("BENCH_EXTRA_PLANS")
    suffix = os.environ.get("BENCH_EXTRA_SUFFIX", "")

    import __spark_entry__ as entrymod
    from spikex_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="bench_extra")
    qs = entrymod.queries()

    names = sys.argv[1:]
    if not names:
        print("usage: bench_extra.py <query> [<query> ...]", file=sys.stderr)
        sys.exit(2)

    # JVM warm-up: tiny-SF pass of the flagship (same as bench.py)
    warm_sf = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_sf):
        warm_sf = sf_dir
    qs["er_doc_clusters"](spark, warm_sf).write.format("noop").mode(
        "overwrite").save()
    entrymod._DOC_CLUSTERS_MEMO.clear()
    entrymod._DOC_PAIRS_MEMO.clear()

    def _clear_memos() -> None:
        entrymod._DOC_CLUSTERS_MEMO.clear()
        entrymod._DOC_PAIRS_MEMO.clear()

    timings: dict[str, float] = {}
    for name in names:
        if name == "er_pages_blocks_write":
            fn = lambda s, d: entrymod._er_pages_blocks(s, d)  # noqa: E731
        else:
            fn = qs[name]
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            _clear_memos()
            df = fn(spark, sf_dir)
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))
        best = None
        for _ in range(reps):
            _clear_memos()
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    print(json.dumps({"queries": timings, "sf": sf_dir, "cpus": int(cpus),
                      "reps": reps,
                      "load_1m": round(os.getloadavg()[0], 2)}))


if __name__ == "__main__":
    main()
