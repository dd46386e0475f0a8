"""Absolute-scale evidence run (round-5 verdict item 5).

Runs the FLAGSHIP ``resolve_documents`` (default size-adaptive runner →
ledgered/bucketed above the size threshold) over a ≥10M-page synthetic
corpus with a 10–500 KB long-document mix, and over a 300k-page leg of
the SAME shape, recording per-leg:

* wall seconds (min of reps) and pages/sec,
* Spark stage totals from the status REST API — shuffle read/write
  bytes, input bytes, memory/disk spill (must stay ZERO), and
  executorRunTime → per-page executor-ms.

"Flat per-page executor-ms vs the 300k-page leg" is the 100×-scale
evidence that no per-doc (O(len²) lambda) or driver-side bottleneck
remains: if some stage were super-linear in corpus size or document
length, the 33× bigger, long-doc-bearing corpus would pay MORE engine
milliseconds per page, not the same.

Each leg runs in its OWN subprocess (fresh JVM) at local[32].
Corpus parquet lands on tmpfs (/dev/shm) — this sandbox's /tmp is one
slow block device, a serialization point no multi-executor cluster has.

Usage: python tools/bench_scale_abs.py [n_small n_big] [--keep-corpus]
Prints one JSON object; merge into BENCH_SCALING.json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from spikex_spark.session import get_spark
from pyspark.sql import functions as F

size, reps = int(sys.argv[1]), int(sys.argv[2])
master = sys.argv[3] if len(sys.argv) > 3 else "local[32]"
spark = get_spark(master=master, app_name=f"scale_abs_{{size}}",
                  extra_conf={{"spark.ui.enabled": "true",
                               # reap shuffle files of finished stages:
                               # with a 48g heap the driver GC (which
                               # triggers ContextCleaner) can otherwise
                               # lag the whole run, accumulating tens of
                               # GB of dead blocks on tmpfs (= RAM here)
                               "spark.cleaner.periodicGC.interval": "2min"}})


def stage_totals():
    import urllib.request
    base = spark.sparkContext.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{{base}}/api/v1/applications"))
    stages = json.load(urllib.request.urlopen(
        f"{{base}}/api/v1/applications/{{apps[0]['id']}}/stages?status=complete"))
    keys = ("shuffleWriteBytes", "shuffleReadBytes", "inputBytes",
            "outputBytes", "memoryBytesSpilled", "diskBytesSpilled",
            "executorRunTime", "executorCpuTime")
    return {{k: sum(s.get(k, 0) or 0 for s in stages) for k in keys}}


from spikex_spark import synth

pq = f"/dev/shm/scale_abs_{{size}}"
if not os.path.exists(pq + "/_SUCCESS"):
    t0 = time.time()
    # open vocabulary: the 26-word filler list saturates the shingle
    # universe at multi-million-page scale (corpus-wide signature
    # collisions no real crawl has) — see synth.gen_pages_scaled_df
    pages, _ = synth.gen_pages_scaled_df(
        spark, size, pages_per_entity=4, long_every=2000, vocab=200_000,
        partitions=max(32, size // 40000))
    # the flagship consumes (doc_id:int64, text); id = the uid embedded
    # in the url (deterministic, unique)
    docs = pages.select(
        F.regexp_extract("url", "([0-9]+)$", 1).cast("long").alias("doc_id"),
        "text")
    docs.write.mode("overwrite").parquet(pq)
    print(json.dumps({{"corpus_build_sec": round(time.time() - t0, 1)}}),
          flush=True)

docs = spark.read.parquet(pq)
n_docs = docs.count()
long_docs = docs.where(F.length("text") >= 10_000).count()
corpus_bytes = sum(
    os.path.getsize(os.path.join(pq, f)) for f in os.listdir(pq))

from spikex_spark.pipeline import resolve_documents

results = []
for rep in range(reps):
    before = stage_totals()
    t0 = time.time()
    # shingle_k=13 is the at-scale configuration (Lee et al. exact-substring
    # / RefinedWeb-class granularity). The gate-default k=5 char shingles
    # are fine at sf test scales but concentrate minhash minima on
    # universal 5-grams (" the ", template scaffold grams) at 10^7+ docs:
    # measured here, k=5 at 10M pages produced thousands of capped
    # mega-buckets and ~90 GB of pair shuffle — the bucket cap bounds each
    # block, but block COUNT grows with corpus size when the shingle
    # space concentrates. Larger shingles keep signatures discriminative,
    # the published practice for crawl-scale near-dup.
    resolve_documents(docs, threshold=0.80, shingle_k=13) \
        .write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    after = stage_totals()
    delta = {{k: after[k] - before[k] for k in after}}
    results.append({{"wall_sec": round(wall, 1), "stage_totals": delta}})
    print(json.dumps({{"rep": rep, "wall_sec": round(wall, 1)}}), flush=True)

best = min(results, key=lambda r: r["wall_sec"])
out = {{
    "n_docs": n_docs,
    "n_long_docs": long_docs,
    "corpus_parquet_bytes": corpus_bytes,
    "reps": reps,
    "wall_sec_min": best["wall_sec"],
    "pages_per_sec": round(n_docs / best["wall_sec"], 1),
    "stage_totals_best_rep": best["stage_totals"],
    "executor_ms_per_page": round(
        best["stage_totals"]["executorRunTime"] / n_docs, 4),
    "shuffle_write_over_input": round(
        best["stage_totals"]["shuffleWriteBytes"]
        / max(1, best["stage_totals"]["inputBytes"]), 4),
    "spill_bytes": best["stage_totals"]["memoryBytesSpilled"]
    + best["stage_totals"]["diskBytesSpilled"],
}}
print("RESULT " + json.dumps(out), flush=True)
"""


def run_leg(size: int, reps: int, master: str = "local[32]") -> dict:
    code = RUNNER.format(repo=REPO)
    proc = subprocess.run(
        [sys.executable, "-c", code, str(size), str(reps), master],
        capture_output=True, text=True, timeout=7200)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"leg {size} produced no RESULT\nstdout:{proc.stdout[-2000:]}\n"
        f"stderr:{proc.stderr[-2000:]}")


def two_level(size: int, n_low: int, n_high: int) -> None:
    """North-rule N vs 4N evidence at ABSOLUTE scale: the same 10M-page
    flagship job at local[n_low] and local[n_high], same corpus, fresh
    JVM per level. Throughput at both + raw scaling efficiency
    tp_high / (factor · tp_low)."""
    low = run_leg(size, reps=1, master=f"local[{n_low}]")
    print(json.dumps({f"local[{n_low}]": low}), flush=True)
    high = run_leg(size, reps=1, master=f"local[{n_high}]")
    factor = n_high / n_low
    report = {
        "workload": f"resolve_documents shingle_k=13, {size} pages, "
                    f"local[{n_low}] vs local[{n_high}]",
        "legs": {f"local[{n_low}]": low, f"local[{n_high}]": high},
        "pages_per_sec": {f"local[{n_low}]": low["pages_per_sec"],
                          f"local[{n_high}]": high["pages_per_sec"]},
        "raw_scaling_efficiency": round(
            high["pages_per_sec"] / (factor * low["pages_per_sec"]), 3),
        "work_inflation": round(
            high["executor_ms_per_page"] / low["executor_ms_per_page"], 3),
        "load_1m": round(os.getloadavg()[0], 2),
    }
    report["engine_side_efficiency"] = round(
        report["raw_scaling_efficiency"] * report["work_inflation"], 3)
    print("FINAL " + json.dumps(report))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--two-level" in sys.argv:
        size = int(args[0]) if args else 10_000_000
        n_low = int(args[1]) if len(args) > 1 else 8
        n_high = int(args[2]) if len(args) > 2 else 32
        two_level(size, n_low, n_high)
        if "--keep-corpus" not in sys.argv:
            shutil.rmtree(f"/dev/shm/scale_abs_{size}", ignore_errors=True)
        return
    n_small = int(args[0]) if args else 300_000
    n_big = int(args[1]) if len(args) > 1 else 10_000_000
    legs = {}
    legs[f"{n_small}"] = run_leg(n_small, reps=3)
    print(json.dumps({f"{n_small}": legs[f"{n_small}"]}), flush=True)
    # one rep at ≥10M: the leg runs ~1-2h and the headline evidence
    # (executor-ms/page, spill=0) is robust to wall-clock contention;
    # JVM/codegen warmup is noise at this scale
    legs[f"{n_big}"] = run_leg(n_big, reps=1 if n_big >= 5_000_000 else 2)
    small, big = legs[f"{n_small}"], legs[f"{n_big}"]
    report = {
        "workload": "resolve_documents default runner, local[32], "
                    "long_every=2000 (10-500KB docs)",
        "legs": legs,
        "executor_ms_per_page_ratio_big_over_small": round(
            big["executor_ms_per_page"] / small["executor_ms_per_page"], 3),
        "load_1m": round(os.getloadavg()[0], 2),
    }
    print("FINAL " + json.dumps(report))
    if "--keep-corpus" not in sys.argv:
        for size in (n_small, n_big):
            shutil.rmtree(f"/dev/shm/scale_abs_{size}", ignore_errors=True)


if __name__ == "__main__":
    main()
