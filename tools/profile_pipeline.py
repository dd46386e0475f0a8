"""Profile where flagship-pipeline wall time goes at a given local[N] level.

The scaling companion to ``bench_scaling.py``: runs one warm
``resolve_entities`` over the scaled synthetic corpus and attributes wall
time from the Spark status REST API —

* average busy cores (executorRunTime / wall) vs the level's core count,
* the serial driver fraction (gaps between consecutive jobs: Catalyst/AQE
  re-planning, driver-side union-find, broadcast builds),
* a per-job timeline labeled with pipeline stage names
  (``lineage.run_stage`` sets ``spark.jobGroup``-level descriptions), and
* the top stages by task time with their task counts (under-parallel
  stages show up as numTasks << cores).

This is the tool that found the round-4 strong-scaling fixes: the AQE
1 MiB coalesce floor starving CPU-dense Arrow stages, the 9-tasks-on-
8-cores wave quantization, and the 4s serial pandas union-find.

Usage: python tools/profile_pipeline.py 'local[8]' 1200000
Env: PROFILE_EXTRA_CONF="k=v;k2=v2" for A/B-ing session config.
"""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spikex_spark.session import get_spark  # noqa: E402

master = sys.argv[1] if len(sys.argv) > 1 else "local[8]"
size = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
ncores = int(master.split("[")[1].rstrip("]"))

extra = {"spark.ui.enabled": "true"}
for kv in os.environ.get("PROFILE_EXTRA_CONF", "").split(";"):
    if "=" in kv:
        k, v = kv.split("=", 1)
        extra[k] = v
spark = get_spark(master=master, app_name="profile_scaling",
                  extra_conf=extra)

from pyspark.sql import functions as F  # noqa: E402

from spikex_spark import synth  # noqa: E402
from spikex_spark.pipeline import ERConfig, resolve_entities  # noqa: E402

pages_full, titles = synth.gen_pages_scaled_df(spark, size, pages_per_entity=4)
pq = f"/dev/shm/scale_corpus_{size}"
if not os.path.exists(pq + "/_SUCCESS"):
    pages_full.write.mode("overwrite").parquet(pq)
pages = spark.read.parquet(pq).select("url", "text")
titles = titles.localCheckpoint()
cfg = ERConfig(block_cap=500, nsalt=16, broadcast_keys_max=8_000_000,
               ledger_min_bytes=1 << 20)

# warmup
resolve_entities(pages, titles, cfg).count()

base = spark.sparkContext.uiWebUrl
appid = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))[0]["id"]


def jobs_and_stages():
    jobs = json.load(urllib.request.urlopen(
        f"{base}/api/v1/applications/{appid}/jobs"))
    stages = json.load(urllib.request.urlopen(
        f"{base}/api/v1/applications/{appid}/stages?status=complete"))
    return jobs, stages


j0, s0 = jobs_and_stages()
seen_jobs = {j["jobId"] for j in j0}
seen_stages = {(s["stageId"], s["attemptId"]) for s in s0}

t0 = time.time()
resolve_entities(pages, titles, cfg).count()
wall = time.time() - t0

j1, s1 = jobs_and_stages()
new_jobs = [j for j in j1 if j["jobId"] not in seen_jobs]
new_stages = [s for s in s1 if (s["stageId"], s["attemptId"]) not in seen_stages]


def dur_ms(obj, a="submissionTime", b="completionTime"):
    from datetime import datetime
    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
    try:
        ta = datetime.strptime(obj[a].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
        tb = datetime.strptime(obj[b].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
        return (tb - ta).total_seconds() * 1000
    except Exception:
        return 0.0


print(f"\n=== {master} size={size}: wall {wall:.2f}s, "
      f"{len(new_jobs)} jobs, {len(new_stages)} stages ===")

task_time = sum(s.get("executorRunTime", 0) for s in new_stages)
cpu_time = sum(s.get("executorCpuTime", 0) for s in new_stages) / 1e6
print(f"executorRunTime sum {task_time/1000:.1f}s  -> avg busy cores "
      f"{task_time/1000/wall:.1f} / {ncores}")
print(f"executorCpuTime sum {cpu_time/1000:.1f}s  -> avg cpu cores "
      f"{cpu_time/1000/wall:.1f} / {ncores}")

def label(j):
    return (j.get("description") or j.get("name", ""))[:80]


done_jobs = [j for j in new_jobs if "completionTime" in j]
job_ms = [(dur_ms(j), j["jobId"], label(j)) for j in done_jobs]
gaps = wall * 1000 - sum(d for d, _, _ in job_ms)
print(f"sum of job durations {sum(d for d, _, _ in job_ms)/1000:.2f}s; "
      f"driver gaps between jobs {gaps/1000:.2f}s")

print("\njob timeline (gap_before, duration, label):")
from datetime import datetime


def ts(j, k):
    return datetime.strptime(j[k].replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")


prev_end = None
for j in sorted(done_jobs, key=lambda j: j["jobId"]):
    sub, comp = ts(j, "submissionTime"), ts(j, "completionTime")
    gap = (sub - prev_end).total_seconds() if prev_end else 0.0
    prev_end = comp
    print(f"  gap {gap:6.2f}s  run {(comp-sub).total_seconds():6.2f}s  "
          f"job {j['jobId']:3d}  {label(j)}")

print("\ntop 12 stages by duration (numTasks, runTime_s, name):")
rows = sorted(new_stages,
              key=lambda s: s.get("executorRunTime", 0), reverse=True)[:12]
for s in rows:
    print(f"  run {s.get('executorRunTime', 0)/1000:7.1f}s "
          f"tasks {s.get('numCompleteTasks', 0):4d}  "
          f"{s.get('name', '')[:90]}")
spark.stop()
