"""SparkSession factory tuned for this engine.

Local-mode testing stands in for a multi-executor cluster; all scale knobs
(AQE, skew-join handling, shuffle partitions, Arrow) are set the way a
production submit would set them, so the plans we test are the plans we'd
ship via ``spark-submit --py-files``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    master: str | None = None,
    app_name: str = "spikex_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    * AQE on (runtime coalesce + skew-join splitting — the runtime half of
      our skew strategy; the static half is explicit salting in blocking).
    * Arrow on (every Python-side stage is an Arrow batch stage).
    * Shuffle partitions sized to cores for local mode; a cluster submit
      overrides via ``--conf`` (rule of thumb: 2-3x total cores, or
      input_bytes / 128MB, whichever is larger).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    # default parallelism AND shuffle partitions = 2x cores, not 1x: AQE's
    # parallelism-first coalesce floor and the parquet leaf-split count both
    # derive from defaultParallelism, and a floor of exactly-cores quantizes
    # stages into "one full wave plus a straggler wave" (measured: a 9-task
    # CPU-dense stage on 8 cores runs ~1.8x its ideal wall). Two even waves
    # of half-size tasks track the ideal — the docstring's own 2-3x rule of
    # thumb, now applied to the local default; cluster submits override via
    # --conf as usual.
    ncores = None
    if master.startswith("local["):
        inner = master[len("local["):].rstrip("]")
        ncores = os.cpu_count() if inner == "*" else int(inner)
    nshuffle = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS",
                       2 * ncores if ncores else DEFAULT_SHUFFLE_PARTITIONS)
    )
    # the JVM never creates java.io.tmpdir itself — make the default
    # scratch path exist before launch (harmless if an env override
    # points elsewhere)
    try:
        os.makedirs("/dev/shm/spark-local/jvmtmp", exist_ok=True)
    except OSError:
        pass
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesce floor: the default 1 MiB minPartitionSize is a
        # byte-density heuristic that starves CPU-dense stages — a pairwise
        # Jaro-Winkler Arrow stage carries ~100 bytes/pair but ~10 µs CPU, so
        # a 6 MiB shuffle coalesced to six 1 MiB partitions pins a
        # seconds-long scoring stage to 6 of 32 cores (measured: the single
        # biggest strong-scaling loss at local[32]). 64 KiB keeps small
        # CPU-heavy shuffles at full width; at production scale partitions
        # are orders of magnitude above either floor, so this only changes
        # the small-input tail.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                "64kb")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local mode = driver-only: the driver heap IS the executor memory;
        # size it for 32 concurrent tasks with array-heavy rows
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # shuffle/checkpoint scratch on tmpfs: the sandbox block device has
        # slow, bursty writeback (load-avg spikes from flush kworkers) that
        # made identical runs vary 16s-113s; on a real cluster this is the
        # usual fast local SSD / NVMe scratch
        .config("spark.local.dir",
                os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
        # shuffle-merge transferTo mmaps partition files — on tmpfs the
        # concurrent map/unmap calls serialized in the kernel (80% sys time)
        .config("spark.file.transferTo", "false")
        # whole-stage codegen for the ER plan exceeds HotSpot's
        # DontCompileHugeMethods bytecode limit, leaving the hot loop
        # INTERPRETED (measured 150x CPU inflation, 1227s vs 8s for one
        # stage); let the JIT compile huge generated methods
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_DRIVER_JAVA_OPTS",
                # java.io.tmpdir on the fast scratch: TEMPORARY streaming
                # checkpoints (offsets/commits/state, fsync'd per
                # micro-batch) and other JVM scratch files otherwise land
                # on this sandbox's slow bursty /tmp block device — on a
                # real cluster this is the same fast local scratch as
                # spark.local.dir. Durable checkpoints pass an explicit
                # checkpointLocation and are unaffected.
                "-XX:-DontCompileHugeMethods "
                "-Djava.io.tmpdir=/dev/shm/spark-local/jvmtmp"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # joins may reuse an existing partitioning on a SUBSET of the join
        # keys (e.g. the (block_key, salt) pair self-join over a stage
        # bucketed by block_key) instead of re-shuffling both sides; our
        # bucketed stages are salt/cap-guarded so the skew concern behind
        # the conservative default does not apply
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        # PySpark 4's DataFrame-debugging wrapper charges EVERY Python API
        # call ~4 extra py4j round-trips (conf.get + JVM origin set/clear)
        # plus a Python stack walk, purely to enrich error messages with
        # user call sites. Plan CONSTRUCTION is inside every timed query
        # (and on a real cluster it is the same driver-side latency), and
        # the big expression trees here make thousands of API calls:
        # measured 2x faster construction with it off (simhash_near_dups
        # 1.8->0.65s, minhash_near_dups 1.2->0.75s per build). Pure
        # driver-side planning overhead at any scale; values and plans are
        # untouched.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    if ncores:
        builder = builder.config("spark.default.parallelism", str(2 * ncores))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
