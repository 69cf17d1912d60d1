"""SparkSession factory with the engine's standard knobs.

Local testing uses local[N]; at cluster scale the same conf applies (AQE,
skew-join handling, Arrow batching). Nothing here is sandbox-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "iad-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    adaptive: bool = False,
) -> SparkSession:
    """adaptive: AQE is OFF by default for this engine. Measured on the
    flagship pairs plan (~40 exchanges, many independent query stages): AQE's
    per-stage driver re-planning serialized the stage graph and cost 4x wall
    (128s vs 33s warm at 160k docs, local[32]). The engine handles skew
    explicitly (banded salting, hot-key caps, rarest-anchor selection), which
    is what AQE's skew-join would otherwise cover; static planning is faster
    AND deterministic. Pass adaptive=True for ad-hoc exploratory sessions.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # shuffle/spill dir: prefer RAM-backed tmpfs in the sandbox — the VM's
    # block device serializes shuffle IO and flattens core-count scaling
    # (measured speedup 1.01x from 8->32 cores with /tmp shuffle files). On a
    # real cluster the analog is local NVMe per executor.
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if local_dir is None and os.path.isdir("/dev/shm"):
        # guard: RAM-backed shuffle only when tmpfs has real headroom
        # (>= 32 GiB free), so a host smaller than the sandbox keeps
        # disk-backed spill instead of racing the heap for the same RAM.
        # SPARK_GRAFT_TMPFS=0/1 overrides the heuristic either way.
        want = os.environ.get("SPARK_GRAFT_TMPFS")
        if want is None:
            st = os.statvfs("/dev/shm")
            want = "1" if st.f_bavail * st.f_frsize >= 32 << 30 else "0"
        if want == "1":
            local_dir = "/dev/shm/spark-local"
            os.makedirs(local_dir, exist_ok=True)
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.adaptive.enabled", str(adaptive).lower())
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: driver memory IS the whole JVM heap (all executor
        # threads, cache, broadcasts); size for the 128 GiB sandbox. On a
        # real cluster the executors have their own spark.executor.memory.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # Implicit broadcasts OFF: with AQE disabled the static planner
        # trusts pre-execution size ESTIMATES, and a narrow projection of a
        # cached table estimates tiny while its exploded/banded expansion
        # materializes huge — observed: an 8.5 GiB broadcast build (driver
        # single-threaded, the 640k-doc scaling killer) planned from a 20 MB
        # estimate. Every join that SHOULD broadcast (dimension tables, hot
        # band keys, anchor sets, probe sets) carries an explicit
        # F.broadcast hint, which still works with the threshold at -1.
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        # a broadcast side may sit atop an expensive subtree (containment's
        # anchor table aggregates the full exploded shingle set); the default
        # 300s kills legitimate low-parallelism runs
        .config("spark.sql.broadcastTimeout", "3600")
    )
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
