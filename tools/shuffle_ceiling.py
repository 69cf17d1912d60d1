"""Host shuffle-throughput ceiling microbenchmark (scaling-evidence context).

Measures a BARE Spark shuffle — no engine code at all — at several local[N]
levels: a 62M-row repartition-by-key and a 62M-row -> 9.9M-key hash
aggregation, generated from spark.range (so the input costs nothing and the
exchange is the whole measurement). Each level runs in a fresh JVM with a
JIT warm-up pass and a CPU canary.

Purpose: the flagship's pairs stage contains corpus x shingle-sized keyed
exchanges (operators/containment.py shuffle-budget note). On THIS sandbox,
even a bare exchange stops scaling past ~8 cores — the single box's memory
system is the ceiling, not the plan. On a real cluster each executor brings
its own memory controllers and shuffle disks, so keyed exchanges scale with
executor count. This tool makes that claim reproducible: if the bare-shuffle
ceiling binds at N cores, no plan on this host can beat it.

Usage:
  python tools/shuffle_ceiling.py            # levels 2, 8, 32 -> JSON line
  SHUF_LEVELS=8,32 python tools/shuffle_ceiling.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

N_ROWS = 62_000_000
N_KEYS = 9_900_000
LEVELS = tuple(int(x) for x in os.environ.get("SHUF_LEVELS", "2,8,32").split(","))


def cpu_canary() -> float:
    import hashlib

    t0 = time.time()
    for i in range(400_000):
        hashlib.md5(b"canary %d" % i).digest()
    return round(time.time() - t0, 3)


def measured_run(cpus: int) -> dict:
    from pyspark.sql import functions as F

    from intraarchivededuplicator_spark.session import get_spark

    spark = get_spark(
        app=f"shuffle-ceiling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
    )
    df = spark.range(0, N_ROWS, 1, cpus * 2).select(
        (F.col("id") % N_KEYS).alias("k"), F.xxhash64("id").alias("v")
    )
    # JIT warm-up of both exchange paths
    small = spark.range(0, 2_000_000, 1, cpus * 2).select(
        (F.col("id") % 100_000).alias("k"), F.xxhash64("id").alias("v")
    )
    small.repartition(cpus * 2, "k").count()
    small.groupBy("k").agg(F.count("*").alias("c")).filter(F.col("c") > 2).count()

    canary = cpu_canary()
    t0 = time.time()
    df.repartition(cpus * 2, "k").count()
    repart = round(time.time() - t0, 2)
    t0 = time.time()
    df.groupBy("k").agg(F.count("*").alias("c")).filter(F.col("c") > 2).count()
    group = round(time.time() - t0, 2)
    spark.stop()
    return {
        "cpus": cpus,
        "canary_sec": canary,
        "repartition_sec": repart,
        "groupby_sec": group,
        "rows": N_ROWS,
        "keys": N_KEYS,
    }


OUT_JSON = "/root/repo/BENCH/shuffle_ceiling.json"


def main() -> None:
    runs = []
    for cpus in LEVELS:
        proc = subprocess.run(
            [sys.executable, __file__, "--run", str(cpus)],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        if proc.returncode != 0:
            print(proc.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"local[{cpus}] run failed")
        run = json.loads(proc.stdout.strip().splitlines()[-1])
        print(json.dumps(run), file=sys.stderr)
        runs.append(run)
    summary = {"metric": "bare_shuffle_ceiling", "runs": runs}
    os.makedirs(os.path.dirname(OUT_JSON), exist_ok=True)
    with open(OUT_JSON, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        print(json.dumps(measured_run(int(sys.argv[2]))))
    else:
        main()
