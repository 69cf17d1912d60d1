"""A/B: connected-components localCheckpoint cadence (every round vs every
other round, aligned with the checksum barrier).

Waits for a clean host window (md5 canary), then interleaves A/B attempts on
the sf0.1 simhash_clusters input and reports best-of walls plus an output
identity check. Experiment harness only — not part of the engine.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from intraarchivededuplicator_spark.session import get_spark
from intraarchivededuplicator_spark.operators.cluster import (
    _checksum,
    _large_star,
    _small_star,
)
from intraarchivededuplicator_spark.operators.banded_join import banded_self_join
from intraarchivededuplicator_spark.plans.queries import SIMHASH_RADIUS, docs_with_sig

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CLEAN = float(os.environ.get("AB_CANARY_GATE", "0.26"))
WAIT_MIN = int(os.environ.get("AB_WAIT_MIN", "120"))


def canary() -> float:
    t0 = time.time()
    for i in range(400_000):
        hashlib.md5(b"canary %d" % i).digest()
    return round(time.time() - t0, 3)


def cc(edges, ckpt_every: int):
    spark = edges.sparkSession
    e = (
        edges.select(F.col("id_lo").alias("a"), F.col("id_hi").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    prev = _checksum(e)
    conf = spark.conf
    saved = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.shuffle.partitions", str(max(8, min(int(saved), prev[0] // 50_000 + 1))))
    try:
        for rnd in range(50):
            e = _large_star(e)
            e = _small_star(e)
            if rnd % ckpt_every == ckpt_every - 1:
                e = e.localCheckpoint()
            if rnd % 2 == 0:
                continue
            cur = _checksum(e)
            if cur == prev:
                break
            prev = cur
    finally:
        conf.set("spark.sql.shuffle.partitions", saved)
    members = (
        e.select(F.greatest("a", "b").alias("id"), F.least("a", "b").alias("cluster_id"))
        .groupBy("id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    roots = (
        e.select(F.least("a", "b").alias("id"))
        .distinct()
        .join(members.select("id"), "id", "left_anti")
        .select("id", F.col("id").alias("cluster_id"))
    )
    return members.unionByName(roots)


def main() -> None:
    t_deadline = time.time() + WAIT_MIN * 60
    while True:
        c = canary()
        print(f"{time.strftime('%T')} canary {c}", flush=True)
        if c <= CLEAN:
            break
        if time.time() > t_deadline:
            print("no clean window; giving up", flush=True)
            return
        time.sleep(120)

    spark = get_spark(app="cc-ab", master="local[32]", shuffle_partitions=32)
    d = docs_with_sig(spark, SF_DIR)
    pairs = banded_self_join(d, "doc_id", "simhash", SIMHASH_RADIUS, blacklist=(0,)).persist()
    pairs.count()

    # output identity first (throttle-insensitive)
    a_rows = sorted(map(tuple, cc(pairs, 1).collect()))
    b_rows = sorted(map(tuple, cc(pairs, 2).collect()))
    ident = a_rows == b_rows
    print(f"identity: {ident} ({len(a_rows)} rows)", flush=True)

    walls = {"A1": [], "B2": []}
    for trial in range(4):
        for tag, ck in (("A1", 1), ("B2", 2)):
            c0 = canary()
            t0 = time.time()
            cc(pairs, ck).count()
            dt = round(time.time() - t0, 3)
            walls[tag].append((dt, c0))
            print(f"{tag} trial{trial}: {dt}s (canary {c0})", flush=True)
    out = {
        "identity": ident,
        "best_A_every_round": min(w for w, _ in walls["A1"]),
        "best_B_every_other": min(w for w, _ in walls["B2"]),
        "walls": walls,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
