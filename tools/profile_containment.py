"""Sub-stage profile of the containment leg — which exchange doesn't scale.

Times the containment operator's internal stages separately at local[N] on
the scaling corpus: (1) the df>=2 shingle table (corpus x shingle groupBy),
(2) the inner-anchor build (join-back + per-doc window), (3) the candidate
join through the shingle-subset filter, (4) the suffix-array verify. Each
stage records a CPU canary (the host throttles episodically).

Usage: SCALE_ROWS=160000 python tools/profile_containment.py 8
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

N_ROWS = int(os.environ.get("SCALE_ROWS", "160000"))
SEED = 42
CORPUS_DIR = f"/tmp/scale_corpus_{N_ROWS}_{SEED}_h1"


def run(cpus: int) -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from intraarchivededuplicator_spark.config import DedupConfig
    from intraarchivededuplicator_spark.engine.pipeline import compute_docs
    from intraarchivededuplicator_spark.operators.containment import (
        containment_pairs,
    )
    from intraarchivededuplicator_spark.session import get_spark
    from tools.scaling_bench import cpu_canary, ensure_corpus

    ensure_corpus()
    spark = get_spark(
        app=f"profile-cont-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
    )
    pages = spark.read.parquet(f"{CORPUS_DIR}/pages.parquet")
    cfg = DedupConfig()
    target_parts = spark.sparkContext.defaultParallelism * 2
    docs = compute_docs(
        pages.repartition(target_parts), cfg,
        hash_partitions=target_parts, rep_gate=cfg.exact_first,
    ).persist()
    docs.count()
    matchable = (
        docs.filter((F.col("n_tokens") > 0) & (F.col("id") == F.col("rep_id")))
        .drop("rep_id")
        .persist()
    )
    matchable.count()

    phases: dict[str, float] = {}
    canaries: dict[str, float] = {}

    def phase(name, fn):
        canaries[name] = cpu_canary()
        t0 = time.time()
        out = fn()
        phases[name] = round(time.time() - t0, 2)
        print(
            f"phase {name}: {phases[name]}s (canary {canaries[name]}s) -> {out}",
            file=sys.stderr,
        )
        return out

    base = matchable.filter(F.col("shingle_hashes").isNotNull()).select(
        F.col("id").alias("_id"),
        F.col("text").alias("_text"),
        F.length("text").alias("_len"),
        F.col("shingle_hashes").alias("_sh"),
    )
    exploded = base.select("_id", F.explode("_sh").alias("s"))
    phase("exploded_rows", exploded.count)

    multi = (
        exploded.groupBy("s").agg(F.count("*").alias("df")).filter(F.col("df") >= 2)
    ).persist()
    phase("df_multi", multi.count)

    shared = exploded.join(multi, "s")
    phase("shared_rows", shared.count)

    ranked = shared.select(
        "_id", "s", "df",
        F.row_number().over(Window.partitionBy("_id").orderBy("df", "s")).alias("_rn"),
        F.count("*").over(Window.partitionBy("_id")).alias("_n_multi"),
    ).filter(F.col("_rn") <= 3)
    meta = base.select("_id", "_len", F.size("_sh").alias("_n_sh"))
    inner = (
        ranked.join(meta, "_id")
        .filter(F.col("_n_multi") >= F.col("_n_sh") - 2)
        .select(
            F.col("_id").alias("inner_id"),
            F.col("_len").alias("inner_len"),
            F.col("s").alias("anchor"),
            F.col("df").alias("_adf"),
        )
    ).persist()
    phase("inner_anchors", inner.count)

    # full operator end-to-end for reference (includes everything above again)
    cont = containment_pairs(
        matchable, "id", "text", cfg.k_shingle, shingle_col="shingle_hashes"
    )
    phase("containment_full", cont.count)
    multi.unpersist(); inner.unpersist()
    spark.stop()
    print(json.dumps({"cpus": cpus, "rows": N_ROWS, "phases": phases,
                      "canaries": canaries}))


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
