"""Engine-free scaling of the docs-stage Python kernels on this host.

The flagship's docs_signatures stage is (a) HTML -> text extraction and
(b) the fused shingle/MinHash/SimHash numpy kernel, both Arrow-batched
Python. Whether K=2 -> K=8 such workers speed up 4x on THIS box is a host
property, independent of Spark: this tool runs the identical kernel
functions over the identical corpus texts in K plain multiprocessing
workers (no Spark, no Arrow, no JVM) and reports aggregate docs/sec per K.

Comparing these numbers against the Spark docs_signatures stage walls in
BENCH/stage_profile.json separates "the host can't scale this arithmetic"
from "the engine adds non-scaling overhead".

Writes BENCH/kernel_ceiling.json. Usage:
  python tools/kernel_ceiling.py [levels, default 2,8,32]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, "/root/repo")

N_ROWS = int(os.environ.get("SCALE_ROWS", "160000"))
CORPUS = f"/tmp/scale_corpus_{N_ROWS}_42_h1/pages.parquet"


def _worker(htmls: list[bytes], q: mp.Queue) -> None:
    import pandas as pd

    from intraarchivededuplicator_spark.config import DedupConfig
    from intraarchivededuplicator_spark.functions.hashing import signatures_batch
    from intraarchivededuplicator_spark.functions.textprep import extract_text_py

    cfg = DedupConfig()
    t0 = time.time()
    texts = pd.Series([extract_text_py(h) for h in htmls])
    t_extract = time.time() - t0
    t0 = time.time()
    signatures_batch(texts, cfg.k_shingle, cfg.minhash_params)
    t_sig = time.time() - t0
    q.put((len(htmls), round(t_extract, 2), round(t_sig, 2)))


def measure(k: int, htmls: list[bytes]) -> dict:
    chunks = [htmls[i::k] for i in range(k)]
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_worker, args=(c, q)) for c in chunks]
    t0 = time.time()
    for p in procs:
        p.start()
    outs = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.time() - t0
    n = sum(o[0] for o in outs)
    return {
        "procs": k,
        "rows": n,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n / wall, 1),
        "max_extract_sec": max(o[1] for o in outs),
        "max_sig_sec": max(o[2] for o in outs),
    }


def main() -> None:
    import pyarrow.parquet as pq

    from tools.scaling_bench import cpu_canary

    levels = [
        int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "2,8,32").split(",")
    ]
    htmls = pq.read_table(CORPUS, columns=["html"]).column("html").to_pylist()
    runs = []
    for k in levels:
        canary = cpu_canary()
        r = measure(k, htmls)
        r["canary_sec"] = canary
        runs.append(r)
        print(r, file=sys.stderr)
    out = {"rows": len(htmls), "runs": runs}
    for a, b in zip(runs, runs[1:]):
        f = b["procs"] / a["procs"]
        out[f"scaling_eff_{a['procs']}_to_{b['procs']}"] = round(
            a["wall_sec"] / b["wall_sec"] / f, 3
        )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "BENCH", "kernel_ceiling.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
