"""Host streaming-memory-bandwidth ceiling — the second engine-free bound.

The flagship's docs_signatures stage is an Arrow text shuttle plus hash
kernels (xxhash shingles / MinHash / SimHash over contiguous buffers): pure
streaming reads, no Spark exchange. Whether 2 -> 8 such workers speed up 4x
is a property of the HOST's memory system, not of any engine code. This
tool measures it with no Spark and no engine code at all: K independent
processes each stream-reduce a private 256 MiB numpy buffer for a fixed
wall window; aggregate GB/s at K=2 vs K=8 (vs K=32) is the ceiling any
memory-streaming stage can scale to on this box.

Writes BENCH/membw_ceiling.json; rendered into BENCH/BASELINE.md by
tools/scaling_bench.py --report.

Usage: python tools/membw_ceiling.py [levels, default 2,8,32]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, "/root/repo")

BUF_MB = 256
WINDOW_SEC = 6.0


def _worker(q: mp.Queue) -> None:
    import numpy as np

    buf = np.random.default_rng(0).random(BUF_MB * 1024 * 1024 // 8)
    # touch once so the timing window measures steady-state streaming
    float(buf.sum())
    t0 = time.time()
    passes = 0
    while time.time() - t0 < WINDOW_SEC:
        float(buf.sum())
        passes += 1
    dt = time.time() - t0
    q.put(passes * BUF_MB / 1024.0 / dt)  # GiB/s for this worker


def measure(k: int) -> float:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_worker, args=(q,)) for _ in range(k)]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return round(total, 2)


def main() -> None:
    from tools.scaling_bench import cpu_canary

    levels = [
        int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "2,8,32").split(",")
    ]
    runs = []
    for k in levels:
        canary = cpu_canary()
        gbps = measure(k)
        runs.append({"procs": k, "agg_gib_per_sec": gbps, "canary_sec": canary})
        print(runs[-1], file=sys.stderr)
    out = {"buf_mib": BUF_MB, "window_sec": WINDOW_SEC, "runs": runs}
    for a, b in zip(runs, runs[1:]):
        f = b["procs"] / a["procs"]
        out[f"scaling_eff_{a['procs']}_to_{b['procs']}"] = round(
            b["agg_gib_per_sec"] / a["agg_gib_per_sec"] / f, 3
        )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "BENCH", "membw_ceiling.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
