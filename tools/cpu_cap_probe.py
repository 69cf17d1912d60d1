"""Probe: does the sandbox host throttle cap AGGREGATE guest CPU?

Observed: during throttle episodes (single-core canary 0.3-0.5s vs ~0.2s
clean) the flagship's local[2] wall is INVARIANT (~249-250s across windows)
while local[8] swings 104-144s. Hypothesis: the external throttle caps the
guest's total CPU throughput at roughly a fixed number of core-equivalents,
so a 2-thread job stays under the cap while an 8-thread job is squeezed —
which structurally depresses any N->4N efficiency measured during such a
window, independent of engine code.

Test: run the exact canary workload (fixed md5 loop) in K parallel
processes; report aggregate loops/sec vs K. On an uncapped 32-core box
aggregate scales ~linearly to K=32; under an aggregate cap it plateaus at
the cap. Writes BENCH/cpu_cap_probe.json (appends one sample per
invocation, timestamped by the caller via --tag since results depend on
the throttle window in effect).

Usage: python tools/cpu_cap_probe.py [--tag label] [levels default 1,2,8,32]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

LOOPS = 400_000


def _worker(q: mp.Queue) -> None:
    import hashlib

    t0 = time.time()
    for i in range(LOOPS):
        hashlib.md5(b"canary %d" % i).digest()
    q.put(time.time() - t0)


def measure(k: int) -> dict:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_worker, args=(q,)) for _ in range(k)]
    t0 = time.time()
    for p in procs:
        p.start()
    times = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.time() - t0
    # aggregate throughput in single-clean-core equivalents (clean canary
    # ~0.2s for LOOPS): k workers finishing in wall seconds did k*LOOPS work
    return {
        "procs": k,
        "wall_sec": round(wall, 3),
        "per_proc_sec": [round(t, 3) for t in sorted(times)],
        "agg_core_equiv": round(k * 0.2 / wall, 2),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--tag")]
    tag = ""
    for i, a in enumerate(sys.argv):
        if a == "--tag" and i + 1 < len(sys.argv):
            tag = sys.argv[i + 1]
            args = [x for x in args if x != tag]
    levels = [int(x) for x in (args[0] if args else "1,2,8,32").split(",")]
    sample = {"tag": tag, "runs": [measure(k) for k in levels]}
    print(json.dumps(sample))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "BENCH", "cpu_cap_probe.json")
    path = os.path.abspath(path)
    hist = []
    if os.path.exists(path):
        try:
            with open(path) as f:
                hist = json.load(f).get("samples", [])
        except json.JSONDecodeError:
            pass
    hist.append(sample)
    with open(path, "w") as f:
        json.dump({"loops": LOOPS, "samples": hist}, f, indent=2)


if __name__ == "__main__":
    main()
