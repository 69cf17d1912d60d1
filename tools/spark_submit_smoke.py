"""Evidence for the north rule's deploy clause: the dedup pipeline run via a
REAL ``spark-submit --py-files iad_spark.zip jobs/dedup_job.py`` process —
not a python import — plus checkpoint-resume proof: a second run is
SIGKILLed right after the `pairs` stage sidecar lands, then re-submitted
with the same --checkpoint-dir; the resumed run must report
resumed_stages == ["docs", "pairs"] and produce identical docs/pairs/cluster
counts to the uninterrupted run.

Mirrors the reference's resume-after-interrupt behavior (incremental re-scan
skip, /root/reference/scanner/fileHasher.py:309-356) at deploy granularity.

Writes BENCH/spark_submit_smoke.json. Run:  python tools/spark_submit_smoke.py
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_ROWS = int(os.environ.get("SMOKE_ROWS", "4000"))
SEED = 42
MASTER = os.environ.get("SMOKE_MASTER", "local[8]")


def build_zip(work: str) -> str:
    """Package the library the way a cluster deploy would (--py-files)."""
    zpath = os.path.join(work, "iad_spark.zip")
    pkg = os.path.join(REPO, "intraarchivededuplicator_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def ensure_corpus(work: str) -> str:
    corpus_dir = f"/tmp/submit_corpus_{N_ROWS}_{SEED}"
    if not os.path.exists(f"{corpus_dir}/pages.parquet"):
        sys.path.insert(0, REPO)
        from intraarchivededuplicator_spark.fixtures.synth import (
            gen_pages,
            write_parquet,
        )

        write_parquet(
            gen_pages(n_rows=N_ROWS, seed=SEED, min_tokens=100, max_tokens=600),
            corpus_dir,
        )
    return f"{corpus_dir}/pages.parquet"


def submit_cmd(zpath: str, inp: str, wh: str, ck: str) -> list[str]:
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(shutil.which("pyspark") or sys.executable), "spark-submit"
    )
    return [
        spark_submit,
        "--master", MASTER,
        "--conf", "spark.sql.shuffle.partitions=16",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zpath,
        os.path.join(REPO, "jobs", "dedup_job.py"),
        "--input", inp,
        "--warehouse", wh,
        "--checkpoint-dir", ck,
    ]


def run_full(cmd: list[str]) -> dict:
    out = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=1200
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"spark-submit failed rc={out.returncode}")
    last = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def run_killed_after_pairs(cmd: list[str], ck: str) -> float:
    """Launch, wait for the pairs sidecar, SIGKILL the whole process group."""
    proc = subprocess.Popen(
        cmd, cwd=REPO, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    sidecar = os.path.join(ck, "pairs", "_lineage.json")
    t0 = time.time()
    try:
        while time.time() - t0 < 900:
            if os.path.exists(sidecar):
                break
            if proc.poll() is not None:
                raise SystemExit("job exited before pairs sidecar appeared")
            time.sleep(0.25)
        else:
            raise SystemExit("timed out waiting for pairs sidecar")
    finally:
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
    proc.wait()
    return round(time.time() - t0, 2)


def main() -> None:
    work = tempfile.mkdtemp(prefix="submit_smoke_")
    zpath = build_zip(work)
    inp = ensure_corpus(work)

    # Run A: uninterrupted cold run (fresh warehouse + checkpoint dirs).
    wh_a, ck_a = os.path.join(work, "wh_a"), os.path.join(work, "ck_a")
    t0 = time.time()
    summary_a = run_full(submit_cmd(zpath, inp, wh_a, ck_a))
    wall_a = round(time.time() - t0, 2)

    # Run B: killed after the pairs stage checkpoint, then resumed.
    wh_b, ck_b = os.path.join(work, "wh_b"), os.path.join(work, "ck_b")
    kill_after = run_killed_after_pairs(submit_cmd(zpath, inp, wh_b, ck_b), ck_b)
    t0 = time.time()
    summary_b = run_full(submit_cmd(zpath, inp, wh_b, ck_b))
    wall_resume = round(time.time() - t0, 2)

    checks = {
        "resumed_stages": summary_b.get("resumed_stages"),
        "resume_skipped_docs_and_pairs": summary_b.get("resumed_stages")
        == ["docs", "pairs"],
        "counts_match_uninterrupted": all(
            summary_a[k] == summary_b[k] for k in ("docs", "pairs", "clusters")
        ),
    }
    record = {
        "what": "REAL spark-submit --py-files deploy + kill-after-pairs resume",
        "master": MASTER,
        "rows": N_ROWS,
        "zip_bytes": os.path.getsize(zpath),
        "run_a_uninterrupted": {**summary_a, "submit_wall_sec": wall_a},
        "run_b_killed_after_sec": kill_after,
        "run_b_resumed": {**summary_b, "submit_wall_sec": wall_resume},
        "checks": checks,
    }
    with open(os.path.join(REPO, "BENCH", "spark_submit_smoke.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record, indent=1))
    if not all(checks[k] for k in
               ("resume_skipped_docs_and_pairs", "counts_match_uninterrupted")):
        raise SystemExit("resume checks FAILED")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
