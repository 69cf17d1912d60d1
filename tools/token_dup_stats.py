"""Measure the token-duplication factor that bounds signatures_batch's md5 cost.

VERDICT r4 "What's wrong" #3: the flagship ingest's largest Python cost is
md5-per-distinct-token inside functions/hashing.signatures_batch. The batched
factorize kernel hashes each distinct token ONCE per Arrow batch, so the cost
per token is md5_calls/token = distinct/total. This tool measures that ratio
on the real corpus at typical Arrow batch sizes, plus the kernel's wall time
vs a per-row memo-dict reference — the numbers quoted in BENCH/BASELINE.md.

Usage: python tools/token_dup_stats.py [sf_dir] [batch_size ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from intraarchivededuplicator_spark.functions.hashing import (  # noqa: E402
    MinHashParams,
    tokenize,
    signatures_batch,
)


def memo_reference(texts, k_shingle=5):
    """The r4 per-row kernel's hashing cost model: per-token dict probe,
    md5 on miss (timing reference only — output unused)."""
    memo: dict[str, int] = {}
    total = 0
    for t in texts:
        toks = tokenize(t) if isinstance(t, str) else []
        total += len(toks)
        for tok in toks:
            if tok not in memo:
                memo[tok] = int.from_bytes(
                    hashlib.md5(tok.encode("utf-8")).digest()[:8], "big"
                )
    return total, len(memo)


_PARAMS = MinHashParams.make()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    batch_sizes = [int(x) for x in sys.argv[2:]] or [1_000, 10_000]
    texts = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )["text"].to_pylist()
    print(f"corpus: {sf_dir} ({len(texts)} docs)")
    for bs in batch_sizes:
        tot_tok = tot_uni = 0
        t_new = t_old = 0.0
        for lo in range(0, len(texts), bs):
            chunk = texts[lo : lo + bs]
            t0 = time.perf_counter()
            n_tok, n_uni = memo_reference(chunk)
            t_old += time.perf_counter() - t0
            tot_tok += n_tok
            tot_uni += n_uni
            t0 = time.perf_counter()
            signatures_batch(chunk, 5, _PARAMS)
            t_new += time.perf_counter() - t0
        ratio = tot_uni / max(tot_tok, 1)
        print(
            f"batch={bs}: tokens={tot_tok} distinct-per-batch={tot_uni} "
            f"md5-calls/token={ratio:.4f} (memo hit rate {1 - ratio:.4f}) | "
            f"hash-loop reference {t_old:.2f}s vs full signatures_batch "
            f"{t_new:.2f}s"
        )


if __name__ == "__main__":
    main()
