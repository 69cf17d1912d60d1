"""Bloom-filter membership dedup for incremental crawl ingest.

The incremental-ingest problem (reference: the re-scan skip in
scanner/fileHasher.py — skip work for content already in the DB) at
100 TB: a new crawl batch must not shuffle-join against the full 10^12-doc
corpus just to ask "have I seen this exact text before?". The sketch path:

  1. BUILD (once per corpus snapshot): every ingested doc's text hash sets
     BLOOM_K bit positions in an m-bit array. The distributed part is one
     partial-aggregated explode→distinct over positions; the driver then
     materializes the bit array — bounded at m/8 bytes BY DESIGN (the whole
     point of a Bloom filter is that its size is chosen up front, not data-
     dependent; at 10^12 keys you'd pick m ~ 2^43 sharded, see below).
  2. PROBE (per batch): a map-only Arrow-batched UDF tests the broadcast
     bit array — zero shuffles against the corpus.
  3. VERIFY: only bloom-POSITIVE rows pay the exact hash join (no false
     negatives, so bloom-negative rows are provably new).

All hash arithmetic is engine-neutral (md5 hex → two 32-bit halves →
double hashing h1 + i·h2', h2' forced odd), so the DuckDB oracle recomputes
membership exactly as a set-semijoin over the same positions — the
differential pins the UDF's numpy bit math against an independent
formulation.

Scale note: at 10^12 keys a single driver array would be ~1 TiB; the
production variant shards the array by pos >> SHARD_BITS and probes with a
mapInPandas over batch×shard cogroups, or simply keys the corpus bloom
build by (shard, word) and broadcast-joins the ~per-shard arrays. The
operator's contract (positions, probe semantics) is identical; only the
carrier changes. At the tested scales (m = 2^20, 128 KiB) the broadcast
carrier is the right plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType

BLOOM_M = 1 << 20  # bits in the filter
BLOOM_K = 4        # probes per key


def _h1_h2p(hash_col):
    """md5-hex column -> (h1, h2') for double hashing; h2' forced odd so the
    probe sequence cycles through all of a power-of-two m."""
    h1 = F.conv(F.substring(hash_col, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(hash_col, 9, 8), 16, 10).cast("long")
    return h1, h2 - h2 % 2 + 1


def bloom_positions_col(hash_col, m: int = BLOOM_M, k: int = BLOOM_K):
    """array<long> of the k bit positions a hash sets/tests."""
    h1, h2p = _h1_h2p(hash_col)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: (h1 + i.cast("long") * h2p) % m,
    )


def build_bloom_bits(
    hashes: DataFrame, hash_col: str = "text_hash",
    m: int = BLOOM_M, k: int = BLOOM_K,
) -> np.ndarray:
    """Distributed corpus pass -> packed bit array (np.packbits, MSB-first).

    One explode + partial-aggregated distinct on positions; the driver
    pull is <= min(m, k * n_keys) longs — bounded by m by construction."""
    pos = (
        hashes.select(F.col(hash_col).alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
        .select(F.explode(bloom_positions_col(F.col("h"), m, k)).alias("pos"))
        .distinct()
    )
    arr = np.zeros(m, dtype=bool)
    idx = pos.toPandas()["pos"].to_numpy(dtype=np.int64)
    arr[idx] = True
    return np.packbits(arr)


def make_might_contain_udf(bits: np.ndarray, m: int = BLOOM_M, k: int = BLOOM_K):
    """md5-hex -> boolean might-contain over the captured bit array.

    The array rides to executors inside the serialized UDF closure
    (m/8 bytes); the probe is vectorized numpy per Arrow batch — no
    per-row Python, no shuffle."""

    @F.pandas_udf(BooleanType())
    def might_contain(hashes: pd.Series) -> pd.Series:
        n = len(hashes)
        res = np.zeros(n, dtype=bool)
        ok = hashes.notna().to_numpy()
        if ok.any():
            hs = hashes[ok]
            h1 = np.fromiter((int(h[:8], 16) for h in hs), np.int64, len(hs))
            h2 = np.fromiter((int(h[8:16], 16) for h in hs), np.int64, len(hs))
            h2 = h2 - h2 % 2 + 1
            hit = np.ones(len(hs), dtype=bool)
            for i in range(k):
                p = (h1 + i * h2) % m
                hit &= ((bits[p >> 3] >> (7 - (p & 7))) & 1).astype(bool)
            res[ok] = hit
        return pd.Series(res)

    return might_contain


def bloom_incremental_dedup(
    corpus_hashes: DataFrame, batch: DataFrame,
    hash_col: str = "text_hash", m: int = BLOOM_M, k: int = BLOOM_K,
) -> DataFrame:
    """batch (.., text_hash) -> (.., bloom_positive, is_dup).

    bloom_positive: the sketch says "maybe seen" (no false negatives).
    is_dup: bloom_positive AND the exact hash is in the corpus — the
    verify join runs ONLY over bloom-positive rows; negatives bypass it
    entirely (that asymmetry is the operator's reason to exist)."""
    bits = build_bloom_bits(corpus_hashes, hash_col, m, k)
    mc = make_might_contain_udf(bits, m, k)
    probed = batch.withColumn("bloom_positive", mc(F.col(hash_col)))
    exact = (
        corpus_hashes.select(F.col(hash_col))
        .distinct()
        .withColumn("_in_corpus", F.lit(True))
    )
    pos_rows = probed.filter(F.col("bloom_positive")).join(
        exact, hash_col, "left"
    ).withColumn("is_dup", F.coalesce(F.col("_in_corpus"), F.lit(False)))
    neg_rows = probed.filter(~F.col("bloom_positive")).withColumn(
        "is_dup", F.lit(False)
    ).withColumn("_in_corpus", F.lit(None).cast("boolean"))
    return pos_rows.unionByName(neg_rows).drop("_in_corpus")
