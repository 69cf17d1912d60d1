"""Content-defined chunking (CDC) — storage-style sub-document dedup.

The reference deduplicates whole archive members by content hash
(/root/reference/scanner/fileHasher.py:189-239 hashes each member's bytes);
CDC is the storage-dedup generalization every backup/archive engine applies
below file granularity: cut each payload at positions where a rolling
content hash satisfies a predicate, so INSERTIONS only reshuffle chunk
boundaries locally and shared runs between near-identical payloads dedup
chunk-by-chunk.

Boundary rule here: position p (1-based, p >= CDC_W) ends a chunk iff
hash32(text[p-W+1 .. p]) % CDC_MOD == 0, where hash32 is the engine-wide
md5-prefix hash (functions/hashing.shingle_hash32's arithmetic — the DuckDB
oracle recomputes it as ('0x' || substr(md5(window),1,8))::BIGINT). The
predicate is per-position INDEPENDENT (no min/max-length clamp), which keeps
it embarrassingly parallel and SQL-expressible; production CDC adds min/max
clamps, which makes the recurrence sequential per doc — still map-only, just
not oracle-able.

Map-only Arrow kernel: zero shuffles at any corpus size. Cost is one md5
per character position per doc (memoized per batch on the window string —
web text repeats windows heavily inside boilerplate), the same Python-cost
shape as the signature kernel before factorization; swap a real rolling
hash (Rabin-Karp / buzhash) for the md5 window when throughput matters more
than oracle parity.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

CDC_W = 8     # rolling-window width (chars)
CDC_MOD = 16  # boundary when hash32(window) % MOD == 0 -> avg chunk ~MOD

_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("chunk_hash", BinaryType()),
        StructField("chunk_len", LongType()),
    ]
)


def chunk_bounds(text: str, w: int = CDC_W, mod: int = CDC_MOD,
                 memo: dict | None = None) -> list[int]:
    """Chunk END positions (1-based, inclusive); always ends at len(text).

    Pure function of the text — the DuckDB twin is the bnd/ends CTE in
    plans/oracle.sql_cdc_chunk_stats.
    """
    n = len(text)
    if n == 0:
        return []
    if memo is None:
        memo = {}
    ends = []
    for p in range(w, n + 1):
        win = text[p - w : p]
        h = memo.get(win)
        if h is None:
            h = int(hashlib.md5(win.encode("utf-8")).hexdigest()[:8], 16)
            memo[win] = h
        if h % mod == 0:
            ends.append(p)
    if not ends or ends[-1] != n:
        ends.append(n)
    return ends


def cdc_chunks(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text) -> (doc_id, chunk_idx, chunk_hash md5-16B, chunk_len).

    Empty/null text emits no rows (the signature-query convention).
    """

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            memo: dict[str, int] = {}
            ids: list[int] = []
            idxs: list[int] = []
            hs: list[bytes] = []
            lens: list[int] = []
            for doc_id, text in zip(pdf[id_col].values, pdf[text_col].values):
                if text is None:
                    continue
                prev = 0
                for i, e in enumerate(chunk_bounds(text, memo=memo)):
                    chunk = text[prev:e]
                    ids.append(doc_id)
                    idxs.append(i)
                    hs.append(hashlib.md5(chunk.encode("utf-8")).digest())
                    lens.append(e - prev)
                    prev = e
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "chunk_idx": pd.array(idxs, dtype="int32"),
                    "chunk_hash": hs,
                    "chunk_len": pd.array(lens, dtype="int64"),
                }
            )

    return df.select(
        df[id_col].alias(id_col), df[text_col].alias(text_col)
    ).mapInPandas(_kernel, _SCHEMA)
