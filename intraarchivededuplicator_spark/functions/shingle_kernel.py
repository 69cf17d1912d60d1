"""Arrow-batched distinct-shingle explode kernel.

Produces the (doc_id, shingle) stream — one row per DISTINCT k-token
shingle per document — without the interpreted higher-order-function
pipeline (columns.tokens -> columns.token_shingles -> array_distinct ->
explode). HOFs are not whole-stage-codegen'd and Catalyst re-inlines the
tokenize->shingle chain once per consumer, which made the corpus-side
shingle explode the dominant cost of contamination_overlap (measured at
sf0.1/local[32]: 3.9 s of the query's ~6 s warm wall; the kernel form of
the same stream is ~6x cheaper — same discipline and ratio as
functions/repetition.py, 0.51 s vs 3.7 s).

Parity contract: hashing.tokenize (split on \\s+ runs, drop empties) and
hashing.shingles (k tokens joined by one space) are the documented Python
twins of columns.tokens / columns.token_shingles AND of the DuckDB oracle's
string_split_regex + list_filter chain — the driver gate compares this
kernel's output against that SQL directly, and
tests/test_pipeline_filters.py pins kernel == HOF row-for-row.

Map-only: zero shuffles at any corpus size. Upstream filters do NOT push
through mapInPandas — filter the input DataFrame (e.g. the probe subset)
BEFORE calling distinct_shingles.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

from .hashing import shingles, tokenize

_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("s", StringType())]
)


def distinct_shingles(
    df: DataFrame, k: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, text_col) frame -> exploded (doc_id, s) distinct-shingle rows.

    Docs with fewer than k tokens (or null text) contribute no rows — the
    same convention as explode over token_shingles (empty array dropped).
    """

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            ss: list[str] = []
            for doc_id, text in zip(pdf[id_col].values, pdf[text_col].values):
                if text is None:
                    continue
                seen: set[str] = set()
                for s in shingles(tokenize(text), k):
                    if s not in seen:
                        seen.add(s)
                        ids.append(doc_id)
                        ss.append(s)
            yield pd.DataFrame(
                {"doc_id": pd.array(ids, dtype="int64"), "s": ss}
            )

    return df.select(
        df[id_col].alias(id_col), df[text_col].alias(text_col)
    ).mapInPandas(_kernel, _SCHEMA)


_POS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("pos", LongType()),
        StructField("s", StringType()),
    ]
)


def positional_shingles(
    df: DataFrame, k: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, text_col) frame -> (doc_id, pos, s) rows, one per k-token
    shingle IN ORDER, pos 1-based (matching the oracle's
    ``generate_series(1, len(tl) - k + 1)``).

    The positional twin of distinct_shingles — same tokenize/shingle parity
    contract, no per-doc dedup (span detection needs every occurrence at its
    position). Docs with fewer than k tokens contribute no rows. Map-only."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            ps: list[int] = []
            ss: list[str] = []
            for doc_id, text in zip(pdf[id_col].values, pdf[text_col].values):
                if text is None:
                    continue
                for i, s in enumerate(shingles(tokenize(text), k), start=1):
                    ids.append(doc_id)
                    ps.append(i)
                    ss.append(s)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "pos": pd.array(ps, dtype="int64"),
                    "s": ss,
                }
            )

    return df.select(
        df[id_col].alias(id_col), df[text_col].alias(text_col)
    ).mapInPandas(_kernel, _POS_SCHEMA)


_TOK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("tpos", LongType()),
        StructField("tok", StringType()),
    ]
)


def positional_tokens(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id_col, text_col) frame -> (doc_id, tpos, tok) rows, tpos 1-based.

    The token-stream twin of positional_shingles — SAME hashing.tokenize,
    so token positions and gram positions are guaranteed aligned (a gram at
    pos p covers tokens p..p+k-1). Consumers that mix gram positions with a
    token stream MUST source both from these kernels: a JVM-side split has
    a different whitespace class (Java \\s is ASCII-only vs Python \\s
    Unicode), and a one-token skew silently cuts the wrong span. Docs with
    zero tokens (or null text) contribute no rows. Map-only."""

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            ps: list[int] = []
            ts: list[str] = []
            for doc_id, text in zip(pdf[id_col].values, pdf[text_col].values):
                if text is None:
                    continue
                for i, t in enumerate(tokenize(text), start=1):
                    ids.append(doc_id)
                    ps.append(i)
                    ts.append(t)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "tpos": pd.array(ps, dtype="int64"),
                    "tok": ts,
                }
            )

    return df.select(
        df[id_col].alias(id_col), df[text_col].alias(text_col)
    ).mapInPandas(_kernel, _TOK_SCHEMA)
