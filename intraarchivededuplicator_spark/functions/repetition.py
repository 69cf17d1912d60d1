"""Gopher/MassiveText-style within-doc repetition signals (Rae et al. 2021
§A1.1): per doc, the occurrence share of the most frequent 2-gram and the
share of 3-gram occurrences whose gram repeats.

Arrow-batched mapInPandas kernel — the same kernel discipline as the
signature path (functions/hashing.signatures_batch): the per-doc Counter
loop lives inside an Arrow batch, never row-at-a-time through the UDF
boundary. Measured at sf0.1/local[32]: 0.51 s vs 3.7 s for the best pure-JVM
alternative (an array_sort + run-length F.aggregate fold — higher-order
functions are interpreted, not codegen'd, and Catalyst re-inlines the
tokenize→shingle→sort pipeline once per consumer) and 5.05 s for
explode + double groupBy (which also shuffles corpus × grams_per_doc rows).
This kernel is map-only: zero shuffles at any corpus size.

Tokenization parity: str.split() == split on \\s+ with empties dropped ==
functions.columns.tokens == the oracle's string_split_regex + list_filter.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_2grams", LongType()),
        StructField("top_2gram", LongType()),
        StructField("dup_3gram", LongType()),
        StructField("n_3grams", LongType()),
    ]
)


def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k.name: [] for k in _STATS_SCHEMA.fields}
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            if text is None:
                continue
            toks = text.split()
            if len(toks) < 3:  # no 3-gram: omitted, like the signature queries
                continue
            g2 = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
            g3 = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
            c2, c3 = Counter(g2), Counter(g3)
            out["doc_id"].append(doc_id)
            out["n_2grams"].append(len(g2))
            out["top_2gram"].append(max(c2.values()))
            out["dup_3gram"].append(sum(v for v in c3.values() if v >= 2))
            out["n_3grams"].append(len(g3))
        yield pd.DataFrame(out)


def repetition_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_2grams, top_2gram, dup_3gram, n_3grams) per doc with >= 1
    3-gram; callers derive the fractional signals (kept as exact longs here
    so ratio rounding stays the caller's single point of truth)."""
    d = docs.select(docs[id_col].alias("doc_id"), docs[text_col].alias("text"))
    return d.mapInPandas(_kernel, _STATS_SCHEMA)
