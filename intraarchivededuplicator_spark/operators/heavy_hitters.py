"""Exact distributed heavy hitters — the hot-hash registry generalized.

The reference keeps a runtime registry of hashes that match suspiciously
often (>500 matches -> a `high_incidence_hashes` row,
/root/reference/dbPhashApi.py:185-191) and observed ~79k items collapsing
onto one degenerate hash (/root/reference/deduplicator/ProcessArchive.py:21-27).
This operator is that idea as a first-class corpus pass: find every k-token
shingle whose corpus doc-frequency reaches `min_df` — boilerplate grams,
template fragments, degenerate content — with EXACT counts, without paying a
full-cardinality shuffle for the long tail.

Algorithm (classic two-pass frequent-items, exact by pigeonhole): if a gram
reaches global count T across P partitions, some partition holds >= ceil(T/P)
of its occurrences. Pass 1 therefore counts grams LOCALLY per partition
(map-only Arrow kernel — no exchange) and keeps those with local count
>= ceil(T/P): a guaranteed superset of the true heavy hitters. Pass 2
computes exact global counts for that small candidate set only (broadcast
semi-join) and applies the real threshold. The tail — at web scale, billions
of df=1 grams that a naive groupBy would shuffle — never leaves its input
partition.

Output is partition-independent even though the candidate SET is not: pass 2
re-counts candidates exactly over the full input, and pass 1's bound
guarantees no true heavy hitter is pruned — which is what makes the operator
hash-gateable against a plain GROUP BY ... HAVING oracle.

At 10^12 docs: P = cluster width (thousands) and T in the thousands, so
ceil(T/P) is small but the df=1 tail (the overwhelming mass) still dies
map-side. The gated query forces P=2 so the prune provably bites under the
driver gate (ceil(3/2)=2 drops the df=1 tail before the exchange).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def frequent_grams(
    occ: DataFrame, min_df: int, local_parts: int | None = None
) -> DataFrame:
    """(doc_id, s) distinct-occurrence rows -> (gram, df_docs) with
    df_docs >= min_df, exact.

    occ must be distinct per (doc_id, s) — shingle_kernel.distinct_shingles'
    contract — so count(*) per gram IS the doc frequency. local_parts
    repartitions pass 1's input to a known width (tests / the gated query);
    None keeps the natural input partitioning and reads the width off the
    plan, which is the production mode.
    """
    keyed = occ.select("doc_id", "s", F.unhex(F.md5("s")).alias("g"))
    if local_parts is not None:
        # partition by DOC, never by gram: a gram's occurrences must be able
        # to span partitions (that's what the pigeonhole bound prices in) —
        # repartitioning by gram would BE the full-cardinality shuffle this
        # operator exists to avoid
        local = keyed.repartition(local_parts, "doc_id").select("g")
        n_parts = local_parts
    else:
        local = keyed.select("g")
        n_parts = max(1, local.rdd.getNumPartitions())
    lb = -(-min_df // n_parts)  # ceil(min_df / n_parts)

    def _local_counts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one Counter per PARTITION (the iterator spans all its batches):
        # the per-partition lower bound only holds over whole partitions
        from collections import Counter

        cnt: Counter = Counter()
        for pdf in batches:
            cnt.update(pdf["g"].tolist())
        yield pd.DataFrame({"g": [g for g, c in cnt.items() if c >= lb]})

    cand = local.mapInPandas(_local_counts, "g binary").distinct()
    return (
        keyed.join(F.broadcast(cand), "g", "left_semi")
        .groupBy("s")
        .agg(F.count("*").alias("df_docs"))
        .filter(F.col("df_docs") >= min_df)
        .select(F.col("s").alias("gram"), "df_docs")
    )
