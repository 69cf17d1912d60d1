"""Distributed sequence packing: global token-offset assignment.

Training-data pipelines concatenate the cleaned corpus into one token
stream and chunk it into fixed-length sequences (GPT-style "concat and
chunk"). The per-doc question is: at which global token offset does this
doc start, and therefore which training sequence does it land in? That is
a GLOBAL PREFIX SUM in a deterministic doc order — and the naive Spark
formulation, `sum() OVER (ORDER BY doc_id)` with no PARTITION BY, collapses
the whole corpus into ONE task (Catalyst plans an all-to-one exchange —
the textbook global-window scale trap).

The scalable form here is the classic two-phase scan:

  1. bucket docs by ARITHMETIC id range (doc_id // bucket — deterministic,
     independent of physical partitioning);
  2. one partial-aggregated groupBy computes per-bucket token sums; the
     driver cumsums them into bucket offsets — bounded BY DESIGN at one
     row per bucket (pick bucket size so n_buckets ~ 1e6 at 10^12 docs);
  3. a window partitioned BY BUCKET (parallel, one task per bucket) does
     the within-bucket cumsum, and a broadcast join adds the bucket offset.

Identical output to the global window at any bucket size (pinned by a
differential test); the DuckDB oracle runs the naive global window, so the
driver gate proves the two-phase scan IS the prefix sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

PACK_SEQ_LEN = 2048  # tokens per training sequence
PACK_BUCKET = 64     # doc_ids per scan bucket (gate-scale; ~1e6 ids at 10^12)


def packed_offsets(
    d: DataFrame,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    bucket: int = PACK_BUCKET,
    cap: int = PACK_SEQ_LEN,
) -> DataFrame:
    """(id, n_tokens, ...) -> + (start_offset, seq_id, offset_in_seq).

    start_offset = sum of n_tokens over all ids < id (dense stream order);
    seq_id = start_offset // cap; offset_in_seq = start_offset % cap.
    Docs are assigned to the sequence their first token lands in (real
    pipelines may split a doc across the boundary; the offsets are what
    the splitter consumes either way).
    """
    spark = d.sparkSession
    b = d.withColumn("_bkt", F.floor(F.col(id_col) / bucket).cast("long"))
    bsums = (
        b.groupBy("_bkt").agg(F.sum(tokens_col).alias("_bsum")).collect()
    )
    # driver cumsum over bucket sums — one row per bucket by construction
    acc = 0
    offs = []
    for r in sorted(bsums, key=lambda r: r["_bkt"]):
        offs.append((r["_bkt"], acc))
        acc += r["_bsum"]
    odf = spark.createDataFrame(offs, "_bkt long, _boff long")
    w = (
        Window.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (
        F.col("_boff") + F.sum(tokens_col).over(w) - F.col(tokens_col)
    ).alias("start_offset")
    return (
        b.join(F.broadcast(odf), "_bkt")
        .select(
            *d.columns,
            start,
        )
        .select(
            *d.columns,
            "start_offset",
            F.floor(F.col("start_offset") / cap).cast("long").alias("seq_id"),
            (F.col("start_offset") % cap).alias("offset_in_seq"),
        )
    )


def packed_offsets_global_window(
    d: DataFrame,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    cap: int = PACK_SEQ_LEN,
) -> DataFrame:
    """The naive single-partition-window formulation — kept ONLY as the
    differential twin for tests (its physical plan contains a
    SinglePartition exchange; never use on a real corpus)."""
    w = (
        Window.orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(tokens_col).over(w) - F.col(tokens_col)).alias(
        "start_offset"
    )
    return d.select(*d.columns, start).select(
        *d.columns,
        "start_offset",
        F.floor(F.col("start_offset") / cap).cast("long").alias("seq_id"),
        (F.col("start_offset") % cap).alias("offset_in_seq"),
    )
