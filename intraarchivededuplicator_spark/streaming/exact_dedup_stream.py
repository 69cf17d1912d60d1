"""Streaming EXACT dedup with bounded per-hash state.

The streaming twin of the exact-duplicate leg (operators/exact.py, reference
J1/J3 — getByHash / getDuplicateImages, /root/reference/dbApi.py:444-507):
over an unbounded page stream, emit each page whose extracted text has NOT
been seen recently, drop byte-identical copies. This is what
``dropDuplicatesWithinWatermark`` does, with two differences that matter for
a differential gate and a 100 TB crawl:

- **deterministic survivor**: within and across micro-batches the kept copy
  is the (event-time, url)-minimal one, not "whichever partition raced
  first" — so the output has a set-oriented definition both engines can
  compute (the ``lag()`` rule below) and the driver can hash.
- **horizon renewal**: state per hash is ONE entry (last-seen event time).
  Every arrival — emitted or suppressed — renews the suppression window, and
  the key times out after ``horizon`` of event-time quiet. A boilerplate page
  that recurs forever holds exactly one state row forever (and is emitted
  once); a one-off page's state is dropped at watermark + horizon. State size
  tracks the number of DISTINCT in-horizon hashes, never the stream length.

Set-oriented contract (pinned by tests and the DuckDB oracle): a page is
emitted iff it is the first arrival of its hash, or the gap from the
PREVIOUS arrival of the same hash exceeds the horizon — i.e. with
``prev = lag(ts) OVER (PARTITION BY text_hash ORDER BY ts, url)``:
emit iff ``prev IS NULL OR ts - prev > horizon``. (Arrival order ==
event-time order is assumed by the rule; the stateful kernel sorts each
micro-batch and the equivalence holds whenever batches arrive in event-time
order, which the replay harness and any log-structured landing zone provide.)

Pages with NULL extracted text are passed through unexamined upstream
policy's job (junk gate), not dedup's — a NULL hash groups all of them
together, which would wrongly cross-suppress distinct pages, so they are
excluded from the stateful key space entirely.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from .near_dedup_stream import duration_ms

SURVIVORS_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("text_hash", StringType()),
        StructField("warc_ts", TimestampType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("last_ts_ms", LongType())])


def _make_state_fn(horizon_ms: int):
    """Per-text_hash kernel: emit on first-or-stale arrival, renew on all."""

    def fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        # deterministic arrival order regardless of Arrow batch split
        pdf = pdf.sort_values(["ts_ms", "url"], kind="stable", ignore_index=True)

        last = state.get[0] if state.exists else None
        keep_rows = []
        for row in pdf.itertuples(index=False):
            ts = int(row.ts_ms)
            if last is None or ts - last > horizon_ms:
                keep_rows.append(row)
            last = ts  # every arrival renews the suppression window

        wm = state.getCurrentWatermarkMs()
        state.update((int(last),))
        state.setTimeoutTimestamp(max(int(last) + horizon_ms + 1, wm + 1))

        if keep_rows:
            yield pd.DataFrame(
                {
                    "url": [r.url for r in keep_rows],
                    "text_hash": [str(key[0])] * len(keep_rows),
                    "warc_ts": pd.to_datetime(
                        [int(r.ts_ms) for r in keep_rows], unit="ms"
                    ),
                }
            )

    return fn


def stream_exact_dedup(
    pages: DataFrame,
    watermark: str = "24 hours",
    horizon: str | None = None,
    extract: bool = True,
) -> DataFrame:
    """First-seen-wins exact dedup over an unbounded page stream.

    Emits (url, text_hash, warc_ts) for surviving pages; ``horizon`` defaults
    to the watermark delay (the same bounded-state trade
    ``dropDuplicatesWithinWatermark`` makes). The hash is the SAME exact key
    as the batch leg (md5 of UTF-8 text, operators/exact.with_text_hash), so
    batch and stream agree doc-for-doc — pinned by
    tests/test_streaming_exact_dedup.py against the batch ``lag()`` twin.
    """
    horizon_ms = duration_ms(horizon or watermark)
    if extract:
        from ..functions.textprep import with_extracted_text

        pages = with_extracted_text(pages)
    docs = (
        pages.filter(F.col("text").isNotNull())
        .select(
            "url",
            "warc_ts",
            F.md5(F.encode(F.col("text"), "UTF-8")).alias("text_hash"),
            (F.col("warc_ts").cast("double") * 1000).cast("long").alias("ts_ms"),
        )
        .withWatermark("warc_ts", watermark)
    )
    return docs.groupBy("text_hash").applyInPandasWithState(
        _make_state_fn(horizon_ms),
        outputStructType=SURVIVORS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def exact_dedup_within_horizon(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    ts_sec_col: str,
    horizon_sec: int,
) -> DataFrame:
    """Batch twin (the set-oriented definition): a doc survives iff it is the
    first of its exact hash, or the gap from the previous same-hash doc (by
    event time, ties by id) exceeds the horizon. One window over text_hash —
    the same single shuffle the exact groupBy leg already pays.

    Returns (id, text_hash, ts_sec) for survivors.
    """
    from pyspark.sql.window import Window

    d = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.md5(F.encode(F.col(text_col), "UTF-8")).alias("text_hash"),
        F.col(ts_sec_col).cast("long").alias("ts_sec"),
    )
    w = Window.partitionBy("text_hash").orderBy("ts_sec", "id")
    return (
        d.withColumn("prev_ts", F.lag("ts_sec").over(w))
        .filter(
            F.col("prev_ts").isNull()
            | (F.col("ts_sec") - F.col("prev_ts") > horizon_sec)
        )
        .select("id", "text_hash", "ts_sec")
    )
