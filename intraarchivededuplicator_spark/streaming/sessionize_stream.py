"""Streaming gap-based sessionization with bounded per-user state.

The streaming twin of the batch sessionizer (plans/queries.q_user_sessions):
over an unbounded event stream, assign every event its per-user session —
a new session starts when the gap from the user's previous event exceeds
``gap`` (30 min default). The operator emits the ASSIGNMENT
(user_id, event_id, session_start_sec) on every arrival, which makes the
output a pure function of the input with no end-of-stream flush — an
availableNow replay terminates with the complete answer, and the DuckDB
oracle recomputes it as a running-max window over gap-rule start markers.

The emitted session key is the session's START TIME, not a dense per-user
index, and that choice is load-bearing for state expiry: state per user is
TWO longs (last event time, current session start) and the key times out
after ``gap`` of event-time quiet past the watermark. When an expired user
returns, the stateful operator only ever sees rows at-or-after the
watermark (Spark filters later-than-watermark-late rows out of stateful
ops), and at expiry watermark > last_ts + gap — so the returning event's
gap necessarily exceeds ``gap`` and the rule starts a new session whose
start is the event's own time: EXACTLY what the operator emits with no
state. Expiry bounds state and changes nothing about the output. (A dense
session_idx would NOT survive this argument — numbering restarts with
state — which is why the assignment emits the start-time key.)

State size tracks distinct in-horizon users, never stream length. Arrival
order == event-time order per user is assumed (same premise as
exact_dedup_stream's lag rule): micro-batches are sorted internally, so the
contract holds whenever batches arrive in event-time order, which the
replay harness and any log-structured landing zone provide; multi-batch
equivalence is pinned in tests/test_streaming_sessions.py.

Reference parity: the reference engine has no streaming surface; this is
beyond-reference scale surface like the near-dedup stream
(streaming/near_dedup_stream.py), re-using the SAME gap rule the gated
batch query q_user_sessions aggregates.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from .near_dedup_stream import duration_ms

ASSIGN_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("session_start_sec", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_ms", LongType()),
        StructField("cur_start_ms", LongType()),
    ]
)


def _make_session_fn(gap_ms: int):
    """Per-user kernel: vectorized session-start assignment with carry.

    numpy end-to-end — the only Python-level work per (user, micro-batch) is
    the state round-trip; gaps/flags/running-max are C loops over the batch.
    """

    def fn(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # pure state-size bound: any post-watermark return is > gap away
            # in event time, so it starts a new session either way (see the
            # module docstring's expiry-neutrality argument)
            state.remove()
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        # deterministic arrival order regardless of Arrow batch split
        pdf = pdf.sort_values(
            ["ts_ms", "event_id"], kind="stable", ignore_index=True
        )
        ts = pdf["ts_ms"].to_numpy(dtype=np.int64)
        last_ts, cur_start = state.get if state.exists else (None, None)
        prev = np.empty_like(ts)
        prev[1:] = ts[:-1]
        # a synthetic prev exactly gap+1 before the first event avoids int64
        # overflow while forcing the "new session" verdict for unseen users
        prev[0] = last_ts if last_ts is not None else ts[0] - gap_ms - 1
        new_flag = (ts - prev) > gap_ms
        # session start = running max of start markers, seeded by the carry
        marker = np.where(new_flag, ts, np.iinfo(np.int64).min)
        if not new_flag[0]:
            marker[0] = cur_start  # state exists here by construction
        starts = np.maximum.accumulate(marker)
        wm = state.getCurrentWatermarkMs()
        state.update((int(ts[-1]), int(starts[-1])))
        state.setTimeoutTimestamp(max(int(ts[-1]) + gap_ms + 1, wm + 1))
        yield pd.DataFrame(
            {
                "user_id": np.full(len(ts), int(key[0]), dtype=np.int64),
                "event_id": pdf["event_id"].to_numpy(dtype=np.int64),
                "session_start_sec": starts // 1000,
            }
        )

    return fn


def stream_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "24 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, event_id, session_start_sec) per arriving event.

    ``events`` must carry (user_id, event_id, <ts_col> timestamp). The gap
    rule matches q_user_sessions' batch window (strict >, ties broken by
    event_id); session_start_sec is the epoch second of the session's first
    event.
    """
    gap_ms = duration_ms(gap)
    keyed = (
        events.withWatermark(ts_col, watermark)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("event_id").cast("long").alias("event_id"),
            F.col(ts_col).alias("_wm_ts"),
            (F.col(ts_col).cast("double") * 1000).cast("long").alias("ts_ms"),
        )
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(gap_ms),
        outputStructType=ASSIGN_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_batch(
    events: DataFrame,
    gap_sec: int = 1800,
    ts_sec_col: str = "es",
) -> DataFrame:
    """Batch twin (the set-oriented definition): session_start = running max
    of gap-rule start markers per user, in (event time, event_id) order.
    One window over user_id — the same single shuffle q_user_sessions pays;
    the streaming operator must emit exactly these rows."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(ts_sec_col, "event_id")
    prev = F.lag(ts_sec_col).over(w)
    marker = F.when(
        prev.isNull() | (F.col(ts_sec_col) - prev > gap_sec),
        F.col(ts_sec_col),
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.select(
        "user_id",
        "event_id",
        F.max(marker).over(cum).cast("long").alias("session_start_sec"),
    )
