"""Streaming sessionization: multi-batch equivalence to the batch window
twin, state carry across micro-batches, output-neutrality of state expiry.

Same differential discipline as test_streaming_exact_dedup: the stateful
operator must equal the set-oriented batch definition
(streaming/sessionize_stream.sessionize_batch) on the same events replayed
in event-time order — including sessions that SPAN micro-batch boundaries
(the state carry is the thing a per-batch window cannot do).
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from intraarchivededuplicator_spark.streaming.sessionize_stream import (
    sessionize_batch,
    stream_sessionize,
)

GAP_MIN = 30
T0 = 1_700_000_000

EV_SCHEMA = "user_id long, event_id long, ts timestamp"


def _events(rows):
    """rows: (user_id, event_id, minutes) -> schema'd tuples."""
    return [
        (u, e, dt.datetime.utcfromtimestamp(T0 + m * 60)) for u, e, m in rows
    ]


def _write_batches(spark, tmp_path, batches):
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for i, rows in enumerate(batches):
        part = str(tmp_path / f"b{i}")
        spark.createDataFrame(rows, schema=EV_SCHEMA).coalesce(1).write.parquet(part)
        for f in os.listdir(part):
            if f.endswith(".parquet"):
                dst = os.path.join(landing, f"batch{i}.parquet")
                os.rename(os.path.join(part, f), dst)
                os.utime(dst, (T0 + i, T0 + i))
    return landing


def _run(spark, landing, tmp_path, name, watermark="48 hours"):
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    out = stream_sessionize(stream, gap=f"{GAP_MIN} minutes", watermark=watermark)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).collect()


def test_stream_sessions_match_batch_twin_across_batches(spark, tmp_path):
    """Sessions spanning micro-batch boundaries must carry state: user 1's
    events at 0/20/40 min (each gap <= 30) are ONE session even though a
    batch boundary falls between 20 and 40; the 100-min event (gap 60 > 30)
    starts a new session. User 2 interleaves; user 3 appears only in the
    last batch. Assignment == the batch running-max window on the union."""
    rows = [
        (1, 10, 0), (1, 11, 20), (2, 20, 5),
        (1, 12, 40), (2, 21, 50),
        (1, 13, 100), (2, 22, 70), (3, 30, 90),
    ]
    ordered = sorted(rows, key=lambda r: r[2])
    batches = [
        _events(ordered[:3]),
        _events(ordered[3:5]),
        _events(ordered[5:]),
    ]
    landing = _write_batches(spark, tmp_path, batches)
    got = {
        (r["user_id"], r["event_id"], r["session_start_sec"])
        for r in _run(spark, landing, tmp_path, "sess1")
    }

    ev = spark.createDataFrame(_events(rows), schema=EV_SCHEMA).select(
        "user_id", "event_id", F.col("ts").cast("long").alias("es")
    )
    expect = {
        (r["user_id"], r["event_id"], r["session_start_sec"])
        for r in sessionize_batch(ev, GAP_MIN * 60).collect()
    }
    assert len(got) == len(rows)
    assert got == expect
    # the cross-boundary carry actually happened: u1's 40-min event belongs
    # to the session that STARTED at minute 0 (batch 1), its 100-min event
    # starts a fresh session at minute 100
    by_event = {e: s for _, e, s in got}
    assert by_event[12] == T0
    assert by_event[13] == T0 + 100 * 60
    assert by_event[21] == T0 + 50 * 60  # u2's gap 45 > 30: new session


def test_stream_sessions_expiry_is_output_neutral(spark, tmp_path):
    """A user whose state expires (event-time quiet > gap, watermark passed)
    and then returns must get the SAME assignment the gap rule gives with
    state intact — the start-time key makes expiry output-neutral (the
    module docstring's argument, exercised for real with a 1-minute
    watermark so the key times out between batches)."""
    rows = [(7, 70, 0), (7, 71, 10), (8, 80, 200), (7, 72, 400)]
    batches = [
        _events(rows[:2]),
        _events(rows[2:3]),   # advances watermark far past u7's timeout
        _events(rows[3:]),    # u7 returns after expiry
    ]
    landing = _write_batches(spark, tmp_path, batches)
    got = {
        (r["user_id"], r["event_id"], r["session_start_sec"])
        for r in _run(spark, landing, tmp_path, "sess_to", watermark="1 minutes")
    }
    ev = spark.createDataFrame(_events(rows), schema=EV_SCHEMA).select(
        "user_id", "event_id", F.col("ts").cast("long").alias("es")
    )
    expect = {
        (r["user_id"], r["event_id"], r["session_start_sec"])
        for r in sessionize_batch(ev, GAP_MIN * 60).collect()
    }
    assert got == expect
    assert (7, 72, T0 + 400 * 60) in got  # fresh post-expiry session key
