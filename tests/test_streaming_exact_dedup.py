"""Streaming exact dedup: equivalence to the batch lag() twin, horizon
renewal semantics, deterministic survivor choice, NULL-text exclusion.

Same differential discipline as test_streaming_near_dedup: the stateful
operator must equal the set-oriented batch definition
(streaming/exact_dedup_stream.exact_dedup_within_horizon) on the same
corpus replayed in event-time order.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from intraarchivededuplicator_spark.streaming.exact_dedup_stream import (
    exact_dedup_within_horizon,
    stream_exact_dedup,
)
from intraarchivededuplicator_spark.streaming.ingest_stream import PAGES_SCHEMA

from tests.test_streaming_near_dedup import _corpus, _write_batches

HORIZON_MIN = 120  # 2 hours


def _run(spark, landing, tmp_path, name):
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    out = stream_exact_dedup(
        stream, watermark="48 hours", horizon=f"{HORIZON_MIN} minutes", extract=False
    )
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


def test_stream_matches_batch_twin_with_renewal(spark, tmp_path):
    """Survivor set == the batch lag() rule, including the renewal corner:
    copies at 0 / 60 / 150 min (each gap <= horizon, total span > horizon)
    suppress down to ONE survivor because every arrival renews the window,
    while a copy at 400 min (gap 250 > 120) re-emits."""
    rows = _corpus(
        [
            ("a1", 0, "alpha beta gamma"),
            ("a2", 60, "alpha beta gamma"),     # suppressed, renews
            ("b1", 30, "delta epsilon zeta"),
            ("a3", 150, "alpha beta gamma"),    # gap from a2 = 90 <= 120: suppressed
            ("c1", 200, "eta theta iota"),
            ("a4", 400, "alpha beta gamma"),    # gap from a3 = 250 > 120: re-emitted
            ("b2", 410, "delta epsilon zeta"),  # gap 380 > 120: re-emitted
        ]
    )
    # event-time-ordered batches (the rule's arrival-order premise)
    ordered = sorted(rows, key=lambda r: r[1])
    batches = [ordered[:3], ordered[3:5], ordered[5:]]
    landing = _write_batches(spark, tmp_path, batches)
    got = {(r["url"], r["warc_ts"]) for r in _run(spark, landing, tmp_path, "sed1")}

    docs = spark.createDataFrame(rows, schema=PAGES_SCHEMA).select(
        "url", "text", F.col("warc_ts").cast("long").alias("ts_sec")
    )
    expect = {
        (r["id"], dt.datetime.utcfromtimestamp(r["ts_sec"]))
        for r in exact_dedup_within_horizon(
            docs, "url", "text", "ts_sec", HORIZON_MIN * 60
        ).collect()
    }
    assert {u for u, _ in got} == {u for u, _ in expect}
    assert got == expect
    assert {u for u, _ in got} == {
        "http://s/a1", "http://s/b1", "http://s/c1", "http://s/a4", "http://s/b2"
    }


def test_deterministic_survivor_on_ties_and_null_exclusion(spark, tmp_path):
    """Same text at the SAME event time: the lexicographically smaller url
    survives on both engines. NULL-text pages never enter the key space —
    two distinct null pages must not cross-suppress (they are simply absent
    from the dedup output, junk-gate territory)."""
    rows = _corpus(
        [
            ("z2", 0, "same same same"),
            ("z1", 0, "same same same"),
            ("n1", 5, None),
            ("n2", 10, None),
        ]
    )
    landing = _write_batches(spark, tmp_path, [rows])
    got = {r["url"] for r in _run(spark, landing, tmp_path, "sed2")}
    assert got == {"http://s/z1"}

    docs = spark.createDataFrame(rows, schema=PAGES_SCHEMA).select(
        "url", "text", F.col("warc_ts").cast("long").alias("ts_sec")
    )
    batch = {
        r["id"]
        for r in exact_dedup_within_horizon(
            docs, "url", "text", "ts_sec", HORIZON_MIN * 60
        ).collect()
    }
    assert batch == {"http://s/z1"}
