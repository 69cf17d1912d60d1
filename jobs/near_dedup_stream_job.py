"""spark-submit entry point for the streaming near-dedup surface.

The streaming counterpart of jobs/dedup_job.py: watches a crawl landing
directory and continuously emits verified SimHash near-dup pairs
(streaming/near_dedup_stream.py) to a parquet sink, exactly once, with state
bounded by the event-time horizon. Restart-safe: state lives in the
streaming checkpoint (pinned by tests/test_streaming_near_dedup.py).

Cluster deploy:

    zip -r iad_spark.zip intraarchivededuplicator_spark
    spark-submit --py-files iad_spark.zip jobs/near_dedup_stream_job.py \
        --input  /data/landing          \
        --output /data/near_pairs       \
        --checkpoint-dir /data/near_ck  \
        --watermark "24 hours"

Local smoke / drain-and-exit:

    python jobs/near_dedup_stream_job.py --input /tmp/landing \
        --output /tmp/pairs --checkpoint-dir /tmp/ck \
        --available-now --master 'local[4]' --no-extract
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="crawl landing directory (parquet drops)")
    p.add_argument("--output", required=True, help="pair sink directory (parquet)")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--no-extract", action="store_true", help="input already has text")
    p.add_argument("--radius", type=int, default=4)
    p.add_argument("--watermark", default="24 hours", help="event-time lateness bound")
    p.add_argument(
        "--horizon", default=None,
        help="pair horizon (default: the watermark delay) — pages farther "
        "apart in event time never pair; this is what bounds state",
    )
    p.add_argument("--hot-cap", type=int, default=4096)
    p.add_argument("--max-files-per-trigger", type=int, default=64)
    p.add_argument(
        "--available-now", action="store_true",
        help="drain everything currently in the landing dir, then exit "
        "(backfill mode); default runs continuously",
    )
    p.add_argument("--trigger-seconds", type=int, default=30)
    p.add_argument("--master", default=None, help="override (tests); omit under spark-submit")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from intraarchivededuplicator_spark.streaming.ingest_stream import PAGES_SCHEMA
    from intraarchivededuplicator_spark.streaming.near_dedup_stream import (
        stream_simhash_near_pairs,
    )

    if args.master:
        from intraarchivededuplicator_spark.session import get_spark

        spark = get_spark(app="near-dedup-stream", master=args.master)
    else:
        spark = SparkSession.builder.appName("near-dedup-stream").getOrCreate()

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", args.max_files_per_trigger)
        .parquet(args.input)
    )
    pairs = stream_simhash_near_pairs(
        stream,
        radius=args.radius,
        watermark=args.watermark,
        horizon=args.horizon,
        hot_cap=args.hot_cap,
        extract=not args.no_extract,
    )
    writer = (
        pairs.writeStream.format("parquet")
        .outputMode("append")
        .option("path", args.output)
        .option("checkpointLocation", args.checkpoint_dir)
    )
    if args.available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.trigger(processingTime=f"{args.trigger_seconds} seconds").start()
        q.awaitTermination()


if __name__ == "__main__":
    # plain `python jobs/near_dedup_stream_job.py` (local smoke): make the
    # package importable without --py-files
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
