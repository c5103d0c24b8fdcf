#!/usr/bin/env python
"""Cluster entry point: stream crawled pages into a live index.

Watches a pages parquet directory (the crawler's output queue) with
Structured Streaming and turns every micro-batch into one O(delta)
incremental append at --index, folding append deltas back into base
dirs every --compact-every batches.  Redelivered batches are no-ops
(staged deterministic dirs + url anti-join), and a crash mid-append is
invisible to readers (meta.json republished atomically last) — see
tse_spark/streaming/ingest.py.

    python -m zipfile -c /tmp/tse_spark.zip tse_spark
    spark-submit --py-files /tmp/tse_spark.zip scripts/ingest_stream.py \
        --pages /data/crawl_out --index /data/tse_index \
        --checkpoint /data/ingest_ckpt --trigger "30 seconds"

Pass --drain to process the current backlog and exit (availableNow) —
the batch-parity mode; omit it for a long-running ingest.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", required=True, help="pages parquet dir to watch")
    ap.add_argument("--index", required=True, help="existing index dir")
    ap.add_argument(
        "--checkpoint", required=True,
        help="streaming checkpoint dir (reuse across restarts — a "
        "restarted stream re-appends nothing)",
    )
    ap.add_argument(
        "--staging", default=None,
        help="batch staging dir (default: <checkpoint>.staging)",
    )
    ap.add_argument("--dict", default=None, help="dictionary file (GB2312)")
    ap.add_argument(
        "--max-files-per-trigger", type=int, default=None,
        help="bound each micro-batch's file count",
    )
    ap.add_argument(
        "--compact-every", type=int, default=16,
        help="fold append deltas into base dirs every N batches (0=never)",
    )
    ap.add_argument(
        "--trigger", default="30 seconds",
        help="processingTime trigger for the long-running mode",
    )
    ap.add_argument(
        "--drain", action="store_true",
        help="availableNow: process the backlog, then exit",
    )
    args = ap.parse_args(argv)

    from tse_spark.session import tune_runtime
    from tse_spark.streaming import ingest

    spark = tune_runtime(
        SparkSession.builder.appName("tse-ingest").getOrCreate()
    )
    if args.dict:
        with open(args.dict, "rb") as f:
            dictionary = frozenset(
                w.strip() for w in f.read().splitlines() if w.strip()
            )
    else:
        from tse_spark import fixtures

        dictionary = fixtures.mini_dict_bytes()

    pages = ingest.read_pages_stream(
        spark, args.pages, max_files_per_trigger=args.max_files_per_trigger
    )
    q = ingest.append_stream(
        pages,
        args.index,
        staging_dir=args.staging or args.checkpoint.rstrip("/") + ".staging",
        checkpoint_dir=args.checkpoint,
        dictionary=dictionary,
        compact_every=args.compact_every,
        available_now=args.drain,
        processing_time=None if args.drain else args.trigger,
    )
    q.awaitTermination()
    return 0


if __name__ == "__main__":
    sys.exit(main())
