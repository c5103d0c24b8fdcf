"""Streaming page ingestion: crawl output → incremental index appends.

The reference crawler writes fetched pages to its raw store as it goes
(Tianwang file sink, tse/TianwangFile.cpp:19-58) and the index is
rebuilt offline.  Here the two halves meet online: a Structured
Streaming source of pages feeds :func:`tse_spark.plans.append.
append_pages` per micro-batch via ``foreachBatch``, so the serving
index trails the crawl by one trigger interval instead of one rebuild.

Exactly-once story (the part worth reading twice):

- ``foreachBatch`` may REDELIVER a batch after a failure.  Each batch
  is first staged to a deterministic parquet dir keyed by ``batch_id``
  (overwrite mode — a redelivery rewrites the same bytes), and
  ``append_pages`` is idempotent on top: its url anti-join drops rows
  already in the corpus, and an empty delta is a no-op, so replaying
  any prefix of batches converges to the same index.
- Crash mid-append is covered by append's own contract: meta.json is
  republished atomically LAST, so a torn append leaves the previous
  index fully intact and the stream's checkpoint replays the batch.
- A maintenance op racing the sink (an out-of-band compact/delete)
  makes the batch's commit fail loudly (snapshots.ConcurrentCommit —
  the sink holds no lock across the whole batch); the stream's retry
  re-runs the batch against the new current state and converges, by
  the same replay-idempotence as a crash.

Each append is O(delta); delta dirs accumulate, so every
``compact_every`` batches the sink folds them back into single base
dirs (:func:`tse_spark.plans.compact.compact_index`) — the same
maintenance a long-running ingest needs at any scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# matches the pages fixture / crawl sink layout
PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def read_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a pages parquet directory (the sandbox
    stand-in for the crawler's output queue)."""
    r = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def append_stream(
    pages: DataFrame,
    out_dir: str,
    staging_dir: str,
    checkpoint_dir: str,
    dictionary: frozenset[bytes] = frozenset(),
    compact_every: int = 0,
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Start the ingest sink: every micro-batch of ``pages`` becomes one
    incremental index append at ``out_dir`` (which must hold an index
    built with the SAME ``dictionary`` — append_pages enforces the
    fingerprint).  Returns the ``StreamingQuery``.

    ``compact_every=N`` folds append deltas back into base dirs after
    every N batches (0 = never; run compact_index out of band).
    ``available_now=True`` drains the backlog and stops — the batch-
    parity mode the tests use; pass ``processing_time`` (e.g. "30
    seconds") with ``available_now=False`` for a long-running ingest.
    """
    from tse_spark.operators import facets as fx
    from tse_spark.plans import append as ap
    from tse_spark.plans import compact as co

    spark = pages.sparkSession

    def _one_batch(batch_df: DataFrame, batch_id: int) -> None:
        stage = os.path.join(staging_dir, f"batch_{batch_id:010d}")
        batch_df.write.mode("overwrite").parquet(stage)
        ap.append_pages(spark, out_dir, stage, dictionary=dictionary)
        if compact_every and (batch_id + 1) % compact_every == 0:
            co.compact_index(spark, out_dir, dictionary=dictionary)
        # keep the facet sidecar (if one exists) trailing the index by
        # the same trigger interval — AFTER any compaction, so a
        # re-shard is repaired in the same batch (sync falls through to
        # a rebuild); otherwise O(delta) above its high-water mark,
        # replay-safe (a redelivered batch finds nothing new)
        fx.sync_facet_index(spark, out_dir)

    w = (
        pages.writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    elif processing_time is not None:
        w = w.trigger(processingTime=processing_time)
    return w.start()
