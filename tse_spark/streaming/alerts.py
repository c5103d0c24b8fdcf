"""Streaming alerts: percolate each crawl micro-batch against the
standing-query table (operators/percolate.py) and append the matches
to an alerts log — the Google-Alerts / saved-search notification loop
riding the same Structured Streaming source as the index ingest sink
(streaming/ingest.py), one trigger interval behind the crawl.

Exactly-once story (simpler than the ingest sink's, because alerts are
PURE OUTPUT — no shared mutable index state): every micro-batch's
matches land in a deterministic dir keyed by ``batch_id`` (overwrite
mode), so a redelivered batch rewrites the same bytes and the log
never duplicates; readers glob the batch dirs.  No commit protocol is
needed — a torn write is invisible to `read_alerts` only until the
stream's checkpoint replays the batch, after which the dir is whole.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from tse_spark.operators import percolate as pc


def percolate_stream(
    pages: DataFrame,
    queries: DataFrame,
    alerts_dir: str,
    checkpoint_dir: str,
    conjunctive: bool = True,
    tokenizer: str = "ws",
    dictionary: frozenset[bytes] = frozenset(),
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Start the alerts sink over a pages stream (streaming/ingest.py's
    source schema: url is the document identity).  ``queries`` is the
    static standing-query table (query_id, text) — it broadcasts into
    every micro-batch's single tokenize pass.  Returns the
    ``StreamingQuery``."""

    def _one_batch(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.select(F.col("url").alias("doc_id"), "text")
        m = pc.percolate(
            docs, queries, conjunctive=conjunctive,
            tokenizer=tokenizer, dictionary=dictionary,
        )
        out = m.select(
            "query_id",
            F.col("doc_id").alias("url"),
            "n_matched",
            "tf",
        )
        out.write.mode("overwrite").parquet(
            os.path.join(alerts_dir, f"batch_{batch_id:010d}")
        )

    w = (
        pages.writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    elif processing_time is not None:
        w = w.trigger(processingTime=processing_time)
    return w.start()


def read_alerts(spark: SparkSession, alerts_dir: str) -> DataFrame:
    """The alerts log emitted so far: (query_id, url, n_matched, tf)."""
    return spark.read.parquet(os.path.join(alerts_dir, "batch_*"))
