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
    suppress_repeats: bool = False,
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Start the alerts sink over a pages stream (streaming/ingest.py's
    source schema: url is the document identity).  ``queries`` is the
    static standing-query table (query_id, text) — it broadcasts into
    every micro-batch's single tokenize pass.  Returns the
    ``StreamingQuery``.

    ``suppress_repeats=True`` adds the notification product's dedup
    law: a (query, url) pair alerts on FIRST sight and again only when
    the page's CONTENT changed (text md5) — an unchanged re-crawl is
    suppressed.  The seen-set state is a deterministic LINEAGE of
    per-batch dirs (``seen/batch_N`` = state after batch N): batch B
    reads exactly ``seen/batch_{B-1}``, so a redelivered batch reads
    the same prior state and rewrites the same alert bytes — the
    replay-idempotence law survives statefulness.  Seen rows are one
    (query_id, url, fp) triple per ever-alerted pair: O(alert
    history), compact like any sidecar if a year of batches matters.
    """

    def _one_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
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
        if suppress_repeats:
            # one fp per url even if a url repeats in the batch with
            # different content (max md5 — deterministic either way;
            # percolate already pooled the copies' occurrences)
            fp = (
                batch_df.select("url", F.md5(F.col("text")).alias("fp"))
                .groupBy("url")
                .agg(F.max("fp").alias("fp"))
            )
            out = out.join(fp, "url")
            prev = os.path.join(
                alerts_dir, "seen", f"batch_{batch_id - 1:010d}"
            )
            if batch_id > 0 and os.path.exists(prev):
                seen = spark.read.parquet(prev)
            else:
                seen = spark.createDataFrame(
                    [], "query_id long, url string, fp string"
                )
            out = out.join(
                seen, ["query_id", "url", "fp"], "left_anti"
            )
            # state after THIS batch: previous seen ∪ what we alerted
            # (written before the alert dir — on a torn batch both are
            # replayed together, and each write is deterministic)
            new_seen = seen.unionByName(
                out.select("query_id", "url", "fp")
            ).distinct()
            new_seen.repartition(1).write.mode("overwrite").parquet(
                os.path.join(alerts_dir, "seen", f"batch_{batch_id:010d}")
            )
            out = out.drop("fp")
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
