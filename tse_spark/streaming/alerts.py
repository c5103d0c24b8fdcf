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
import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from tse_spark.operators import percolate as pc


def latest_per_url(pages: DataFrame) -> DataFrame:
    """One row per url: newest ``warc_ts``, content md5 breaking exact
    ties — the SAME reduce the ingest side commits through
    (plans/append.upsert_pages), so what the alerts sink evaluates is
    what the index would serve.  Without it, two versions of a url in
    one micro-batch would pool their tokens and a conjunctive query
    could fire on a merged document no actual page version is."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").desc(), F.md5(F.col("text")).asc()
    )
    return (
        pages.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _load_seen(spark: SparkSession, alerts_dir: str, batch_id: int):
    """The suppression state batch ``batch_id`` starts from: exactly
    ``seen/batch_{batch_id-1}`` when it exists; otherwise the NEWEST
    retained state below ``batch_id`` (covers suppression enabled
    mid-checkpoint — earlier batches wrote no state); otherwise empty.
    The "newest below B" rule is replay-stable: batch B never writes a
    dir numbered below B, so its own redelivery always resolves to the
    same prior state."""
    seen_root = os.path.join(alerts_dir, "seen")
    best = None
    if os.path.isdir(seen_root):
        for name in os.listdir(seen_root):
            m = re.fullmatch(r"batch_(\d{10})", name)
            if m and int(m.group(1)) < batch_id:
                if best is None or int(m.group(1)) > best:
                    best = int(m.group(1))
    if best is not None:
        return spark.read.parquet(
            os.path.join(seen_root, f"batch_{best:010d}")
        )
    return spark.createDataFrame(
        [], "query_id long, url string, fp string"
    )


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
    every micro-batch's single tokenize pass.  Each micro-batch is
    first reduced to its newest row per url (:func:`latest_per_url` —
    the ingest side's own reconciliation law).  Returns the
    ``StreamingQuery``.

    ``suppress_repeats=True`` adds the notification product's dedup
    law: a (query, url) pair alerts on FIRST sight and again only when
    the page's content fingerprint (text md5) is one it has never
    alerted before — an unchanged re-crawl is suppressed; a page that
    reverts to previously-alerted content is also suppressed (the
    seen-set remembers every alerted version: O(alerted pairs ×
    content versions) rows, one tiny parquet per batch — compact like
    any sidecar if a year of batches matters).  State is a
    deterministic LINEAGE of per-batch dirs (``seen/batch_N`` = state
    after batch N): batch B reads the newest state below B — exactly
    B−1 in steady state — so a redelivered batch reads the same prior
    state and rewrites the same alert bytes; the replay-idempotence
    law survives statefulness.
    """

    def _one_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = latest_per_url(batch_df)
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
            # one row per url after the reduce, so fp is unique per url
            fp = batch_df.select(
                "url", F.md5(F.col("text")).alias("fp")
            )
            seen = _load_seen(spark, alerts_dir, batch_id)
            out = out.join(fp, "url").join(
                seen, ["query_id", "url", "fp"], "left_anti"
            )
            # two consumers below (seen write + alert write): persist
            # so the percolate + anti-join DAG runs once per batch
            out = out.persist()
            # state after THIS batch: previous seen ∪ what we alerted
            # (written before the alert dir — on a torn batch both are
            # replayed together, and each write is deterministic)
            new_seen = seen.unionByName(
                out.select("query_id", "url", "fp")
            ).distinct()
            new_seen.repartition(1).write.mode("overwrite").parquet(
                os.path.join(alerts_dir, "seen", f"batch_{batch_id:010d}")
            )
            out_final = out.drop("fp")
        else:
            out_final = out
        out_final.write.mode("overwrite").parquet(
            os.path.join(alerts_dir, f"batch_{batch_id:010d}")
        )
        if suppress_repeats:
            out.unpersist()

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
