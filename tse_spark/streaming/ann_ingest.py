"""Streaming vector ingestion: embedding output → incremental ANN
index appends — the vector twin of :mod:`tse_spark.streaming.ingest`.

A training-data pipeline's embedder emits vectors continuously (new
crawl batches, re-embeddings); similarity serving should trail it by
one trigger interval, not one index rebuild.  A Structured Streaming
source of (vec_id, embedding, ...) rows feeds
:func:`tse_spark.operators.similarity.append_ann_index` per micro-batch
via ``foreachBatch``: the delta is bucketed with the params pinned in
the index meta (identical generations by construction) and becomes
visible only through the atomic meta republish.

Exactly-once story, leaner than the text sink's: no staging dir is
needed because ``append_ann_index`` is idempotent BY ITSELF — its
vec_id anti-join drops rows already in the index and an empty survivor
set is a meta-untouched no-op, so a redelivered batch converges.
Within-batch duplicates collapse via dropDuplicates(vec_id) before the
append (ids are the identity; last write within a batch is arbitrary
but deterministic after the dedup).

``compact_every=N`` folds delta dirs back into one versioned dir every
N batches (operators/similarity.compact_ann_index) — which also folds
any vector tombstones accumulated by ``delete_vectors`` in the
meantime, the same maintenance rhythm as the text index's ingest sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

VECTORS_SCHEMA = "vec_id long, embedding array<float>, label int"


def read_vectors_stream(
    spark: SparkSession,
    path: str,
    schema: str = VECTORS_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over an embeddings parquet directory (the
    sandbox stand-in for the embedder's output queue)."""
    r = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def ann_append_stream(
    vectors: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    compact_every: int = 0,
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Start the ANN ingest sink: every micro-batch becomes one
    incremental index append at ``index_dir`` (which must hold an ANN
    index built by one of the ``build_*_table`` functions — the append
    buckets with ITS pinned params).  Returns the ``StreamingQuery``.

    ``available_now=True`` drains the backlog and stops (the
    batch-parity mode the tests use); pass ``processing_time`` with
    ``available_now=False`` for a long-running ingest."""
    from tse_spark.operators import similarity as sim

    spark = vectors.sparkSession

    def _one_batch(batch_df: DataFrame, batch_id: int) -> None:
        sim.append_ann_index(
            spark, index_dir, batch_df.dropDuplicates(["vec_id"])
        )
        if compact_every and (batch_id + 1) % compact_every == 0:
            sim.compact_ann_index(spark, index_dir)

    w = (
        vectors.writeStream.foreachBatch(_one_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    elif processing_time is not None:
        w = w.trigger(processingTime=processing_time)
    return w.start()
