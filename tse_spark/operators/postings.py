"""Salted (doc-range-sharded) compressed posting build.

North_rule topology: salted repartition-by-term -> vectorized codec UDF
-> posting shards.  The salt is the *doc-id range shard*
(``shard = doc_id div shard_range``), which

- spreads a hot term ("的" at web scale) across all shards — the skew
  fix called out in SURVEY.md §4;
- keeps each (term, shard) run doc-id-contiguous and disjoint, so
  shard-level results compose by concatenation (sorted-merge combine is
  a header-preserving concat, no re-encode);
- makes query serving embarrassingly parallel: WAND per shard over
  disjoint doc ranges, then a global top-k.

Output tables:
  postings(term, shard, df, cf, max_score, blocks binary)
  term_stats(term, df)        — global df for idf
  corpus meta (n_docs, avgdl) — JSON, written by the pipeline
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from tse_spark.operators import codec

POSTINGS_SCHEMA = (
    "term string, shard long, df long, cf long, "
    "max_score double, blocks binary"
)


def with_doclen(tf: DataFrame) -> DataFrame:
    """Attach dl (sum of tf per doc) to each (doc_id, term, tf) row via a
    doc-partitioned window — one shuffle on doc_id, no separate join."""
    w = Window.partitionBy("doc_id")
    return tf.withColumn("dl", F.sum("tf").over(w))


def shard_of(doc_id_col, shard_range: int):
    return (doc_id_col / F.lit(shard_range)).cast("long")


def build_posting_shards(
    tf_dl: DataFrame,
    n_docs: int,
    avgdl: float,
    num_shards: int = 32,
    block_size: int = codec.BLOCK_SIZE,
) -> DataFrame:
    """(doc_id, term, tf, dl) -> compressed posting shards.

    Repartition by (term, shard) + sortWithinPartitions + a streaming
    mapInPandas encoder: each (term, shard) run is doc-id-contiguous and
    becomes one output row of delta-gap varint blocks with per-block
    max-score skip metadata.  mapInPandas (not applyInPandas) because a
    web-scale vocabulary yields millions of tiny groups and applyInPandas
    pays per-group pandas overhead; the streaming encoder amortizes it
    across a whole Arrow batch.
    """
    shard_range = max(1, math.ceil(n_docs / num_shards))
    t = tf_dl.withColumn("shard", shard_of(F.col("doc_id"), shard_range))

    def encode_groups(pdf: pd.DataFrame) -> pd.DataFrame:
        """Encode every complete (term, shard) run inside one sorted
        frame; one output row per run, one DataFrame per call."""
        terms = pdf["term"].to_numpy(dtype=object)
        shards = pdf["shard"].to_numpy(dtype=np.int64)
        docs = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        change = np.flatnonzero(
            (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])
        )
        bounds = np.concatenate(([0], change + 1, [len(pdf)]))
        out: dict[str, list] = {
            "term": [], "shard": [], "df": [], "cf": [],
            "max_score": [], "blocks": [],
        }
        for a, b in zip(bounds[:-1], bounds[1:]):
            blocks, mx = codec.encode_postings(
                docs[a:b], tfs[a:b], dls[a:b], avgdl, block_size
            )
            out["term"].append(terms[a])
            out["shard"].append(int(shards[a]))
            out["df"].append(b - a)
            out["cf"].append(int(tfs[a:b].sum()))
            out["max_score"].append(mx)
            out["blocks"].append(blocks)
        return pd.DataFrame(out)

    def encode_stream(it):
        """Stream Arrow batches of one sorted partition; a (term, shard)
        run can span batch boundaries, so the trailing (possibly
        incomplete) run is carried into the next batch.  Memory is
        O(batch + largest single run), never O(partition) — the sorted-
        merge-combine shape from the north_star, vectorized."""
        buf: pd.DataFrame | None = None
        for pdf in it:
            if buf is not None and len(buf):
                pdf = pd.concat([buf, pdf], ignore_index=True)
            last_t = pdf["term"].iloc[-1]
            last_s = pdf["shard"].iloc[-1]
            tail = (pdf["term"] == last_t) & (pdf["shard"] == last_s)
            complete = pdf[~tail]
            buf = pdf[tail]
            if len(complete):
                yield encode_groups(complete)
        if buf is not None and len(buf):
            yield encode_groups(buf)

    # hash-partition on (term, shard): a hot term's shards spread across
    # the cluster (the salt), each partition sorted so runs are adjacent
    num_parts = tf_dl.sparkSession.sparkContext.defaultParallelism
    d = t.repartition(num_parts, "term", "shard").sortWithinPartitions(
        "term", "shard", "doc_id"
    )
    return d.mapInPandas(encode_stream, schema=POSTINGS_SCHEMA)


def term_stats(postings: DataFrame) -> DataFrame:
    """Global per-term stats from the shards (df = sum of shard dfs)."""
    return postings.groupBy("term").agg(
        F.sum("df").alias("df"),
        F.sum("cf").alias("cf"),
        F.max("max_score").alias("max_score"),
    )


def compact_postings(postings: DataFrame) -> DataFrame:
    """Optional single-row-per-term compaction: concatenate shard blobs
    in shard order (valid because shards are disjoint ascending doc
    ranges).  JVM-side only — array_sort + aggregate/concat.  Use at
    small scale or for export; at web scale keep shards."""
    return postings.groupBy("term").agg(
        F.sum("df").alias("df"),
        F.sum("cf").alias("cf"),
        F.max("max_score").alias("max_score"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("shard", "blocks"))),
            F.lit(b""),
            lambda acc, x: F.concat(acc, x["blocks"]),
        ).alias("blocks"),
    )
