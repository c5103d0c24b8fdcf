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

    groupBy(term, shard) + applyInPandas: each group is one
    doc-contiguous run of one term; the codec UDF emits one row with
    delta-gap varint blocks and per-block max-score skip metadata.
    """
    shard_range = max(1, math.ceil(n_docs / num_shards))
    t = tf_dl.withColumn("shard", shard_of(F.col("doc_id"), shard_range))

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        term = pdf["term"].iloc[0]
        shard = int(pdf["shard"].iloc[0])
        docs = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        blocks, mx = codec.encode_postings(
            docs, tfs, dls, avgdl, block_size
        )
        return pd.DataFrame(
            {
                "term": [term],
                "shard": [shard],
                "df": [len(docs)],
                "cf": [int(tfs.sum())],
                "max_score": [mx],
                "blocks": [blocks],
            }
        )

    return t.groupBy("term", "shard").applyInPandas(
        encode, schema=POSTINGS_SCHEMA
    )


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
