"""Facet (attribute) index: per-(facet, value) doc-id sets stored as
compressed blocks beside the posting shards — the filter-bitset
sidecar (the doc-values / filter-cache idea) that serves
facet-restricted queries without maintaining one posting index per
facet value.

Reference parity: TSE serves one flat ranking (tse/Query.cpp); facet
refinement is the standard engine extension, paired here with the
declarative :func:`tse_spark.operators.textops.facet_counts` /
:func:`tse_spark.operators.index_build.bm25_filtered_topk` twins.

Build shape (100 TB audit): ONE stacked unpivot covers every facet
column in a single scan of the docs relation; one shuffle on
(facet, value, shard) groups doc ids into the SAME doc-range shards as
the posting build (``postings.shard_of`` law), so a filtered query's
allowed set joins posting rows shard-for-shard with no re-shuffle at
serving time.  Each group encodes with the same varint block codec as
postings (tf = dl = 1 filler), and the parquet layout partitions by
(facet, value) so a clicked facet reads exactly one directory —
partition pruning, never a scan of other facets.  Group sizes are
bounded by ``shard_range`` docs, so a facet value covering the whole
corpus still encodes in per-shard pieces, never one giant row.

Staleness: the facet index is derived from the same docs relation as a
build; after ``append_pages`` extend it with
:func:`append_facet_shards` — O(delta) files in the same layout, sound
because appended corpora always get fresh doc ids (disjoint sets), the
same argument as the posting append.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from tse_spark.operators import codec
from tse_spark.operators.postings import shard_of

FACET_SHARD_SCHEMA = (
    "facet string, value string, shard long, df long, blocks binary"
)

# '#' never survives tokenization, so the pseudo-term marking allowed-set
# rows can't collide with a real vocabulary term (same trick as the
# synonym groups' '#g<i>' labels)
ALLOW_TERM = "#allow"


def build_facet_shards(
    docs: DataFrame,
    facets: list[str],
    shard_range: int,
    block_size: int = codec.BLOCK_SIZE,
) -> DataFrame:
    """(doc_id, <facet columns>) -> one row per (facet, value, shard)
    with the shard's matching doc ids varint-block-encoded, sorted
    doc-ascending (the codec law the serving mask relies on)."""
    for f_ in facets:
        if not f_.isidentifier():
            raise ValueError(f"facet must be a column identifier: {f_!r}")
    pairs = ", ".join(f"'{f_}', cast({f_} AS string)" for f_ in facets)
    rows = docs.select(
        "doc_id",
        F.expr(f"stack({len(facets)}, {pairs}) AS (facet, value)"),
    ).withColumn("shard", shard_of(F.col("doc_id"), int(shard_range)))

    def enc(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        d = np.sort(pdf["doc_id"].to_numpy(np.int64))
        ones = np.ones(d.size, dtype=np.int64)
        blocks, _ = codec.encode_postings(d, ones, ones, 1.0, block_size)
        return pd.DataFrame(
            {
                "facet": [key[0]],
                "value": [key[1]],
                "shard": [int(key[2])],
                "df": [int(d.size)],
                "blocks": [blocks],
            }
        )

    return rows.groupBy("facet", "value", "shard").applyInPandas(
        enc, schema=FACET_SHARD_SCHEMA
    )


def write_facet_index(facet_shards: DataFrame, out_dir: str) -> str:
    """Persist the facet sidecar under ``out_dir/facets``, partitioned
    by (facet, value) so one clicked refinement reads one directory."""
    path = os.path.join(out_dir, "facets")
    facet_shards.write.mode("overwrite").partitionBy(
        "facet", "value"
    ).parquet(path)
    return path


def append_facet_shards(
    spark: SparkSession,
    out_dir: str,
    delta_docs: DataFrame,
    facets: list[str],
    shard_range: int | None = None,
) -> str:
    """O(delta) sidecar append: encode ONLY the delta docs' (facet,
    value, shard) sets and add them as new files in the same
    partitioned layout (parquet mode 'append') — existing doc sets are
    never rewritten.  Sound because appended corpora get FRESH doc ids
    above the old max (plans/append.py id law), so delta sets are
    disjoint from every existing row: filtered serving already unions
    multiple allow rows per shard (``search_filtered`` concatenates
    them before the mask) and the sidebar sums disjoint partial counts
    (``facet_counts`` groups over rows) — both multi-row-safe by
    construction.  ``shard_range`` defaults to the index meta's value
    so delta shards follow the base's doc-range law."""
    if shard_range is None:
        import json

        with open(os.path.join(out_dir, "meta.json")) as f:
            shard_range = int(json.load(f)["shard_range"])
    fdf = build_facet_shards(delta_docs, facets, int(shard_range))
    path = os.path.join(out_dir, "facets")
    fdf.write.mode("append").partitionBy("facet", "value").parquet(path)
    return path


def load_facet_index(spark: SparkSession, out_dir: str) -> DataFrame:
    """The whole sidecar (facet, value, shard, df, blocks) — for the
    sidebar count across every facet; a single clicked refinement
    should use :func:`load_facet_rows` (partition-pruned)."""
    return spark.read.parquet(os.path.join(out_dir, "facets"))


def load_facet_rows(
    spark: SparkSession, out_dir: str, facet: str, value: str
) -> DataFrame:
    """Partition-pruned read of one (facet, value) doc-set: the scan
    touches only that directory (PartitionFilters in the plan)."""
    return (
        spark.read.parquet(os.path.join(out_dir, "facets"))
        .filter((F.col("facet") == facet) & (F.col("value") == value))
        .select("shard", "df", "blocks")
    )
