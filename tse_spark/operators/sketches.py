"""Deterministic cardinality / sampling sketches.

Two estimators a 100 TB curation pass reaches for before paying a full
shuffle, both built on the portable md5 hash law the dedup family
already uses (operators/dedup.py module docstring) so a DuckDB oracle
recomputes them bit-for-bit — unlike ``approx_count_distinct`` /
``DataFrame.sample``, whose internals differ per engine and per
partitioning:

- :func:`kmv_distinct` — K-Minimum-Values distinct-count estimation
  (Bar-Yossef et al. 2002): keep the k smallest DISTINCT hash values;
  with hashes uniform on [0, 2^60), ``est = (k-1) * 2^60 / h_k``.
  The estimate depends only on the GLOBAL k smallest distinct hashes,
  so it is partitioning-independent by construction.  Scale shape:
  an Arrow ``mapInPandas`` pre-prune keeps <= k candidate hashes per
  input partition (no shuffle, numpy unique+partition per batch), so
  the global merge sees O(k x partitions) rows instead of the corpus
  — the mergeable-sketch topology, expressed as a pipeline.
- :func:`priority_sample` — Priority Sampling (Duffield, Lund,
  Thorup 2007): weighted sampling WITHOUT replacement with
  Horvitz-Thompson-style weight estimates.  Each row draws
  ``u = (h+1) / 2^60`` from its own md5 (reproducible at any
  parallelism — ``DataFrame.sample`` is not), priority ``q = w / u``,
  sample = top-k by q, and every sampled row's weight estimate is
  ``max(w, tau)`` with ``tau`` = the (k+1)-th priority — an unbiased
  estimator of any subset-sum over the original weights.  All
  arithmetic is single correctly-rounded IEEE divisions of exactly
  representable integers, so Spark and DuckDB produce identical
  doubles; the cut is (q desc, id asc) — total, so the sample is
  unique.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

# 60 bits of the md5 = the largest power-of-two prefix that stays
# exactly representable through BIGINT and DOUBLE in both engines
HASH_BITS = 60
HASH_SPACE = float(1 << HASH_BITS)  # 2^60, exact as a double


def hash60(col: Column) -> Column:
    """The portable 60-bit hash: first 15 md5 hex nibbles as a BIGINT
    (DuckDB twin: ``('0x' || substr(md5(x), 1, 15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _kmv_prune(k: int):
    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: pd.Series | None = None
        for pdf in batches:
            h = pdf["h"] if best is None else pd.concat([best, pdf["h"]])
            u = h.drop_duplicates().nsmallest(k)
            best = u.reset_index(drop=True)
        if best is not None:
            yield pd.DataFrame({"h": best})

    return prune


def kmv_distinct(
    df: DataFrame, col: str = "text", k: int = 128
) -> DataFrame:
    """One-row distinct-cardinality report:
    (k_used, kth_hash, est_distinct, exact_distinct, rel_err).

    ``exact_distinct`` (one countDistinct — the cost the sketch
    avoids at scale) is included so the query doubles as the sketch's
    own accuracy evaluation; production reads only ``est_distinct``.
    If fewer than k distinct values exist the estimate IS the exact
    count (the sketch saw everything)."""
    hashed = df.select(hash60(F.col(col)).alias("h"))
    pruned = hashed.mapInPandas(_kmv_prune(k), schema="h long")
    smallest = pruned.distinct().orderBy("h").limit(k)
    est = F.when(
        F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
    ).otherwise(
        F.floor(
            F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.max("h") + 0.5
        ).cast("double")
    )
    sk = smallest.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("kth_hash"),
        est.alias("est_distinct"),
    )
    exact = df.agg(
        F.countDistinct(F.col(col)).alias("exact_distinct")
    )
    out = sk.crossJoin(exact)
    return out.select(
        "k_used",
        "kth_hash",
        F.col("est_distinct").cast("long").alias("est_distinct"),
        "exact_distinct",
        F.round(
            (F.col("est_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_err"),
    )


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight: Column,
    k: int = 20,
) -> DataFrame:
    """Deterministic weighted sample of k rows + Horvitz-Thompson
    weight estimates: (id, w, est_w) — ``sum(est_w)`` over the sample
    is an unbiased estimate of ``sum(w)`` over the table (the module
    docstring's law).  One TakeOrderedAndProject of (k+1) rows; the
    window runs over those k+1 only."""
    u = (hash60(F.col(id_col).cast("string")) + 1) / F.lit(HASH_SPACE)
    q = weight.cast("double") / u
    top = (
        df.select(
            F.col(id_col).alias("id"),
            weight.cast("double").alias("w"),
            q.alias("q"),
        )
        .orderBy(F.desc("q"), F.asc("id"))
        .limit(k + 1)
    )
    from pyspark.sql import Window

    w_all = Window.orderBy(F.desc("q"), F.asc("id")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = top.select(
        "id",
        "w",
        "q",
        F.count(F.lit(1)).over(w_all).alias("n_top"),
        F.min("q").over(w_all).alias("q_min"),
        F.row_number()
        .over(Window.orderBy(F.desc("q"), F.asc("id")))
        .alias("rn"),
    )
    tau = F.when(F.col("n_top") > k, F.col("q_min")).otherwise(F.lit(0.0))
    return (
        ranked.filter(F.col("rn") <= k)
        .select(
            F.col("id"),
            F.col("w"),
            F.round(F.greatest("w", tau), 4).alias("est_w"),
        )
    )


# ---------------------------------------------------------------------------
# count-min sketch (frequency estimation)
# ---------------------------------------------------------------------------

def _cms_bucket(term: Column, j: int, width: int) -> Column:
    """Row-j bucket: 32-bit portable md5 of 'cms{j}:term' mod width —
    the salted-hash family the mix-sampler already uses, so the DuckDB
    twin is the same substring/cast."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{j}:"), term)), 1, 8), 16, 10
    ).cast("long")
    return h % width


def cms_sketch(
    toks: DataFrame, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch of a (doc_id, term) occurrence stream:
    (row_j, bucket, n) — depth x width cells, every occurrence counted
    into one bucket per row.  The sketch is the streaming-friendly
    frequency table: fixed size regardless of vocabulary, mergeable by
    cell-wise addition (the partial aggregates ARE per-partition
    sketches — Spark's map-side combine implements the merge), and
    estimates are one-sided (never under the true count).

    Scale shape: explode to depth rows per occurrence, one hash-agg
    over depth*width cells; map-side partials absorb everything, the
    exchange carries at most depth*width rows per task."""
    entries = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("row_j"),
                _cms_bucket(F.col("term"), j, width).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return (
        toks.select(F.explode(entries).alias("e"))
        .select("e.row_j", "e.bucket")
        .groupBy("row_j", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimates(
    sketch: DataFrame,
    candidates: DataFrame,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point queries against the sketch: for each candidate term the
    estimate is min over rows of its bucket's count (the CMS law;
    >= the true count always, with overcount bounded by collisions).
    The candidate set is tiny (a top-k list), so it broadcasts into
    the 1024-cell sketch join."""
    probes = candidates.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("int").alias("row_j"),
                        _cms_bucket(F.col("term"), j, width).alias(
                            "bucket"
                        ),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("e"),
    ).select("term", "e.row_j", "e.bucket")
    j = sketch.join(F.broadcast(probes), ["row_j", "bucket"])
    return j.groupBy("term").agg(F.min("n").alias("est_n"))


def _bloom_pos(key: Column, i: int, m_bits: int) -> Column:
    """Hash i's bit position: portable md5 of 'bloom{i}:key' mod m —
    DuckDB twin ``('0x' || substr(md5('bloom{i}:' || key), 1, 15))
    ::BIGINT % m``."""
    return hash60(F.concat(F.lit(f"bloom{i}:"), key)) % F.lit(
        int(m_bits)
    )


def bloom_build(
    df: DataFrame,
    key_col: str = "url",
    m_bits: int = 4096,
    k_hashes: int = 4,
) -> DataFrame:
    """Bloom filter over a key column — the bounded-space URL-seen
    membership structure that replaces the crawl frontier's
    anti-join against the full visited table at 10^12-url scale
    (the reference held setVisitedUrlMD5 in RAM, Crawl.cpp:14-17;
    a bloom is its constant-memory heir).

    The filter is (word_idx, bits) rows — m_bits/32 of them — built
    by ONE hash-agg: per key, k portable-md5 bit positions explode
    map-side, bit_or folds masks into 32-bit words (partial
    aggregation absorbs the fan-out, merge = bit_or, the mergeable-
    sketch topology CMS uses).  32-bit words keep every mask an
    exactly-representable positive BIGINT in both engines (bit 63
    sign wrap never arises).  Deterministic by construction, so the
    DuckDB oracle rebuilds the identical words."""
    key = F.col(key_col)
    pos = F.explode(
        F.array(
            *[_bloom_pos(key, i, m_bits) for i in range(int(k_hashes))]
        )
    ).alias("pos")
    return (
        df.select(pos)
        .select(
            (F.col("pos") / 32).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pos % 32 AS int))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_contains(
    probes: DataFrame,
    bloom: DataFrame,
    key_col: str = "url",
    m_bits: int = 4096,
    k_hashes: int = 4,
) -> DataFrame:
    """Membership probe: a key is (probably) present iff ALL k of its
    bit positions are set.  Probe positions explode, the tiny word
    table joins in broadcast (m_bits/32 rows regardless of corpus
    size), and the verdict is one hash-agg counting satisfied
    positions — one-sided by construction (false positives possible,
    false negatives never; both engines agree exactly because the
    hash law is shared).  Returns the probe rows + ``in_bloom``
    (0/1)."""
    key = F.col(key_col)
    pos = probes.select(
        key_col,
        F.explode(
            F.array(
                *[
                    _bloom_pos(key, i, m_bits)
                    for i in range(int(k_hashes))
                ]
            )
        ).alias("pos"),
    ).select(
        key_col,
        (F.col("pos") / 32).cast("long").alias("word_idx"),
        F.expr("shiftleft(1L, cast(pos % 32 AS int))").alias("mask"),
    )
    hit = (
        pos.join(F.broadcast(bloom), "word_idx", "left")
        .withColumn(
            "ok",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(
                    F.col("mask")
                )
                != 0
            ).cast("int"),
        )
        .groupBy(key_col)
        .agg(
            (F.sum("ok") == F.lit(int(k_hashes)))
            .cast("long")
            .alias("in_bloom")
        )
    )
    return probes.join(hit, key_col)
