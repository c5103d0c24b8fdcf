"""Document-id reordering: posting-list compression gain (X104).

Delta-gap + varint postings compress better when similar documents get
adjacent ids (template terms then produce runs of tiny gaps) — the
classic id-reassignment result (Silvestri ECIR'07: sorting web docs by
URL approaches TSP-quality gap compression at sort cost).  The
reference assigns scan-order ids (DocIndex.cpp) and never revisits
them; this operator prices the alternative: recompute every posting
list's varint byte cost under (a) the existing crawl-order ids and
(b) ids reassigned by a content sort, and report both so the build can
decide whether a reorder pass pays for itself before writing shards.

Scale shape: the reassignment is the same two-phase dense-rank used by
``index_build.assign_doc_ids`` — deterministic ORDER-PRESERVING prefix
buckets (a bucket key that is a prefix of the sort key can never
disagree with the full-key order), exact per-bucket counts as a
broadcast offset map, per-bucket ``row_number`` — so no
single-partition window ever sees corpus-sized input.  The byte law is
one lag-window over (term, id) — the shuffle the posting build does
anyway — plus a scalar agg.  Production note: prefix buckets inherit
the key distribution's skew; a real cluster feeds boundaries from a
sample instead (documented tradeoff, same output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def rank_by_key(
    df: DataFrame,
    order_col: str,
    id_col: str = "doc_id",
    prefix_len: int = 4,
) -> DataFrame:
    """``(doc_id, new_id)``: dense 0-based rank under ``(order_col,
    id_col)`` — equal keys (duplicate docs) fall back to the old id so
    the rank is total and deterministic."""
    bucket = F.substring(F.col(order_col), 1, prefix_len)
    with_b = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(order_col).alias("__k"),
        bucket.alias("__b"),
    )
    offs = (
        with_b.groupBy("__b")
        .count()
        .select(
            "__b",
            F.coalesce(
                F.sum("count").over(
                    Window.orderBy("__b").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("__off"),
        )
    )
    w = Window.partitionBy("__b").orderBy("__k", "doc_id")
    return (
        with_b.join(F.broadcast(offs), "__b")
        .select(
            "doc_id",
            (F.col("__off") + F.row_number().over(w) - 1)
            .cast("long")
            .alias("new_id"),
        )
    )


def _varint_bytes(gap):
    """Byte cost of one unsigned LEB128 gap (range-cased, not
    ``floor(log)`` — boundary-exact in any engine)."""
    return (
        F.when(gap < 128, 1)
        .when(gap < 16384, 2)
        .when(gap < 2097152, 3)
        .when(gap < 268435456, 4)
        .otherwise(5)
        .cast("long")
    )


def gap_byte_cost(postings: DataFrame, id_col: str) -> DataFrame:
    """One row ``(n_postings, total_bytes)``: sum of varint sizes of
    per-term delta gaps (first posting encodes ``id + 1`` so every gap
    is >= 1, matching the shard codec's convention)."""
    w = Window.partitionBy("term").orderBy(id_col)
    gaps = postings.select(
        (
            F.col(id_col) - F.coalesce(F.lag(id_col).over(w), F.lit(-1))
        ).alias("gap")
    )
    return gaps.agg(
        F.count(F.lit(1)).alias("n_postings"),
        F.sum(_varint_bytes(F.col("gap"))).alias("total_bytes"),
    )


def reorder_gain(
    tf: DataFrame, docs: DataFrame, order_col: str = "text"
) -> DataFrame:
    """Compression report: ``(ordering, n_postings, total_bytes,
    bytes_per_posting)`` for crawl-order ids vs content-sorted ids."""
    base = gap_byte_cost(tf.select("term", "doc_id"), "doc_id")
    remap = rank_by_key(docs, order_col)
    resorted = tf.join(remap, "doc_id").select("term", "new_id")
    alt = gap_byte_cost(resorted, "new_id")

    def _tag(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("ordering"),
            "n_postings",
            "total_bytes",
            F.round(F.col("total_bytes") / F.col("n_postings"), 4).alias(
                "bytes_per_posting"
            ),
        )

    return _tag(base, "crawl_order").unionAll(_tag(alt, "content_sort"))


def ef_byte_cost(postings: DataFrame, id_col: str) -> DataFrame:
    """One row ``(n_postings, total_bytes)`` under Elias-Fano, summed
    over per-term lists — the same closed-form law as
    ``intcodec.codec_advisor`` (pytest-pinned there against the real
    encoder), applied per term then totalled."""
    per_term = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(id_col).alias("last"),
    )
    n, last = F.col("n"), F.col("last")
    u = last + 1
    l = (
        F.when(
            u > n,
            F.greatest(
                F.lit(0),
                F.floor(F.log2(u.cast("double") / n.cast("double"))),
            ),
        )
        .otherwise(0)
        .cast("long")
    )
    low = F.when(l > 0, F.floor((n * l + 7) / 8)).otherwise(0)
    hi = F.floor(
        (
            F.floor(last / F.pow(F.lit(2.0), l.cast("double"))).cast(
                "long"
            )
            + n
            + 1
            + 7
        )
        / 8
    )
    per = per_term.select(
        "n", (F.lit(17) + low + hi).cast("long").alias("b")
    )
    return per.agg(
        F.sum("n").cast("long").alias("n_postings"),
        F.sum("b").cast("long").alias("total_bytes"),
    )


def reorder_gain_codecs(
    tf: DataFrame, docs: DataFrame, order_col: str = "text"
) -> DataFrame:
    """X104 x X113: the id-reassignment gain priced under BOTH posting
    codecs — ``(ordering, codec, n_postings, total_bytes,
    bytes_per_posting)``, 4 rows.  EF's cost depends only on (n, last
    id) per term, so a content sort that shrinks varint gaps can leave
    EF nearly unchanged — the report shows which codec the reorder
    actually pays for."""
    remap = rank_by_key(docs, order_col)
    base = tf.select("term", "doc_id")
    resorted = tf.join(remap, "doc_id").select(
        "term", F.col("new_id").alias("doc_id")
    )

    def _tag(df: DataFrame, ordering: str, codec: str) -> DataFrame:
        return df.select(
            F.lit(ordering).alias("ordering"),
            F.lit(codec).alias("codec"),
            "n_postings",
            "total_bytes",
            F.round(F.col("total_bytes") / F.col("n_postings"), 4).alias(
                "bytes_per_posting"
            ),
        )

    return (
        _tag(gap_byte_cost(base, "doc_id"), "crawl_order", "varint")
        .unionAll(
            _tag(gap_byte_cost(resorted, "doc_id"), "content_sort",
                 "varint")
        )
        .unionAll(_tag(ef_byte_cost(base, "doc_id"), "crawl_order",
                       "elias_fano"))
        .unionAll(
            _tag(ef_byte_cost(resorted, "doc_id"), "content_sort",
                 "elias_fano")
        )
    )
