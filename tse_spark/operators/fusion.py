"""Rank fusion for hybrid retrieval (X101).

The reference engine is sparse-only (BM25 over the inverted index,
index/Query.cpp); this module adds the modern hybrid-retrieval layer a
training-data / search stack runs on top of it: fuse the lexical top-k
with a dense (embedding cosine) top-k into one ranking.

Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):

    rrf(d) = sum over legs L containing d of 1 / (k0 + rank_L(d))

RRF is score-scale-free — it only consumes the *ranks* of each leg, so
a BM25 score and a cosine in [-1, 1] fuse without calibration.

Scale shape: each leg is already a bounded top-k (k ~ tens), so the
fusion itself is trivial — a union of the k-row legs into one hash
aggregation (full-outer joins cannot broadcast in Spark, so the
union+agg form beats the textbook N-way outer join).  The cost lives
entirely in the legs
(pruned WAND / ANN index probes), which keep their own 100-TB designs.
The per-leg ``row_number`` windows are single-partition by
construction but only ever see k rows (never corpus-sized input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

DEFAULT_K0 = 60  # the SIGIR'09 constant; dampens the head of each leg


def rank_leg(leg: DataFrame, score_col: str, id_col: str = "doc_id") -> DataFrame:
    """Attach 1-based ``rank`` to a bounded top-k leg, ordered by
    (score desc, id asc) — the same tie-break every top-k in this
    engine uses.  Input must already be a k-row result (the window is
    single-partition and must never see unbounded input)."""
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return leg.select(
        F.col(id_col).alias("doc_id"), F.row_number().over(w).alias("rank")
    )


def rrf_fuse(
    legs: list[DataFrame], k: int = 10, k0: int = DEFAULT_K0
) -> DataFrame:
    """Fuse ranked legs (``doc_id``, ``rank``) into RRF top-k.

    Returns ``(doc_id, rrf)`` with rrf rounded to 6 (driver-hash
    convention), ordered by rrf desc, doc_id asc.
    """
    if not legs:
        raise ValueError("rrf_fuse needs at least one leg")
    # union + one hash agg, NOT an N-way full-outer join: full outer
    # cannot broadcast in Spark (it forces a sort-merge join even for
    # k-row legs), while the union aggregates in a single exchange and
    # generalizes to any number of legs
    contribs = None
    for leg in legs:
        c = leg.select(
            "doc_id",
            (F.lit(1.0) / (F.lit(float(k0)) + F.col("rank"))).alias(
                "__c"
            ),
        )
        contribs = c if contribs is None else contribs.unionAll(c)
    return (
        contribs.groupBy("doc_id")
        .agg(F.round(F.sum("__c"), 6).alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(k)
    )


def rank_overlap_rbo(
    leg_a: DataFrame,
    leg_b: DataFrame,
    k: int,
    p: float = 0.9,
) -> DataFrame:
    """Truncated rank-biased overlap (Webber, Moffat & Zobel, TOIS'10)
    between two ranked legs (``doc_id``, ``rank`` 1-based, depth <= k):

        RBO@k = (1 - p) * sum_{d=1..k} p^(d-1) * |A_d ∩ B_d| / d

    The release-gate number for ranking changes: compare an index
    snapshot against its predecessor, a quantized tier against exact
    scoring, or an A/B scorer pair — top-weighted (small p discounts
    the tail), score-scale-free like RRF.  Returns one row ``(k, p,
    rbo)``; rbo in [0, 1], 1 = identical prefixes at every depth.

    Shape: both legs are k-row relations, the depth axis is a k-row
    literal range — everything after the (bounded) legs is
    driver-trivial, like :func:`rrf_fuse`.
    """
    spark = leg_a.sparkSession
    depths = spark.range(1, k + 1).select(F.col("id").alias("d"))
    joined = (
        leg_a.select("doc_id", F.col("rank").alias("ra"))
        .join(leg_b.select("doc_id", F.col("rank").alias("rb")), "doc_id")
    )
    per_depth = depths.join(
        joined,
        (F.col("ra") <= F.col("d")) & (F.col("rb") <= F.col("d")),
        "left",
    ).groupBy("d").agg(F.count("doc_id").alias("ov"))
    return per_depth.agg(
        F.lit(k).cast("long").alias("k"),
        F.round(F.lit(float(p)), 4).alias("p"),
        F.round(
            F.sum(
                (1.0 - F.lit(float(p)))
                * F.pow(F.lit(float(p)), F.col("d") - 1)
                * F.col("ov")
                / F.col("d")
            ),
            6,
        ).alias("rbo"),
    )
