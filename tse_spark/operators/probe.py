"""Distributed linear-probe training — the quality-filter model loop.

A curation pipeline's learned filters (fastText-style quality
classifiers, language filters) reduce, on the Spark side, to:
featurize every document (codegen) -> iterate {score, aggregate a
gradient, update weights} with O(n_features) driver traffic per step.
This module implements that loop for a LINEAR probe trained with
batch gradient descent on squared loss — deliberately
transcendental-free (no sigmoid/exp) so every step is reproducible
bit-for-bit by the DuckDB oracle:

- Features and predictions are sums/products/divisions of exactly
  representable values, folded in a fixed order on both engines.
- The gradient aggregate goes through the same FIXED-POINT law as the
  k-means centroid update (clustering.py): per-dimension contributions
  quantize to ``floor(v * 2^20 + 0.5)`` and sum as BIGINT — exact in
  any aggregation order — then one correctly-rounded double division.
- The learning rate is a power of two, so the weight update is exact.

Scale shape: one hash-free full-scan aggregate per iteration (a single
``agg`` of d+1 sums — map-side partials do all the work, no shuffle of
rows, no feature matrix materialization), weights live on the driver
as d doubles.  This is the same topology any distributed GD uses;
swapping squared loss for logistic costs one ``exp`` and the oracle's
bit-exactness (accepting ~1-ulp drift), nothing topological.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

FP_SCALE = 1 << 20


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, x1, x2, x3, y): the quality-probe feature row —
    x1 = tokens/100, x2 = distinct-token fraction, x3 = mean token
    byte-length / 10; label y = 1.0 iff the doc contains the token
    'spark' (a deterministic stand-in for a human quality label).
    The implicit intercept feature x0 = 1 is added by the trainer.
    All codegen: one split per row, aggregates inside the array."""
    arr = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda t: F.octet_length(t) > 0,
    )
    n = F.size("arr").cast("double")
    sum_len = F.aggregate(
        F.transform(F.col("arr"), lambda t: F.octet_length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return docs.select("doc_id", arr.alias("arr")).filter(
        F.size("arr") > 0
    ).select(
        "doc_id",
        (n / F.lit(100.0)).alias("x1"),
        (F.size(F.array_distinct("arr")).cast("double") / n).alias("x2"),
        (sum_len.cast("double") / n / F.lit(10.0)).alias("x3"),
        F.when(F.array_contains("arr", "spark"), 1.0)
        .otherwise(0.0)
        .alias("y"),
    )


def _pred(weights: list[float]) -> Column:
    """w0 + w1*x1 + w2*x2 + w3*x3 — left-associated, literal weights
    (repr round-trips the doubles exactly), the same fold order the
    oracle writes."""
    p = F.lit(float(weights[0]))
    for i in range(1, len(weights)):
        p = p + F.lit(float(weights[i])) * F.col(f"x{i}")
    return p


def probe_train(
    feats: DataFrame,
    n_iters: int = 3,
    lr: float = 0.25,
    n_features: int = 3,
) -> list[float]:
    """Batch GD on squared loss: w_d -= lr * 2 * mean(x_d * resid).
    The mean goes through the fixed-point BIGINT law, so the returned
    weights are identical regardless of partitioning or engine."""
    w = [0.0] * (n_features + 1)
    cols = ["x1", "x2", "x3"][:n_features]
    for _ in range(n_iters):
        resid = _pred(w) - F.col("y")
        aggs = [F.count(F.lit(1)).alias("n")]
        for d, name in enumerate(["__one"] + cols):
            x = F.lit(1.0) if name == "__one" else F.col(name)
            q = F.floor(x * resid * float(FP_SCALE) + 0.5).cast("long")
            aggs.append(F.sum(q).alias(f"g{d}"))
        row = feats.agg(*aggs).collect()[0]
        n = row["n"]
        for d in range(n_features + 1):
            g = float(row[f"g{d}"]) / (float(FP_SCALE) * float(n))
            w[d] = w[d] - float(lr) * 2.0 * g
    return w


def probe_weights_df(
    spark, weights: list[float]
) -> DataFrame:
    rows = [(d, float(v)) for d, v in enumerate(weights)]
    return spark.createDataFrame(rows, "feature int, weight double").select(
        F.col("feature").cast("long").alias("feature"),
        F.round("weight", 6).alias("weight"),
    )


def probe_scores(
    feats: DataFrame, weights: list[float], threshold: float = 0.5
) -> DataFrame:
    """(doc_id, score, keep, correct): the trained filter applied back
    — score = w.x rounded 4, keep = score >= threshold, correct =
    (keep == label).  The aggregate of ``correct`` is the train
    accuracy a curation pass monitors before trusting the filter."""
    s = F.round(_pred(weights), 4)
    return feats.select(
        "doc_id",
        s.alias("score"),
        (s >= threshold).alias("keep"),
        ((s >= threshold) == (F.col("y") >= 0.5)).alias("correct"),
    )
