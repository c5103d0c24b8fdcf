"""K-means clustering over the embedding column + SemDeDup.

The IVF family (operators/similarity.py) coarse-quantizes with
deterministic *seed* centroids so its oracle stays SQL-expressible; its
docstring notes that production would train them.  This module is that
trainer — Lloyd's algorithm expressed so every iteration is ONE Spark
job and the whole law (seeding, assignment, update) is reproducible
bit-for-bit by a DuckDB oracle:

- **Seeding**: centroid ``i`` = embedding of ``vec_id == i`` (the
  ``seed_centroids`` law, trivially SQL-derivable).
- **Assignment**: ``cell = argmin_i ||v - c_i||^2`` with the distance
  expanded as ``dot(v,v) - 2 dot(v,c) + dot(c,c)`` — three
  ``aggregate``/``zip_with`` folds over literal coefficients, entirely
  JVM-side (same expression shape as the DuckDB ``list_dot_product``
  twin, so both engines accumulate in array order).  Ties go to the
  lowest cell id via ``array_min`` over ``struct(dist, cell)``.
- **Update**: per-dimension means computed in FIXED POINT — each
  component is quantized to ``floor(x * 2^20 + 0.5)`` (the half-up law
  Spark/DuckDB/numpy express identically, cf. the int8 ANN tier) and
  summed as BIGINT, so the sum is exact in ANY order and the mean
  ``sum / (2^20 * n)`` is one correctly-rounded double division —
  engine and oracle centroids are bit-identical, no summation-order
  drift can leak into the next iteration's argmin.  Empty cells keep
  their previous centroid.

Scale: one hash-agg shuffle of ``k * (dim + 1)`` cells per iteration
(map-side partials absorb everything; the per-row work is k literal
dot products in whole-stage codegen); centroids come back to the
driver as k rows per iteration — O(k * dim) driver bytes, never the
corpus.  At 10^9+ vectors this is exactly Spark ML KMeans' topology;
we keep our own so the update law stays oracle-reproducible.

SemDeDup (Abbas et al. 2023): cluster, then drop any vector that has a
lower-id neighbor above a cosine threshold WITHIN its cluster — the
cluster partition bounds the quadratic pair search to intra-cell
self-joins (one shuffle on ``cell``), never the corpus cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tse_spark.operators.similarity import _dot, _lit_vec

# fixed-point scale for the centroid-update sums (2^20; exact in
# doubles up to corpora of 2^33 vectors per cell)
FP_SCALE = 1 << 20


def _sq_dist(vec_col, centroid: list[float]):
    """||v - c||^2 as dot(v,v) - 2 dot(v,c) + dot(c,c), folding each
    dot in array order — the exact expression the oracle mirrors."""
    c = _lit_vec(centroid)
    cc = float(sum(x * x for x in centroid))
    return (
        _dot(vec_col, vec_col) - 2.0 * _dot(vec_col, c) + F.lit(cc)
    )


def kmeans_assign(
    emb: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """+ ``cell`` column: argmin squared-L2 centroid, ties to the
    lowest cell id (lexicographic ``array_min`` over (dist, cell))."""
    entries = [
        F.struct(
            _sq_dist(F.col(vec_col), c).alias("d"),
            F.lit(i).cast("int").alias("cell"),
        )
        for i, c in enumerate(centroids)
    ]
    best = F.array_min(F.array(*entries))
    return emb.withColumn("cell", best["cell"].cast("long"))


def seed_kmeans(emb: DataFrame, k: int) -> list[list[float]]:
    """Deterministic seeds: embeddings of the k lowest vec_ids."""
    rows = (
        emb.filter(F.col("vec_id") < k)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    return [[float(x) for x in r["embedding"]] for r in rows]


def kmeans_update(
    emb_assigned: DataFrame,
    centroids: list[list[float]],
    dim: int,
) -> list[list[float]]:
    """One Lloyd update: fixed-point per-dimension means per cell (see
    module docstring for the exactness argument).  Empty cells keep
    their previous centroid.  Driver traffic: k rows of dim+1 longs."""
    sums = [
        F.sum(
            F.floor(
                F.col("embedding")[d].cast("double") * float(FP_SCALE) + 0.5
            ).cast("long")
        ).alias(f"s{d}")
        for d in range(dim)
    ]
    rows = (
        emb_assigned.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"), *sums)
        .collect()
    )
    out = [list(c) for c in centroids]
    for r in rows:
        n = r["n"]
        out[r["cell"]] = [
            float(r[f"s{d}"]) / (float(FP_SCALE) * float(n))
            for d in range(dim)
        ]
    return out


def kmeans_train(
    emb: DataFrame, k: int, n_iters: int, dim: int
) -> list[list[float]]:
    """Lloyd's algorithm: ``n_iters`` assign+update rounds from the
    deterministic seeds.  Returns the trained centroids."""
    cents = seed_kmeans(emb, k)
    for _ in range(n_iters):
        assigned = kmeans_assign(emb, cents)
        cents = kmeans_update(assigned, cents, dim)
    return cents


def kmeans_clusters(
    emb: DataFrame, k: int = 8, n_iters: int = 2, dim: int = 64,
    centroids: "list[list[float]] | None" = None,
) -> DataFrame:
    """(vec_id, cell) after ``n_iters`` Lloyd rounds — the trained
    cluster assignment (the input the IVF build would consume as its
    coarse quantizer, and SemDeDup as its partition).  ``centroids``
    skips training (one generation's trained quantizer is shared by
    clusters/report/dedup consumers — the pagerank-prior pattern)."""
    cents = centroids or kmeans_train(emb, k, n_iters, dim)
    return kmeans_assign(emb, cents).select("vec_id", "cell")


def kmeans_report(
    emb: DataFrame, k: int = 8, n_iters: int = 2, dim: int = 64,
    centroids: "list[list[float]] | None" = None,
) -> DataFrame:
    """Per-cell training report: size + mean intra-cell squared
    distance (inertia/n), rounded — the convergence scoreboard.  The
    mean goes through the same fixed-point law as the centroid update
    (floor(d2 * 10^6 + 0.5) summed as BIGINT) so it is exact in any
    aggregation order and the oracle reproduces it bit-for-bit."""
    cents = centroids or kmeans_train(emb, k, n_iters, dim)
    a = kmeans_assign(emb, cents)
    # distance to own centroid: index the per-cell distance array by
    # the assigned cell — one projection, no join back to centroids
    entries = [_sq_dist(F.col("embedding"), c) for c in cents]
    dist = F.element_at(F.array(*entries), F.col("cell").cast("int") + 1)
    q = F.floor(dist * 1e6 + 0.5).cast("long")
    return (
        a.select("cell", q.alias("d2q"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(
                F.sum("d2q").cast("double")
                / (1e6 * F.count(F.lit(1)).cast("double")),
                4,
            ).alias("mean_sq_dist"),
        )
        .orderBy("cell")
    )


def semantic_dedup(
    emb: DataFrame,
    k: int = 8,
    n_iters: int = 2,
    dim: int = 64,
    threshold: float = 0.35,
    centroids: "list[list[float]] | None" = None,
) -> DataFrame:
    """SemDeDup: (vec_id, cell, kept) — ``kept = false`` iff a
    LOWER-vec_id vector in the SAME trained cluster has cosine >=
    threshold (rounded to 4dp, the repo's cross-engine compare law).

    The cluster partition is the scale trick: candidate pairs come
    from an equi-join on ``cell`` (one shuffle), so the quadratic term
    is bounded by the largest cluster, not the corpus — raise k until
    cells fit.  Drop priority is keep-lowest-id, independent of which
    neighbors themselves survive (the published SemDeDup law; makes
    the decision per-pair parallel, no sequential sweep)."""
    cents = centroids or kmeans_train(emb, k, n_iters, dim)
    a = kmeans_assign(emb, cents)
    lhs = a.select(
        F.col("cell").alias("cl"),
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
    )
    rhs = a.select(
        F.col("cell").alias("cl"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
    )
    cos = _dot(F.col("va"), F.col("vb")) / F.sqrt(
        _dot(F.col("va"), F.col("va")) * _dot(F.col("vb"), F.col("vb"))
    )
    dropped = (
        lhs.join(rhs, "cl")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.round(cos, 4) >= threshold)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return (
        a.select("vec_id", "cell")
        .join(dropped.withColumn("dup", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.coalesce(~F.col("dup"), F.lit(True)).alias("kept"),
        )
    )
