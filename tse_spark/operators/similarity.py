"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot product via ``zip_with`` + ``aggregate`` in double precision,
  entirely JVM-side.
- ``lsh_ann_topk``: sign-LSH (random hyperplanes) bucketed search — the
  scale path: candidates = vectors sharing >= 1 hyperplane-sign band
  with the query, exact re-rank of candidates only.  Hyperplanes are
  seed-deterministic; recall is pytest-verified against brute force.
- ``knn_join_sampled``: all-pairs top-1 neighbor (near-dup by cosine).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_scores(emb: DataFrame, query_vec: list[float]) -> DataFrame:
    """(vec_id, label, cos) vs a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qn = float(np.sqrt(np.dot(query_vec, query_vec)))
    cos = _dot(F.col("embedding"), q) / (_norm(F.col("embedding")) * F.lit(qn))
    return emb.select("vec_id", "label", F.round(cos, 4).alias("cos"))


def cosine_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10, exclude_id=None
) -> DataFrame:
    s = cosine_scores(emb, query_vec)
    if exclude_id is not None:
        s = s.filter(F.col("vec_id") != exclude_id)
    return s.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def get_query_vec(emb: DataFrame, vec_id: int) -> list[float]:
    row = emb.filter(F.col("vec_id") == vec_id).select("embedding").first()
    return [float(x) for x in row["embedding"]]


# ---------------------------------------------------------------------------
# sign-LSH ANN
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim))


def lsh_bucket_col(planes: np.ndarray):
    """Bucket id = packed sign bits of <v, plane_i>, computed JVM-side:
    each plane's dot product is an ``aggregate`` over ``zip_with`` with
    literal plane coefficients."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(c)) for c in p])
        bucket = bucket + F.when(
            _dot(F.col("embedding"), arr) >= 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_ann_topk(
    spark: SparkSession,
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 2,
    n_bands: int = 8,
    seed: int = 7,
    hamming_probe: int = 1,
) -> DataFrame:
    """Multi-probe banded sign-LSH ANN (the round-1 single-probe variant
    had a recall cliff at scale: one exact-bucket read misses most true
    neighbors as n grows).

    Candidates = vectors sharing ANY of ``n_bands`` band signatures with
    the query (the same OR-construction as :func:`lsh_neardup_pairs`),
    where each band's probe set is the query's signature plus all
    signatures within Hamming distance ``hamming_probe`` (flip each
    plane's sign bit) — so candidate probability for a neighbor at angle
    theta is 1-(1-p)^bands with p boosted by the extra probes.

    Plan: one scan computes the band signatures, an equi-join against
    the broadcast probe list selects candidates, exact cosine re-ranks
    candidates only.  At 10^12 rows the signatures are precomputed and
    the table is written partitioned by (band, sig): the broadcast IN
    probe list then partition-prunes the scan to bands*probes bucket
    reads — never a full scan, never all-pairs."""
    dim = len(query_vec)
    probe_rows: list[tuple[int, int]] = []
    band_sig_cols = []
    for bi in range(n_bands):
        planes = _hyperplanes(dim, n_planes, seed + 101 * bi)
        qsig = int(
            sum(
                (1 << i)
                for i, p in enumerate(planes)
                if float(np.dot(p, query_vec)) >= 0
            )
        )
        sigs = {qsig}
        if hamming_probe >= 1:
            sigs |= {qsig ^ (1 << i) for i in range(n_planes)}
        probe_rows += [(bi, s) for s in sorted(sigs)]
        band_sig_cols.append(
            F.struct(
                F.lit(bi).alias("band"), lsh_bucket_col(planes).alias("sig")
            )
        )
    probes = spark.createDataFrame(probe_rows, "band int, sig long")
    sigs_df = emb.select(
        "vec_id", F.explode(F.array(*band_sig_cols)).alias("bs")
    ).select(
        "vec_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    cand_ids = (
        sigs_df.join(F.broadcast(probes), ["band", "sig"])
        .select("vec_id")
        .distinct()
    )
    cand = emb.join(cand_ids, "vec_id", "left_semi")
    return cosine_topk(cand, query_vec, k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------

def seed_centroids(emb: DataFrame, n_cells: int) -> list[list[float]]:
    """Deterministic coarse centroids: the embeddings of the ``n_cells``
    lowest vec_ids (tiny pruned collect).  Production IVF would train
    them with k-means (pyspark.ml.clustering.KMeans fits unchanged on
    the same column); the seed variant keeps the whole operator
    reproducible for the DuckDB oracle, which re-derives identical
    centroids straight from the table."""
    rows = (
        emb.filter(F.col("vec_id") < n_cells)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    return [[float(x) for x in r["embedding"]] for r in rows]


def ivf_assign(
    emb: DataFrame, centroids: list[list[float]]
) -> DataFrame:
    """(vec_id, cell): cell = argmax_i cos(v, centroid_i), ties to the
    lowest centroid id.  Entirely JVM-side: per-centroid dot products
    are ``aggregate``/``zip_with`` expressions over literal coefficient
    arrays, the argmax is ``array_max`` over (cos, -i) structs — struct
    comparison is lexicographic, so max cos wins and -i breaks ties
    toward the smallest cell id.  At 10^12 rows this is the partition
    key to write the table by: a query then scans only ``n_probe``
    cells (partition pruning), never the full corpus."""
    entries = []
    for i, c in enumerate(centroids):
        arr = F.array(*[F.lit(float(x)) for x in c])
        cn = float(np.sqrt(np.dot(c, c)))
        cos = _dot(F.col("embedding"), arr) / (
            _norm(F.col("embedding")) * F.lit(cn)
        )
        entries.append(
            F.struct(cos.alias("cos"), F.lit(-i).alias("neg_cell"))
        )
    best = F.array_max(F.array(*entries))
    return emb.withColumn("cell", (-best["neg_cell"]).cast("long"))


def ivf_ann_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    exclude_id=None,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate nearest neighbor: assign every vector to its
    nearest coarse centroid (the inverted file), probe only the
    ``n_probe`` cells nearest to the query, exact-cosine re-rank within
    them.  Complements the sign-LSH path: IVF adapts to the data's
    cluster structure where LSH is data-oblivious.

    Recall < 1 by construction (neighbors assigned to unprobed cells
    are missed) and is pytest-pinned vs brute force; the driver oracle
    recomputes the same deterministic approximation in SQL."""
    if centroids is None:
        centroids = seed_centroids(emb, n_cells)
    q = np.asarray(query_vec, dtype=np.float64)
    cos_q = [
        float(np.dot(q, c) / (np.linalg.norm(q) * np.linalg.norm(c)))
        for c in centroids
    ]
    probe = sorted(
        range(len(centroids)), key=lambda i: (-cos_q[i], i)
    )[:n_probe]
    cand = ivf_assign(emb, centroids).filter(F.col("cell").isin(probe))
    if exclude_id is not None:
        cand = cand.filter(F.col("vec_id") != exclude_id)
    return cosine_topk(cand.drop("cell"), query_vec, k)


# ---------------------------------------------------------------------------
# embedding near-duplicate pairs
# ---------------------------------------------------------------------------

def cosine_neardup_pairs(
    emb: DataFrame, threshold: float = 0.4
) -> DataFrame:
    """All id_a < id_b pairs with cosine >= threshold — exact baseline
    via self-join; JVM-side dot products.  O(n^2): correctness oracle
    and small-corpus tool; the scale path is :func:`lsh_neardup_pairs`.
    """
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb"))
    )
    return (
        pairs.withColumn("cos", F.round(cos, 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def lsh_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 2,
    n_bands: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Scale path for embedding near-dup: BANDED sign-LSH (the MinHash
    band/OR construction on hyperplane signs).  Each band hashes the
    vector to the packed signs of ``n_planes`` hyperplanes; vectors
    sharing ANY band signature become candidates (explode bands ->
    (band, sig) equi-join — one shuffle, no cross join), then the exact
    cosine filters candidates.  Candidate probability for a pair at
    angle theta is 1-(1-(1-theta/pi)^planes)^bands — tune planes/bands
    to the threshold; recall < 1 by construction and is pytest-pinned
    vs the exact baseline."""
    dim = len(emb.select("embedding").first()["embedding"])
    band_cols = []
    for bi in range(n_bands):
        planes = _hyperplanes(dim, n_planes, seed + 101 * bi)
        band_cols.append(
            F.struct(
                F.lit(bi).alias("band"),
                lsh_bucket_col(planes).alias("sig"),
            )
        )
    sigs = emb.select(
        "vec_id", F.explode(F.array(*band_cols)).alias("bs")
    ).select(
        "vec_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    a = sigs.select("band", "sig", F.col("vec_id").alias("id_a"))
    b = sigs.select("band", "sig", F.col("vec_id").alias("id_b"))
    cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ea = emb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    )
    eb = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
    )
    cos = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb"))
    )
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn("cos", F.round(cos, 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
