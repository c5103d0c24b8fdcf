"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot product via ``zip_with`` + ``aggregate`` in double precision,
  entirely JVM-side.
- ``lsh_ann_topk``: sign-LSH (random hyperplanes) bucketed search — the
  scale path: candidates = vectors sharing >= 1 hyperplane-sign band
  with the query, exact re-rank of candidates only.  Hyperplanes are
  seed-deterministic; recall is pytest-verified against brute force.
- ``build_lsh_signature_table`` / ``lsh_ann_topk_indexed`` and
  ``build_ivf_cell_table`` / ``ivf_ann_topk_indexed``: the MATERIALIZED
  serving paths — signatures / cell assignments are computed once at
  build time and written as (band, sig)- / cell-partitioned tables, so
  a query's broadcast probe list partition-prunes the read to a handful
  of bucket directories instead of recomputing signatures over the full
  corpus per query (the round-2 perf-weak item).
- ``knn_join_sampled``: all-pairs top-1 neighbor (near-dup by cosine).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def _lit_vec(values) -> "F.Column":
    """A literal double-array column in ONE py4j round trip.  F.lit /
    F.array desugar to one driver call per element — ~3 s of pure
    driver time per LSH plan at bands x planes x dims elements; a
    parsed SQL expression is one call, and ``repr(float)`` round-trips
    float64 exactly so the JVM sees bit-identical coefficients."""
    return F.expr(
        "array(" + ",".join(f"{float(v)!r}D" for v in values) + ")"
    )


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
    q = _lit_vec(query_vec)
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
        arr = _lit_vec(p)
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
    probe_rows = _lsh_probes(query_vec, n_planes, n_bands, seed, hamming_probe)
    band_sig_cols = []
    for bi in range(n_bands):
        planes = _hyperplanes(dim, n_planes, seed + 101 * bi)
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
# materialized sign-LSH index (build once, partition-prune per query)
# ---------------------------------------------------------------------------

def _read_pinned(spark: SparkSession, meta: dict, data_dir) -> DataFrame:
    """Read an index table with the schema pinned at build time (no
    inference: planning never opens a data file's footer).  Accepts one
    dir or a list (base + append deltas); a union of per-dir scans
    keeps partition pruning working independently under each root."""
    from functools import reduce

    from pyspark.sql import types as T

    dirs = [data_dir] if isinstance(data_dir, str) else list(data_dir)

    def one(d: str) -> DataFrame:
        reader = spark.read
        if "schema" in meta:
            reader = reader.schema(
                T.StructType.fromJson(json.loads(meta["schema"]))
            )
        return reader.parquet(d)

    return reduce(DataFrame.unionByName, (one(d) for d in dirs))


def _index_dirs(index_dir: str, meta: dict) -> list[str]:
    return [
        os.path.join(index_dir, d) for d in meta.get("data_dirs", ["data"])
    ]


def _publish_meta(out_dir: str, meta: dict) -> None:
    """meta.json is the index's visibility gate: written via tmp +
    atomic replace, ALWAYS last — a crash anywhere earlier leaves the
    previous index fully intact (same contract as plans/append.py)."""
    tmp = os.path.join(out_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "meta.json"))


def _lsh_probes(
    query_vec: list[float],
    n_planes: int,
    n_bands: int,
    seed: int,
    hamming_probe: int,
) -> list[tuple[int, int]]:
    """Driver-side probe list for a query: per band, the query's packed
    sign signature plus every signature within Hamming distance
    ``hamming_probe`` — shared by the on-the-fly and indexed paths so
    their candidate sets are identical by construction."""
    probe_rows: list[tuple[int, int]] = []
    for bi in range(n_bands):
        planes = _hyperplanes(len(query_vec), n_planes, seed + 101 * bi)
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
    return probe_rows


def _lsh_rows(
    emb: DataFrame, dim: int, n_planes: int, n_bands: int, seed: int
) -> DataFrame:
    """One row per (vector, band) with packed sign signature — the same
    JVM expression the on-the-fly path compiles; shared by build and
    append so every generation of the index hashes identically."""
    band_sig_cols = []
    for bi in range(n_bands):
        planes = _hyperplanes(dim, n_planes, seed + 101 * bi)
        band_sig_cols.append(
            F.struct(
                F.lit(bi).alias("band"), lsh_bucket_col(planes).alias("sig")
            )
        )
    return emb.select(
        *emb.columns, F.explode(F.array(*band_sig_cols)).alias("__bs")
    ).select(
        *emb.columns,
        F.col("__bs.band").alias("band"),
        F.col("__bs.sig").alias("sig"),
    )


def build_lsh_signature_table(
    emb: DataFrame,
    out_dir: str,
    dim: int,
    n_planes: int = 2,
    n_bands: int = 8,
    seed: int = 7,
) -> str:
    """Materialize the sign-LSH index: one row per (vector, band) with
    the vector's payload columns riding along, written PARTITIONED BY
    (band, sig).  This is the scale design the on-the-fly
    :func:`lsh_ann_topk` docstring promises: at 10^12 vectors a query
    must never rescan the corpus to recompute signatures — with this
    table the broadcast probe list partition-prunes the read to
    ``n_bands * (1 + n_planes)`` bucket directories.

    Storage trade: the vector is duplicated once per band (the same
    trade an IVF/SSD-serving system makes so candidate re-rank needs no
    second corpus join).  Partition-dir count is ``n_bands * 2^
    n_planes`` — at larger plane counts bucket ``sig`` modulo a dir
    budget (not needed at these params).

    Signature computation is the same JVM-side ``lsh_bucket_col``
    expression the on-the-fly path compiles, so indexed results are
    identical by construction.  ``meta.json`` records the params
    (written last — a crash mid-build leaves no readable index).
    """
    rows = _lsh_rows(emb, dim, n_planes, n_bands, seed)
    data_dir = os.path.join(out_dir, "data")
    rows.write.mode("overwrite").partitionBy("band", "sig").parquet(data_dir)
    meta = {
        "kind": "lsh_sign",
        "dim": dim,
        "n_planes": n_planes,
        "n_bands": n_bands,
        "seed": seed,
        "columns": list(emb.columns),
        # pinned read schema: the serving path must never run schema
        # inference (a footer read of an arbitrary file at planning
        # time — a pointless listing+IO cost on a huge table, and it
        # would touch non-probed buckets)
        "schema": rows.schema.json(),
        "data_dirs": ["data"],
    }
    _publish_meta(out_dir, meta)
    return out_dir


def lsh_ann_topk_indexed(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    hamming_probe: int = 1,
    exclude_id=None,
) -> DataFrame:
    """ANN top-k over a materialized signature table: compute the probe
    (band, sig) list driver-side (tiny — numpy over the literal
    hyperplanes), read ONLY those partitions (the OR-of-equalities
    predicate on the partition columns prunes at planning time; pytest
    proves non-probed buckets are never opened), dedup candidates that
    match in several bands, exact-cosine re-rank.

    Results are identical to :func:`lsh_ann_topk` with the same params
    — the probe-list construction is shared (:func:`_lsh_probes`)."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    if len(query_vec) != int(meta["dim"]):
        raise ValueError(
            f"query dim {len(query_vec)} != index dim {meta['dim']}"
        )
    probes = _lsh_probes(
        query_vec, int(meta["n_planes"]), int(meta["n_bands"]),
        int(meta["seed"]), hamming_probe,
    )
    t = _live_pinned(spark, index_dir, meta)
    pred = None
    for b, s in probes:
        clause = (F.col("band") == b) & (F.col("sig") == s)
        pred = clause if pred is None else (pred | clause)
    cand = t.filter(pred).dropDuplicates(["vec_id"]).drop("band", "sig")
    return cosine_topk(cand, query_vec, k, exclude_id=exclude_id)


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
        arr = _lit_vec(c)
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
    probe = _ivf_probe_cells(centroids, query_vec, n_probe)
    cand = ivf_assign(emb, centroids).filter(F.col("cell").isin(probe))
    if exclude_id is not None:
        cand = cand.filter(F.col("vec_id") != exclude_id)
    return cosine_topk(cand.drop("cell"), query_vec, k)


def _ivf_probe_cells(
    centroids: list[list[float]], query_vec: list[float], n_probe: int
) -> list[int]:
    """Driver-side probe-cell choice (tiny numpy): the ``n_probe``
    centroids nearest the query by cosine, ties to the lowest cell id —
    shared by the on-the-fly and indexed paths."""
    q = np.asarray(query_vec, dtype=np.float64)
    cos_q = [
        float(np.dot(q, c) / (np.linalg.norm(q) * np.linalg.norm(c)))
        for c in centroids
    ]
    return sorted(range(len(centroids)), key=lambda i: (-cos_q[i], i))[
        :n_probe
    ]


def build_ivf_cell_table(
    emb: DataFrame,
    out_dir: str,
    n_cells: int = 8,
    centroids: list[list[float]] | None = None,
) -> str:
    """Materialize the IVF inverted file: every vector written into its
    nearest-centroid cell, PARTITIONED BY cell, with the centroids
    saved in meta.json for the query side.  This is the scale design
    :func:`ivf_ann_topk`'s docstring promises: a query reads only its
    ``n_probe`` cell directories (partition pruning) instead of
    re-running the assignment over the corpus.

    Cell assignment is the same JVM-side argmax expression as
    :func:`ivf_assign`, so indexed results are identical by
    construction.  meta.json is written LAST — a crash mid-build
    leaves no readable index."""
    if centroids is None:
        centroids = seed_centroids(emb, n_cells)
    data_dir = os.path.join(out_dir, "data")
    ivf_assign(emb, centroids).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(data_dir)
    meta = {
        "kind": "ivf",
        "n_cells": len(centroids),
        "centroids": centroids,
        "columns": list(emb.columns),
        "schema": ivf_assign(emb, centroids).schema.json(),
        "data_dirs": ["data"],
    }
    _publish_meta(out_dir, meta)
    return out_dir


def ivf_ann_topk_indexed(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    exclude_id=None,
) -> DataFrame:
    """IVF ANN over a materialized cell table: pick the probe cells
    driver-side from the stored centroids, read ONLY those cell
    partitions (``cell IN (...)`` prunes at planning time), exact-cosine
    re-rank within them.  Identical results to :func:`ivf_ann_topk`
    with the same centroids."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    probe = _ivf_probe_cells(meta["centroids"], query_vec, n_probe)
    t = _live_pinned(spark, index_dir, meta)
    cand = t.filter(F.col("cell").isin(probe)).drop("cell")
    if exclude_id is not None:
        cand = cand.filter(F.col("vec_id") != exclude_id)
    return cosine_topk(cand, query_vec, k)


# ---------------------------------------------------------------------------
# ANN index maintenance: O(delta) append + compaction
# ---------------------------------------------------------------------------

def _ann_tombstones(spark, index_dir: str, meta: dict):
    """The live vec_id tombstone relation, or None (see
    :func:`delete_vectors`)."""
    d = meta.get("tombstones_dir")
    if not d:
        return None
    return spark.read.parquet(os.path.join(index_dir, d)).select("vec_id")


def _live_pinned(spark, index_dir: str, meta: dict) -> DataFrame:
    """Pinned-schema read of every published data dir MINUS tombstoned
    vectors — the relation ANN serving must see.  The anti-join
    broadcasts the (small-by-contract) deleted set; compaction removes
    the rows physically and drops the mask."""
    t = _read_pinned(spark, meta, _index_dirs(index_dir, meta))
    tomb = _ann_tombstones(spark, index_dir, meta)
    if tomb is None:
        return t
    return t.join(F.broadcast(tomb), "vec_id", "left_anti")


def delete_vectors(
    spark: SparkSession, index_dir: str, vec_ids: list[int]
) -> int:
    """Tombstone vectors in a materialized ANN index (any kind) —
    the vector twin of the text index's plans/delete.py, same
    Iceberg-style contract: a versioned ``tombstones_vNNNN`` parquet
    (overwrite — retry-safe) made visible only by the atomic meta
    republish; O(tombstones) work, no data file touched.  Every indexed
    serving path masks the set before its top-k (so a deleted vector
    can never displace a survivor), and :func:`compact_ann_index`
    folds the deletes physically and clears the mask.  Idempotent:
    re-deleting an already-dead set writes nothing.  Returns the live
    tombstone count.  A deleted vec_id stays excluded until compaction
    removes its rows; append's default anti-join sees the (still
    physical) rows, so the id cannot be re-added before that."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    ids = sorted({int(i) for i in vec_ids})
    if not ids:
        return int(meta.get("n_tombstones", 0))
    new = spark.createDataFrame([(i,) for i in ids], "vec_id long")
    old_dir = meta.get("tombstones_dir")
    if old_dir:
        existing = spark.read.parquet(
            os.path.join(index_dir, old_dir)
        ).select("vec_id")
        if new.join(existing, "vec_id", "left_anti").limit(1).count() == 0:
            return int(meta["n_tombstones"])  # no-op redelete
        new = new.unionByName(existing).distinct()
    version = int(meta.get("tombstone_version", 0)) + 1
    dname = f"tombstones_v{version:04d}"
    new.repartition(1).write.mode("overwrite").parquet(
        os.path.join(index_dir, dname)
    )
    n = spark.read.parquet(os.path.join(index_dir, dname)).count()
    meta["tombstones_dir"] = dname
    meta["n_tombstones"] = int(n)
    meta["tombstone_version"] = version
    _publish_meta(index_dir, meta)  # atomic commit, crash-safe
    return int(n)


def append_ann_index(
    spark: SparkSession,
    index_dir: str,
    emb: DataFrame,
    assume_disjoint: bool = False,
) -> str | None:
    """Append new vectors to a materialized ANN index (either kind) at
    O(delta) cost: hash/assign ONLY the new rows with the params/
    centroids pinned in meta.json (so every generation buckets
    identically), write them to a fresh ``data_delta_NNNN`` dir, then
    atomically republish meta with the dir appended.  No existing file
    is touched; a crash before the publish leaves the index exactly as
    it was (readers only see dirs meta lists), and a retry overwrites
    the orphan delta dir — idempotent.

    ``assume_disjoint=False`` anti-joins the delta against the live
    index's vec_ids (a column-pruned scan of just vec_id) so re-sent
    vectors cannot double-index; pass True when the caller guarantees
    fresh ids (e.g. ids allocated by the text-index append) to skip
    that scan — at 10^12 vectors the scan is the dominant cost.

    Queries over an appended index read base + deltas as a union of
    pruned scans; after many small appends run
    :func:`compact_ann_index` to fold the deltas back into one dir
    (small-file pressure, same maintenance rhythm as the text index's
    plans/compact.py)."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    cols = meta.get("columns", emb.columns)
    if sorted(cols) != sorted(emb.columns):
        raise ValueError(
            f"append_ann_index: delta columns {sorted(emb.columns)} != "
            f"index columns {sorted(cols)}"
        )
    if not assume_disjoint:
        live = _read_pinned(spark, meta, _index_dirs(index_dir, meta))
        emb = emb.join(
            live.select("vec_id").distinct(), "vec_id", "left_anti"
        )
        if emb.isEmpty():
            # nothing genuinely new (e.g. a redelivered ingest batch):
            # no delta dir, no meta churn — replay-idempotent
            return None
    if meta["kind"] == "lsh_sign":
        rows = _lsh_rows(
            emb.select(*cols),
            int(meta["dim"]),
            int(meta["n_planes"]),
            int(meta["n_bands"]),
            int(meta["seed"]),
        )
        part_cols = ["band", "sig"]
    elif meta["kind"] == "ivf":
        rows = ivf_assign(emb.select(*cols), meta["centroids"])
        part_cols = ["cell"]
    elif meta["kind"] == "int8_codes":
        rows = _int8_rows(emb.select(*cols))
        part_cols = []  # linear-scan tier: no bucket dirs
    else:  # pragma: no cover - corrupt meta
        raise ValueError(f"unknown ANN index kind {meta.get('kind')!r}")
    dirs = meta.get("data_dirs", ["data"])
    delta = f"data_delta_{len(dirs):04d}"
    w = rows.write.mode("overwrite")
    if part_cols:
        w = w.partitionBy(*part_cols)
    w.parquet(os.path.join(index_dir, delta))
    meta["data_dirs"] = dirs + [delta]
    _publish_meta(index_dir, meta)
    return delta


def compact_ann_index(spark: SparkSession, index_dir: str) -> str:
    """Fold base + append deltas back into ONE versioned data dir and
    atomically republish meta pointing at it.  Rows are already
    bucketed — compaction is a partition-preserving rewrite (read union
    → write partitioned), no re-hashing.  Crash before the publish
    leaves the uncompacted index intact; old dirs are removed
    best-effort AFTER the publish (a leftover orphan is invisible to
    readers and reclaimed by the next compact)."""
    import shutil

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    old = meta.get("data_dirs", ["data"])
    part_cols = {
        "lsh_sign": ["band", "sig"],
        "ivf": ["cell"],
        "int8_codes": [],
    }[meta["kind"]]
    gen = int(meta.get("compact_gen", 0)) + 1
    new_dir = f"data_v{gen:04d}"
    # _live_pinned folds any tombstones physically: the rewrite keeps
    # only surviving vectors, then the mask is cleared from meta
    tomb_dir = meta.get("tombstones_dir")
    rows = _live_pinned(spark, index_dir, meta)
    w = rows.write.mode("overwrite")
    if part_cols:
        w = w.partitionBy(*part_cols)
    w.parquet(os.path.join(index_dir, new_dir))
    meta["data_dirs"] = [new_dir]
    meta["compact_gen"] = gen
    meta.pop("tombstones_dir", None)
    meta.pop("n_tombstones", None)
    _publish_meta(index_dir, meta)
    if tomb_dir:
        old.append(tomb_dir)
    for d in old:
        shutil.rmtree(os.path.join(index_dir, d), ignore_errors=True)
    return new_dir


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
    dim: int | None = None,
) -> DataFrame:
    """Scale path for embedding near-dup: BANDED sign-LSH (the MinHash
    band/OR construction on hyperplane signs).  Each band hashes the
    vector to the packed signs of ``n_planes`` hyperplanes; vectors
    sharing ANY band signature become candidates (explode bands ->
    (band, sig) equi-join — one shuffle, no cross join), then the exact
    cosine filters candidates.  Candidate probability for a pair at
    angle theta is 1-(1-(1-theta/pi)^planes)^bands — tune planes/bands
    to the threshold; recall < 1 by construction and is pytest-pinned
    vs the exact baseline.

    The exact-cosine verify runs INSIDE each (band, sig) bucket as a
    chunked BLAS matmul over the bucket's vectors: candidate pairs
    never materialize as rows, no per-pair join ships embedding arrays,
    and the only corpus exchange is the signature shuffle (one vector
    copy per band).  The earlier plan — explode candidates to (id_a,
    id_b) rows, join the embeddings back twice, score with interpreted
    ``aggregate`` expressions — moved ~2 vectors per candidate pair
    through a shuffle and paid a per-element lambda per dot product;
    with weak bands (``n_planes`` small, as a low threshold demands for
    recall) candidates approach all-pairs and that plan approached the
    O(n²) baseline it exists to avoid.  Per-bucket work is
    O(bucket_size²) either way, but as a dense matmul it is ~100x
    cheaper per pair, and the row-block chunking bounds task memory.
    At larger corpora raise ``n_planes``/``n_bands`` together so bucket
    sizes stay bounded while recall holds.

    Pass ``dim`` (the embedding width) to keep the operator a single
    job; the ``first()`` fallback schedules a tiny extra probe job."""
    if dim is None:
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
        "vec_id", "embedding", F.explode(F.array(*band_cols)).alias("bs")
    ).select(
        "vec_id", "embedding",
        F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"),
    )

    out_schema = "id_a long, id_b long, cos double"
    block = 4096  # rows per matmul chunk: bounds the score-block size

    def bucket_pairs(pdf):
        import pandas as pd

        ids = pdf["vec_id"].to_numpy(np.int64)
        n = ids.size
        if n < 2:
            return pd.DataFrame(
                {"id_a": [], "id_b": [], "cos": []}
            ).astype({"id_a": "int64", "id_b": "int64", "cos": "float64"})
        V = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1)
        out_a, out_b, out_c = [], [], []
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            S = (V[lo:hi] @ V.T) / np.outer(norms[lo:hi], norms)
            S = np.round(S, 4)
            # strict upper triangle in ROW ORDER (i < j positionally),
            # then canonicalize by vec_id so id_a < id_b
            ii, jj = np.nonzero(S >= threshold)
            keep = (ii + lo) < jj
            ii, jj = ii[keep], jj[keep]
            ia, ib = ids[ii + lo], ids[jj]
            out_a.append(np.minimum(ia, ib))
            out_b.append(np.maximum(ia, ib))
            out_c.append(S[ii, jj])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cos": np.concatenate(out_c),
            }
        )

    return (
        sigs.groupBy("band", "sig")
        .applyInPandas(bucket_pairs, out_schema)
        .distinct()  # a pair can match in several bands; copies identical
    )


# ---------------------------------------------------------------------------
# int8 scalar quantization (compressed ANN tier)
# ---------------------------------------------------------------------------
# Per-vector symmetric scalar quantization: s = max(|x_i|)/127 (guarded
# against the zero vector), q_i = floor(x_i/s + 0.5).  floor(+0.5) is
# half-up rounding expressed identically in Spark, DuckDB and numpy —
# F.round / SQL round() differ on negative halves across engines, floor
# does not.  For cosine the scales cancel (cos(q*s, q'*s') ==
# cos(q, q')), so the quantized score is the cosine of the integer
# codes; the scale still matters for storage (codes fit int8, 4x-8x
# smaller than float32) and is exported for audit.

def _int8_quantize_vec(vec) -> tuple[list[float], float]:
    """Driver-side twin of the engine quantization law (same op order,
    plain sequential float64 — no BLAS reassociation)."""
    xs = [float(v) for v in vec]
    s = max(max(abs(v) for v in xs), 1e-30) / 127.0
    import math

    return [math.floor(v / s + 0.5) for v in xs], s


def _int8_cols(e):
    """(qscale, q) column pair for an array<float> embedding column —
    all JVM-side higher-order functions, stays in whole-stage codegen."""
    s = (
        F.greatest(
            F.array_max(F.transform(e, lambda x: F.abs(x.cast("double")))),
            F.lit(1e-30),
        )
        / F.lit(127.0)
    )
    return s


def int8_ann_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10, exclude_id=None
) -> DataFrame:
    """Top-k by cosine over int8-quantized codes — the compressed ANN
    tier: at 10^12 vectors the code table is 4x smaller than float32
    (dim bytes/vector), scans proportionally faster, and the quantized
    scores rank within ~1e-3 of exact for unit-ish embeddings (recall
    pytest-pinned; :func:`int8_ann_topk_rerank` recovers the exact
    order).  One scan, no shuffle before the TakeOrderedAndProject.

    Returns (vec_id, label, qcos, qscale): the quantized cosine and the
    per-vector scale, both value-verified by a DuckDB oracle that
    recomputes the quantization law end to end."""
    qq, _ = _int8_quantize_vec(query_vec)
    # sequential left-fold norm: matches the engines' in-order sums
    acc = 0.0
    for v in qq:
        acc += v * v
    qn = acc ** 0.5
    d = emb
    if exclude_id is not None:
        d = d.filter(F.col("vec_id") != exclude_id)
    d = d.withColumn("qscale", _int8_cols(F.col("embedding")))
    d = d.withColumn(
        "q",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(
                x.cast("double") / F.col("qscale") + F.lit(0.5)
            ).cast("double"),
        ),
    )
    qcos = _dot(F.col("q"), _lit_vec(qq)) / (_norm(F.col("q")) * F.lit(qn))
    return (
        d.select(
            "vec_id",
            "label",
            F.round(qcos, 4).alias("qcos"),
            F.round("qscale", 6).alias("qscale"),
        )
        .orderBy(F.desc("qcos"), F.asc("vec_id"))
        .limit(k)
    )


def build_int8_code_table(emb: DataFrame, out_dir: str, dim: int) -> str:
    """Materialize the int8 codes: (vec_id, label, qscale, code binary)
    where ``code`` is the dim-byte packed int8 vector — the 4x-smaller
    coarse-scan tier (float32 dim*4 bytes -> dim bytes).  Quantization
    runs as the SAME JVM expression the on-the-fly path compiles
    (:func:`_int8_cols` + the floor law); only the byte packing is a
    build-time Arrow-batched pandas UDF.

    At 10^12 vectors the coarse scan reads ONLY this table — a quarter
    of the float IO — and the float embeddings are fetched for k*mult
    re-rank candidates, never scanned (pytest corrupts the float table
    on disk and the coarse query still answers).  ``meta.json`` is
    published last (crash-atomic, same contract as the LSH/IVF
    indexes)."""
    codes = _int8_rows(emb)
    data_dir = os.path.join(out_dir, "data")
    codes.write.mode("overwrite").parquet(data_dir)
    meta = {
        "kind": "int8_codes",
        "dim": dim,
        "columns": list(emb.columns),
        "schema": codes.schema.json(),
        "data_dirs": ["data"],
    }
    _publish_meta(out_dir, meta)
    return out_dir


def _int8_rows(emb: DataFrame) -> DataFrame:
    """(vec_id, label, qscale, code) — the shared quantize+pack
    transform: build and append must produce byte-identical codes for
    the same vector or appended generations would rank differently."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def pack(qs: pd.Series) -> pd.Series:
        return qs.map(lambda a: np.asarray(a, dtype=np.int8).tobytes())

    d = emb.withColumn("qscale", _int8_cols(F.col("embedding")))
    d = d.withColumn(
        "q",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(
                x.cast("double") / F.col("qscale") + F.lit(0.5)
            ).cast("double"),
        ),
    )
    return d.select(
        "vec_id", "label", "qscale", pack(F.col("q")).alias("code")
    )


def int8_ann_topk_indexed(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    exclude_id=None,
) -> DataFrame:
    """Coarse top-k served from the materialized code table — identical
    results to :func:`int8_ann_topk` (shared oracle): the int8 products
    and their partial sums are exact integers in float64 (< 2^53), so
    the Arrow-batched BLAS matmul here and the JVM left-fold there
    compute bit-identical scores in any summation order.

    One scan of the dim-bytes/vector code table, scored in numpy per
    Arrow batch, then a TakeOrderedAndProject of 4 narrow columns — no
    shuffle of codes or vectors, and the float table is never read."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    dim = int(meta["dim"])
    if len(query_vec) != dim:
        raise ValueError(f"query dim {len(query_vec)} != index dim {dim}")
    qq, _ = _int8_quantize_vec(query_vec)
    acc = 0.0
    for v in qq:
        acc += v * v
    qn = acc ** 0.5
    qarr = np.asarray(qq, dtype=np.float64)

    def score(it):
        for pdf in it:
            if not len(pdf):
                continue
            C = (
                np.frombuffer(b"".join(pdf["code"]), dtype=np.int8)
                .reshape(len(pdf), dim)
                .astype(np.float64)
            )
            dots = C @ qarr
            norms = np.sqrt((C * C).sum(axis=1))
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "qcos": np.round(dots / (norms * qn), 4),
                    "qscale": np.round(pdf["qscale"], 6),
                }
            )

    t = _live_pinned(spark, index_dir, meta)
    if exclude_id is not None:
        t = t.filter(F.col("vec_id") != exclude_id)
    # label keeps whatever type the source table had (pinned at build)
    label_t = t.schema["label"].dataType.simpleString()
    out = t.mapInPandas(
        score, f"vec_id long, label {label_t}, qcos double, qscale double"
    )
    return out.orderBy(F.desc("qcos"), F.asc("vec_id")).limit(k)


def int8_ann_topk_rerank_indexed(
    spark: SparkSession,
    index_dir: str,
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    mult: int = 4,
    exclude_id=None,
) -> DataFrame:
    """Two-tier serving off the materialized codes: coarse k*mult from
    the code table, exact float re-rank joins the embeddings for those
    candidates only (broadcast semi-join — the float table contributes
    k*mult point reads, not a scan)."""
    cand_ids = int8_ann_topk_indexed(
        spark, index_dir, query_vec, k * mult, exclude_id
    ).select("vec_id")
    cand = emb.join(F.broadcast(cand_ids), "vec_id", "left_semi")
    return cosine_topk(cand, query_vec, k, exclude_id)


def int8_ann_topk_rerank(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    mult: int = 4,
    exclude_id=None,
) -> DataFrame:
    """Two-tier serving: coarse top k*mult by quantized cosine (cheap
    int8 scan), exact float re-rank of that candidate set only — the
    standard compressed-index + refine pattern.  At scale the coarse
    tier reads only the code table; the float embeddings are fetched
    for k*mult rows, not the corpus."""
    cand_ids = int8_ann_topk(emb, query_vec, k * mult, exclude_id).select(
        "vec_id"
    )
    cand = emb.join(F.broadcast(cand_ids), "vec_id", "left_semi")
    return cosine_topk(cand, query_vec, k, exclude_id)


# ---------------------------------------------------------------------------
# random-projection (Johnson-Lindenstrauss) compressed tier
# ---------------------------------------------------------------------------

def rp_planes(dim: int, out_dim: int, seed: int = 11) -> np.ndarray:
    """Deterministic sign-matrix projection (Achlioptas 2001): entries
    +-1/sqrt(out_dim) — with out_dim a power of two the scale is
    exactly representable, so every projected coordinate is a sum of
    exactly-scaled float32 values and the SQL twin (literal plane
    arrays into ``list_dot_product``) reproduces the doubles."""
    rng = np.random.RandomState(seed)
    signs = rng.randint(0, 2, size=(out_dim, dim)) * 2 - 1
    return signs.astype(np.float64) / np.sqrt(float(out_dim))


def rp_project_col(planes: np.ndarray, vec_col: str = "embedding"):
    """array<double> column of per-plane dot products (JVM fold in
    array order, mirrored by the oracle's list_dot_product)."""
    return F.array(
        *[_dot(F.col(vec_col), _lit_vec(p)) for p in planes]
    )


def rp_project_vec(planes: np.ndarray, vec: list[float]) -> list[float]:
    """Driver-side projection of the query vector with a SEQUENTIAL
    fold per plane — same accumulation order as the engine/oracle
    folds, so all three agree bit-for-bit (np.dot's pairwise/BLAS
    order would not)."""
    out = []
    for p in planes:
        acc = 0.0
        for a, b in zip(vec, p):
            acc += float(a) * float(b)
        out.append(acc)
    return out


def rp_ann_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    out_dim: int = 16,
    seed: int = 11,
    dim: int = 64,
    exclude_id=None,
) -> DataFrame:
    """Top-k by cosine in the PROJECTED space — the JL compressed
    tier: a dim->out_dim sign projection preserves angles to
    O(1/sqrt(out_dim)), so the coarse ranking runs on vectors 4x
    smaller (here 64->16) before any exact re-rank a caller adds
    (same coarse/re-rank split as the int8 tier; combine both for
    16x cheaper scans).  Recall vs exact cosine is pytest-pinned and
    driver-evaluated (`rp_recall`).

    Scale shape: the projection is k_out literal-coefficient dot
    products in whole-stage codegen — at 10^12 vectors materialize it
    once with the same versioned-dir + atomic-meta contract as
    build_int8_code_table and scan only the code table."""
    planes = rp_planes(dim, out_dim, seed)
    qp = rp_project_vec(planes, query_vec)
    qn = float(np.sqrt(sum(x * x for x in qp)))
    proj = rp_project_col(planes)
    cos = _dot(proj, _lit_vec(qp)) / (_norm(proj) * F.lit(qn))
    s = emb.select("vec_id", F.round(cos, 4).alias("cos"))
    if exclude_id is not None:
        s = s.filter(F.col("vec_id") != exclude_id)
    return s.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def rp_ann_topk_rerank(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    out_dim: int = 32,
    cand_k: int = 50,
    seed: int = 11,
    dim: int = 64,
    exclude_id=None,
) -> DataFrame:
    """Coarse-then-exact over the JL tier: top ``cand_k`` in the
    projected space, exact-cosine re-rank of those candidates only —
    the production shape (the pure projected ranking,
    :func:`rp_ann_topk`, reshuffles near-ties because sign-JL
    distortion is ~1/sqrt(out_dim), larger than the neighbor gaps on
    a weakly clustered corpus; the re-rank pays exact cost on cand_k
    rows, not the corpus).  Recall@k vs brute force is what
    `rp_recall` monitors — it is a DATA property (gap vs distortion),
    which is exactly why the monitor query exists.

    The candidate list is tiny, so the re-rank join broadcasts it
    into the embeddings scan; at 10^12 vectors the coarse pass
    reads a materialized projection table 2x (out_dim=32) to 4x
    (16) smaller than the corpus, same versioned-dir contract as
    build_int8_code_table."""
    cand = rp_ann_topk(
        emb, query_vec, cand_k, out_dim, seed, dim, exclude_id
    ).select("vec_id")
    pruned = emb.join(F.broadcast(cand), "vec_id")
    return cosine_topk(pruned, query_vec, k, exclude_id=exclude_id)
