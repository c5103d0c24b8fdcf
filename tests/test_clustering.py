"""K-means + SemDeDup conformance (operators/clustering.py).

Pins the Lloyd laws against an independent numpy twin (seeding,
argmin assignment, fixed-point update, empty-cell carryover) and the
SemDeDup drop law against a brute-force pair sweep.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tse_spark.operators import clustering as cl

SF = "/root/testdata/sf0.001"
K, ITERS, DIM = 4, 2, 64
FP = float(cl.FP_SCALE)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    order = np.argsort(ids)
    mat = np.array(
        [[float(x) for x in rows[i].embedding] for i in order],
        dtype=np.float64,
    )
    return ids[order], mat


def _np_assign(mat, cents):
    c = np.asarray(cents)
    d = (
        (mat * mat).sum(axis=1)[:, None]
        - 2.0 * mat @ c.T
        + (c * c).sum(axis=1)[None, :]
    )
    # ties to the lowest cell id — argmin already picks the first min
    return d.argmin(axis=1)


def _np_update(mat, assign, cents):
    out = [list(c) for c in cents]
    q = np.floor(mat * FP + 0.5).astype(np.int64)
    for cell in range(len(cents)):
        m = assign == cell
        if m.any():
            out[cell] = list(q[m].sum(axis=0) / (FP * m.sum()))
    return out


def _np_kmeans(ids, mat, k, iters):
    cents = [list(mat[np.where(ids == i)[0][0]]) for i in range(k)]
    for _ in range(iters):
        assign = _np_assign(mat, cents)
        cents = _np_update(mat, assign, cents)
    return cents, _np_assign(mat, cents)


def test_assignment_matches_numpy_twin(emb, emb_np):
    ids, mat = emb_np
    _, want = _np_kmeans(ids, mat, K, ITERS)
    got = {
        r.vec_id: r.cell
        for r in cl.kmeans_clusters(emb, K, ITERS, DIM).collect()
    }
    assert got == {int(i): int(c) for i, c in zip(ids, want)}


def test_centroids_match_numpy_twin_exactly(emb, emb_np):
    """The fixed-point update makes centroids ORDER-INDEPENDENT: the
    distributed sums must equal the numpy twin bit-for-bit."""
    ids, mat = emb_np
    want, _ = _np_kmeans(ids, mat, K, ITERS)
    got = cl.kmeans_train(emb, K, ITERS, DIM)
    assert got == [list(map(float, c)) for c in want]


def test_inertia_non_increasing(emb):
    """Lloyd guarantee: mean squared distance never goes up with more
    iterations (given the same seeds)."""
    def inertia(iters):
        rep = cl.kmeans_report(emb, K, iters, DIM).collect()
        n = sum(r.n_vectors for r in rep)
        return sum(r.mean_sq_dist * r.n_vectors for r in rep) / n

    i1, i2, i3 = inertia(0), inertia(1), inertia(2)
    assert i2 <= i1 + 1e-9 and i3 <= i2 + 1e-9


def test_empty_cell_keeps_previous_centroid(spark):
    """A cell no vector is assigned to must survive the update
    unchanged (the carryover branch of kmeans_update)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "vec_id": [0, 1, 2],
            "embedding": [[1.0, 0.0], [0.5, 0.0], [0.75, 0.0]],
            "cell": [0, 0, 0],  # nothing lands in cell 1
        }
    )
    df = spark.createDataFrame(pdf)
    cents = cl.kmeans_update(df, [[0.0, 0.0], [5.0, 5.0]], dim=2)
    assert cents[1] == [5.0, 5.0]
    assert cents[0] == [0.75, 0.0]  # exact fixed-point mean


def test_semantic_dedup_drop_law(emb, emb_np):
    """kept=false iff a lower-id same-cell neighbor has
    round(cos,4) >= tau — brute-force sweep twin."""
    tau = 0.3
    ids, mat = emb_np
    _, assign = _np_kmeans(ids, mat, K, ITERS)
    norms = np.sqrt((mat * mat).sum(axis=1))
    cos = (mat @ mat.T) / np.outer(norms, norms)
    dropped = set()
    n = len(ids)
    for b in range(n):
        for a in range(b):
            if assign[a] == assign[b] and round(cos[a, b], 4) >= tau:
                dropped.add(int(ids[b]))
                break
    got = cl.semantic_dedup(emb, K, ITERS, DIM, tau).collect()
    assert {r.vec_id for r in got} == set(int(i) for i in ids)
    assert {r.vec_id for r in got if not r.kept} == dropped
    # and the cell column is the trained assignment
    assert {r.vec_id: r.cell for r in got} == {
        int(i): int(c) for i, c in zip(ids, assign)
    }


def test_semdedup_plan_has_no_cartesian(emb):
    """The pair search must be an equi-join on cell, never a cross
    join of the corpus."""
    plan = cl.semantic_dedup(emb, K, 1, DIM)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
