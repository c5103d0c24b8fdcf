"""Linear-probe GD training conformance (operators/probe.py)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tse_spark.operators import probe

SF = "/root/testdata/sf0.001"
FP = float(probe.FP_SCALE)


@pytest.fixture(scope="module")
def feats(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return probe.quality_features(docs).cache()


def _np_train(X, y, iters, lr):
    """Independent twin of probe_train with the same fixed-point law."""
    w = np.zeros(X.shape[1])
    n = len(y)
    for _ in range(iters):
        resid = X @ w - y
        g = np.array(
            [
                np.floor(X[:, d] * resid * FP + 0.5).astype(np.int64).sum()
                / (FP * n)
                for d in range(X.shape[1])
            ]
        )
        w = w - lr * 2.0 * g
    return w


def _np_feats(feats):
    pdf = feats.toPandas().sort_values("doc_id")
    X = np.column_stack(
        [np.ones(len(pdf)), pdf.x1.to_numpy(), pdf.x2.to_numpy(),
         pdf.x3.to_numpy()]
    )
    return X, pdf.y.to_numpy().astype(np.float64)


def test_weights_match_numpy_twin_exactly(feats):
    X, y = _np_feats(feats)
    want = _np_train(X, y, 3, 0.25)
    got = probe.probe_train(feats, 3, 0.25)
    # the fixed-point gradient makes this EXACT, not approximate
    assert got == list(want)


def test_weights_partitioning_independent(spark, feats):
    a = probe.probe_train(feats.repartition(1), 3, 0.25)
    b = probe.probe_train(feats.repartition(11), 3, 0.25)
    assert a == b


def test_gd_learns_separable_rule(spark):
    """On linearly separable data the probe must actually learn:
    y = 1 iff x1 > 0.5, trained long enough, classifies the training
    set well above chance."""
    rng = np.random.RandomState(3)
    x1 = rng.uniform(0, 1, 400)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(400),
            "x1": x1,
            "x2": rng.uniform(0, 1, 400),
            "x3": rng.uniform(0, 1, 400),
            "y": (x1 > 0.5).astype(np.float64),
        }
    )
    feats = spark.createDataFrame(pdf)
    w = probe.probe_train(feats, 60, 0.25)
    scored = probe.probe_scores(feats, w).toPandas()
    acc = scored.correct.mean()
    assert acc > 0.9
    # and the learned slope points the right way
    assert w[1] > 0


def test_scores_threshold_consistency(feats):
    w = probe.probe_train(feats, 3, 0.25)
    got = probe.probe_scores(feats, w).toPandas()
    assert ((got.score >= 0.5) == got.keep).all()


def test_single_aggregate_per_iteration(feats):
    """The gradient is ONE full-scan aggregate — no joins, no extra
    shuffles beyond the final 1-row agg exchange."""
    resid = probe._pred([0.0, 0.0, 0.0, 0.0]) - F.col("y")
    aggs = [
        F.sum(
            F.floor(F.col(c) * resid * FP + 0.5).cast("long")
        ).alias(c)
        for c in ("x1", "x2", "x3")
    ]
    plan = feats.agg(*aggs)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
