"""KMV distinct estimation + priority sampling (operators/sketches.py)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tse_spark.operators import sketches as sk

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_kmv_partitioning_independent(spark, docs):
    """The estimate depends only on the global k smallest distinct
    hashes — any repartitioning must give the identical row."""
    a = sk.kmv_distinct(docs.repartition(1), "text", 64).collect()[0]
    b = sk.kmv_distinct(docs.repartition(13), "text", 64).collect()[0]
    assert a.asDict() == b.asDict()


def test_kmv_exact_below_k(spark, docs):
    """Fewer distinct values than k -> the sketch saw everything and
    the estimate IS the exact count."""
    small = docs.limit(40)
    row = sk.kmv_distinct(small, "text", 128).collect()[0]
    assert row.k_used == row.exact_distinct == row.est_distinct == 40
    assert row.rel_err == 0.0


def test_kmv_estimate_within_tolerance(docs):
    """k=128 -> relative error stddev ~ 1/sqrt(k-2) ~ 9%; assert a
    generous 4-sigma band so the law (not luck) is what's tested."""
    row = sk.kmv_distinct(docs, "text", 128).collect()[0]
    assert row.exact_distinct == 500
    assert abs(row.rel_err) < 0.36


def test_kmv_matches_numpy_twin(docs):
    """est = (k-1) * 2^60 / (k-th smallest distinct hash), half-up."""
    pdf = docs.select("text").toPandas()
    import hashlib

    hs = np.unique(
        [
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            for t in pdf["text"]
        ]
    )
    k = 128
    hk = np.sort(hs)[k - 1]
    want = int(np.floor((k - 1) * float(1 << 60) / hk + 0.5))
    row = sk.kmv_distinct(docs, "text", k).collect()[0]
    assert row.kth_hash == int(hk)
    assert row.est_distinct == want


def test_priority_sample_partitioning_independent(docs):
    a = sk.priority_sample(
        docs.repartition(1), "doc_id", F.octet_length("text"), 10
    ).toPandas().sort_values("id").reset_index(drop=True)
    b = sk.priority_sample(
        docs.repartition(17), "doc_id", F.octet_length("text"), 10
    ).toPandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_priority_sample_tau_law(docs):
    """The sample is the top-k by q = w/u and every estimate is
    max(w, tau) with tau the (k+1)-th priority — numpy twin."""
    import hashlib

    pdf = docs.select("doc_id", F.octet_length("text").alias("w")).toPandas()
    u = np.array(
        [
            (int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) + 1)
            / float(1 << 60)
            for i in pdf["doc_id"]
        ]
    )
    q = pdf["w"].to_numpy().astype(np.float64) / u
    order = np.lexsort((pdf["doc_id"].to_numpy(), -q))
    k = 20
    tau = q[order[k]]
    want_ids = set(pdf["doc_id"].to_numpy()[order[:k]].tolist())
    got = sk.priority_sample(
        docs, "doc_id", F.octet_length("text"), k
    ).toPandas()
    assert set(got["id"]) == want_ids
    for _, r in got.iterrows():
        assert r["est_w"] == round(max(r["w"], tau), 4)


def test_priority_sample_whole_table_keeps_raw_weights(spark):
    """k >= n: everything sampled, tau = 0, est_w == w (the estimator
    degrades to the exact subset sum)."""
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "w": [10, 20, 30]})
    df = spark.createDataFrame(pdf)
    got = sk.priority_sample(df, "doc_id", F.col("w"), 5).toPandas()
    assert len(got) == 3
    assert (got["est_w"] == got["w"]).all()


def test_priority_sample_unbiased_over_hash_salts(spark):
    """Horvitz-Thompson property, demonstrated across 30 independent
    draws (salting the id changes the hash draw): the mean of
    sum(est_w) approaches the true total weight."""
    rng = np.random.RandomState(5)
    n = 200
    w = rng.randint(1, 50, size=n)
    pdf = pd.DataFrame({"base_id": range(n), "w": w})
    df = spark.createDataFrame(pdf)
    total = float(w.sum())
    ests = []
    for salt in range(30):
        salted = df.select(
            F.concat(F.lit(f"s{salt}:"), F.col("base_id")).alias("doc_id"),
            "w",
        )
        got = sk.priority_sample(salted, "doc_id", F.col("w"), 16)
        ests.append(got.agg(F.sum("est_w")).collect()[0][0])
    mean = float(np.mean(ests))
    assert abs(mean - total) / total < 0.15


def test_cms_estimates_one_sided_and_tight(spark, docs):
    """CMS law: est >= exact for every queried term; with 31 terms in
    4x256 cells collisions are rare, so most estimates are exact."""
    from tse_spark.operators import index_build as ib
    from pyspark.sql import functions as F2

    toks = ib.ws_token_stream(docs)
    exact = (
        toks.groupBy("term")
        .agg(F2.count(F2.lit(1)).alias("exact_n"))
    )
    sketch = sk.cms_sketch(toks, 4, 256)
    est = sk.cms_estimates(sketch, exact.select("term"), 4, 256)
    j = exact.join(est, "term").collect()
    assert len(j) == 30
    assert all(r.est_n >= r.exact_n for r in j)
    assert sum(1 for r in j if r.est_n == r.exact_n) >= 25


def test_cms_sketch_mass_conservation(spark, docs):
    """Every row of the sketch sums to the total occurrence count
    (each occurrence lands in exactly one bucket per row)."""
    from tse_spark.operators import index_build as ib
    from pyspark.sql import functions as F2

    toks = ib.ws_token_stream(docs)
    total = toks.count()
    per_row = (
        sk.cms_sketch(toks, 4, 256)
        .groupBy("row_j")
        .agg(F2.sum("n").alias("mass"))
        .collect()
    )
    assert len(per_row) == 4
    assert all(r.mass == total for r in per_row)


def test_bloom_no_false_negatives_and_bounded(spark):
    from tse_spark.operators import sketches as sk

    seen = spark.createDataFrame(
        [(f"http://ex.com/{i}",) for i in range(200)], "url string"
    )
    bloom = sk.bloom_build(seen, m_bits=4096, k_hashes=4)
    rows = bloom.collect()
    # bounded: at most m/32 words, every mask a positive 32-bit value
    assert len(rows) <= 4096 // 32
    assert all(0 < r["bits"] < (1 << 32) for r in rows)
    probes = spark.createDataFrame(
        [(f"http://ex.com/{i}",) for i in range(250)], "url string"
    )
    out = {
        r["url"]: r["in_bloom"]
        for r in sk.bloom_contains(
            probes, bloom, m_bits=4096, k_hashes=4
        ).collect()
    }
    # one-sided: every inserted key answers present
    for i in range(200):
        assert out[f"http://ex.com/{i}"] == 1
    # the 50 novel keys are mostly absent (fp rate ~(800/4096)^4)
    novel_hits = sum(out[f"http://ex.com/{i}"] for i in range(200, 250))
    assert novel_hits <= 3


def test_bloom_merge_is_bitwise_or(spark):
    from pyspark.sql import functions as F
    from tse_spark.operators import sketches as sk

    a = spark.createDataFrame([("a1",), ("a2",)], "url string")
    b = spark.createDataFrame([("b1",), ("b2",)], "url string")
    merged = (
        sk.bloom_build(a).unionAll(sk.bloom_build(b))
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    direct = sk.bloom_build(a.unionAll(b))
    got = {(r["word_idx"], r["bits"]) for r in merged.collect()}
    want = {(r["word_idx"], r["bits"]) for r in direct.collect()}
    assert got == want
