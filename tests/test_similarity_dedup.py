"""Embedding near-dup operators: exact baseline vs numpy oracle, and
LSH-bucketed recall pinned against the exact pairs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tse_spark.operators import similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def np_pairs(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = m @ m.T
    out = {}
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            a, b = int(ids[i]), int(ids[j])
            key = (min(a, b), max(a, b))
            out[key] = round(float(cos[i, j]), 4)
    return out


def test_exact_neardup_matches_numpy(emb, np_pairs):
    got = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in similarity.cosine_neardup_pairs(emb, 0.35).collect()
    }
    want = {k: v for k, v in np_pairs.items() if v >= 0.35}
    assert set(got) == set(want)
    for k in got:
        assert got[k] == pytest.approx(want[k], abs=2e-4)


def test_lsh_neardup_subset_and_recall(emb, np_pairs):
    exact = {k for k, v in np_pairs.items() if v >= 0.35}
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.lsh_neardup_pairs(
            emb, 0.35, n_planes=2, n_bands=8
        ).collect()
    }
    # candidates are a SUBSET of the exact pairs (filter is exact cosine)
    assert got <= exact
    # banded OR-construction: p(candidate) = 1-(1-(1-theta/pi)^2)^8,
    # ~0.95+ at the 0.35-cosine threshold on this fixture
    if exact:
        recall = len(got) / len(exact)
        assert recall >= 0.7, f"recall {recall:.2f} over {len(exact)} pairs"


def test_lsh_ann_topk_recall(spark, emb):
    """Multi-probe banded ANN recall@10 vs brute force, at the same
    planes/bands config as the near-dup path (VERDICT r1 #6)."""
    qv = similarity.get_query_vec(emb, 0)
    brute = [
        r["vec_id"]
        for r in similarity.cosine_topk(emb, qv, 10, exclude_id=0).collect()
    ]
    ann = [
        r["vec_id"]
        for r in similarity.lsh_ann_topk(
            spark, emb.filter(F.col("vec_id") != 0), qv, 10,
            n_planes=2, n_bands=8,
        ).collect()
    ]
    recall = len(set(brute) & set(ann)) / len(brute)
    assert recall >= 0.9, f"recall@10 {recall:.2f} (brute {brute}, ann {ann})"


def test_ivf_assign_matches_numpy(emb):
    """Cell assignment = argmax cosine vs seed centroids, ties to the
    lowest cell id — checked row-for-row against a numpy recompute."""
    cents = similarity.seed_centroids(emb, 8)
    c = np.array(cents, dtype=np.float64)
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    rows = similarity.ivf_assign(emb, cents).select(
        "vec_id", "embedding", "cell"
    ).collect()
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        cos = c @ (v / np.linalg.norm(v))
        expect = int(np.flatnonzero(cos == cos.max())[0])
        assert r["cell"] == expect, (r["vec_id"], r["cell"], expect)


def test_ivf_ann_topk_recall(emb):
    """IVF recall@10 vs brute force at n_probe=2 of 8 cells; also the
    approximation the driver oracle recomputes exactly in SQL."""
    qv = similarity.get_query_vec(emb, 0)
    brute = [
        r["vec_id"]
        for r in similarity.cosine_topk(emb, qv, 10, exclude_id=0).collect()
    ]
    ann = [
        r["vec_id"]
        for r in similarity.ivf_ann_topk(
            emb, qv, 10, n_cells=8, n_probe=2, exclude_id=0
        ).collect()
    ]
    recall = len(set(brute) & set(ann)) / len(brute)
    assert recall >= 0.5, f"recall@10 {recall:.2f} (brute {brute}, ivf {ann})"


def test_tf_cosine_pairs_laws(spark):
    """tf_cosine_pairs: identical docs hit cos 1.0, disjoint docs pair
    nothing, and the df cap drops hot terms from BOTH dot and norms
    (self-consistent subspace — the jaccard-cap lesson)."""
    from tse_spark.operators import dedup

    tf = spark.createDataFrame(
        [
            # docs 1 and 2 identical over {aa, bb}; doc 3 disjoint;
            # 'hot' appears in every doc (df 4 > cap)
            (1, "aa", 2), (1, "bb", 1), (1, "hot", 9),
            (2, "aa", 2), (2, "bb", 1), (2, "hot", 1),
            (3, "cc", 5), (3, "hot", 2),
            (4, "aa", 1), (4, "hot", 3),
        ],
        "doc_id long, term string, tf long",
    )
    out = {
        (r["doc_a"], r["doc_b"]): (r["dot"], r["cos"])
        for r in dedup.tf_cosine_pairs(tf, max_term_df=3).collect()
    }
    assert out[(1, 2)] == (5, 1.0)          # identical capped vectors
    assert (1, 3) not in out and (2, 3) not in out  # disjoint
    # (1,4) share only 'aa': dot 2*1, norms sqrt(5)*sqrt(1)
    dot, cos = out[(1, 4)]
    assert dot == 2
    assert cos == round(2 / (5 ** 0.5 * 1), 6)
    # without the cap, 'hot' would have paired 3 with everyone
    full = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.tf_cosine_pairs(tf).collect()
    }
    assert (1, 3) in full


def test_dup_span_mask_masks_cross_doc_spans_only(spark):
    from tse_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h unique1 tail1"),
            (2, "x y a b c d e f g h other"),
            # within-doc repetition is NOT a cross-doc duplicate
            (3, "p q r s t p q r s t p q r s t"),
            (4, ""),
            (5, "short doc"),
        ],
        "doc_id long, text string",
    )
    for mode in ("xxhash64", "md5"):
        out = {
            r["doc_id"]: r
            for r in dd.dup_span_mask(docs, n=5, hash_fn=mode).collect()
        }
        # the shared 8-token span a..h masks fully in both docs
        assert out[1]["clean_text"] == "unique1 tail1"
        assert out[1]["n_masked"] == 8
        assert out[2]["clean_text"] == "x y other"
        assert out[2]["dup_ratio"] == round(8 / 11, 4)
        # self-repetition survives: the law is cross-document
        assert out[3]["n_masked"] == 0
        assert out[3]["clean_text"].startswith("p q r s t")
        # short/empty docs pass through unmasked
        assert out[4] ["n_tokens"] == 0 and out[4]["clean_text"] == ""
        assert out[5]["n_masked"] == 0 and out[5]["clean_text"] == "short doc"


def test_dup_span_mask_partial_overlap(spark):
    from tse_spark.operators import dedup as dd

    # spans overlap by 6 tokens (c..h): with n=5, every position inside
    # the shared 6-token run is covered; the flanks survive
    docs = spark.createDataFrame(
        [
            (1, "a1 a2 c d e f g h z1 z2"),
            (2, "b1 c d e f g h b2 b3 b4"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dd.dup_span_mask(docs, n=5).collect()
    }
    assert out[1]["clean_text"] == "a1 a2 z1 z2"
    assert out[2]["clean_text"] == "b1 b2 b3 b4"


def test_winnowing_shared_run_guarantee(spark):
    """Schleimer et al.'s theorem: any shared token run of w+k-1
    tokens is guaranteed to produce a shared fingerprint."""
    from tse_spark.operators import dedup as dd

    k, w = 4, 5  # guarantee threshold: 8 shared tokens
    shared = "q1 q2 q3 q4 q5 q6 q7 q8"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"x1 x2 x3 {shared} y1"),
            (3, "completely unrelated content with nothing common"),
        ],
        "doc_id long, text string",
    )
    fps = dd.winnow_fingerprints(docs, k=k, w=w)
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in dd.winnow_pairs(fps, min_shared=1).collect()
    }
    assert (1, 2) in pairs  # the guarantee
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_winnowing_is_local_survives_block_swap(spark):
    """Reordering blocks preserves local fingerprints — the property
    that distinguishes winnowing from the global MinHash/SimHash."""
    from tse_spark.operators import dedup as dd

    a = "b1 b2 b3 b4 b5 b6 b7 b8 c1 c2 c3 c4 c5 c6 c7 c8"
    b = "c1 c2 c3 c4 c5 c6 c7 c8 b1 b2 b3 b4 b5 b6 b7 b8"
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    fps = dd.winnow_fingerprints(docs, k=4, w=5)
    rows = fps.collect()
    s1 = {r["fp"] for r in rows if r["doc_id"] == 1}
    s2 = {r["fp"] for r in rows if r["doc_id"] == 2}
    # each 8-token block exceeds the w+k-1 guarantee, so both blocks
    # contribute shared fingerprints despite the swap
    assert len(s1 & s2) >= 2


def test_winnowing_short_doc_ragged_window(spark):
    from tse_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5"), (2, "t1 t2 t3")],
        "doc_id long, text string",
    )
    rows = dd.winnow_fingerprints(docs, k=4, w=5).collect()
    # doc 1 has 2 k-grams (< w): exactly one ragged-window fingerprint
    assert len([r for r in rows if r["doc_id"] == 1]) == 1
    # doc 2 is shorter than k: no fingerprints at all
    assert not [r for r in rows if r["doc_id"] == 2]


def test_incremental_neardup_vs_corpus(spark):
    from tse_spark.operators import dedup as dd

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different corpus content about spark jobs"),
            (3, "another unrelated document in the historical set"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            # near-identical to corpus doc 1
            (100, "the quick brown fox jumps over the lazy dog now"),
            (101, "entirely novel text never seen before anywhere"),
        ],
        "doc_id long, text string",
    )
    m = dd.neardup_vs_corpus(new, corpus, min_jaccard=0.3).collect()
    assert {(r["new_id"], r["corpus_id"]) for r in m} == {(100, 1)}
    novel = dd.novel_docs(
        new, dd.neardup_vs_corpus(new, corpus, min_jaccard=0.3)
    ).collect()
    assert {r["doc_id"] for r in novel} == {101}


def test_incremental_neardup_broadcasts_batch_side(spark):
    from tse_spark.operators import dedup as dd

    corpus = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("w"), (F.col("id") % 9).cast("string"),
            F.lit(" x y z a b c")
        ).alias("text"),
    )
    new = corpus.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    df = dd.neardup_vs_corpus(new, corpus, min_jaccard=0.1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the candidate join must broadcast the (banded) BATCH side and the
    # corpus shingle recompute must be a semi-join on candidate ids —
    # the corpus is never exchanged pairwise
    assert "BroadcastHashJoin" in plan
    assert plan.count("LeftSemi") >= 1
    assert df.count() > 0


def test_rp_projection_preserves_neighbors(spark, emb):
    """JL tier: recall@10 of the 64->16 sign projection vs exact
    cosine stays useful (the tradeoff the rp_recall query monitors),
    and the projected query vector matches a sequential-fold numpy
    twin exactly."""
    import numpy as np

    from tse_spark.operators import similarity as sim

    qv = sim.get_query_vec(emb, 0)
    planes = sim.rp_planes(64, 16, 11)
    qp = sim.rp_project_vec(planes, qv)
    # sequential-fold twin (same order as the operator's loop)
    want = []
    for p in planes:
        acc = 0.0
        for a, b in zip(qv, p):
            acc += float(a) * float(b)
        want.append(acc)
    assert qp == want
    # the rerank contract: result == exact cosine top-k RESTRICTED to
    # the coarse projected candidate set (deterministic, data-free)
    cand = {
        r.vec_id
        for r in sim.rp_ann_topk(emb, qv, 30, 32, 11, 64, exclude_id=0)
        .collect()
    }
    got = sim.rp_ann_topk_rerank(
        emb, qv, 10, 32, 30, 11, 64, exclude_id=0
    ).collect()
    assert {r.vec_id for r in got} <= cand
    exact_all = {
        r.vec_id: r.cos
        for r in sim.cosine_scores(emb, qv).collect()
    }
    want_ids = sorted(
        (i for i in cand),
        key=lambda i: (-exact_all[i], i),
    )[:10]
    assert [r.vec_id for r in got] == want_ids
    assert all(r.cos == exact_all[r.vec_id] for r in got)


def test_mirror_hosts_containment_and_cap(spark):
    """Hand-built mirror law: host b mirrors 2 of a's 4 pages
    (overlap = 2/2 = 1.0 by containment — min side is b); host c
    shares 1 of its 5 with a (0.2 < 0.5, filtered); a fingerprint on
    EVERY host is hot-capped out and must not create pairs, but still
    counts toward host sizes."""
    from tse_spark.operators import dedup

    rows = []
    for i in range(4):
        rows.append((f"http://a.example/p{i}", f"content-{i}"))
    rows += [
        ("http://b.example/x0", "content-0"),
        ("http://b.example/x1", "content-1"),
        ("http://c.example/y0", "content-3"),
        ("http://c.example/y1", "other-1"),
        ("http://c.example/y2", "other-2"),
        ("http://c.example/y3", "other-3"),
    ]
    # boilerplate shell on all three hosts -> hot at cap 2
    rows += [
        ("http://a.example/empty", "shell"),
        ("http://b.example/empty", "shell"),
        ("http://c.example/empty", "shell"),
    ]
    pages = spark.createDataFrame(rows, "url string, text string")
    got = {
        (r.host_a, r.host_b): r
        for r in dedup.mirror_hosts(pages, max_fp_hosts=2).collect()
    }
    assert set(got) == {("a.example", "b.example")}
    r = got[("a.example", "b.example")]
    # sizes include the capped shell fingerprint (5 and 3), shared
    # counts only cold fingerprints (2)
    assert (r.shared, r.size_a, r.size_b) == (2, 5, 3)
    assert r.overlap == round(2 / 3, 6)
