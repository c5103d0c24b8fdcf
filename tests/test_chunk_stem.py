"""Document chunking + S-stemmer + auto-stopwords conformance."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tse_spark.operators import textops

SF = "/root/testdata/sf0.001"


def s_stem_py(t: str) -> str:
    """Independent pure-Python twin of textops.s_stem_expr."""
    if len(t) > 3 and t.endswith("ies"):
        return t if t.endswith(("eies", "aies")) else t[:-3] + "y"
    if len(t) > 3 and t.endswith("es"):
        return t if t.endswith(("aes", "ees", "oes")) else t[:-1]
    if len(t) > 3 and t.endswith("s"):
        return t if t.endswith(("us", "ss")) else t[:-1]
    return t


GOLDEN = {
    "queries": "query",
    "tables": "table",
    "keys": "key",
    "rows": "row",
    "trees": "trees",      # -ees exception
    "shoes": "shoes",      # -oes exception
    "aies": "aies",        # -aies exception (and len 4)
    "bodies": "body",
    "glass": "glass",      # -ss exception
    "virus": "virus",      # -us exception
    "gas": "gas",          # too short
    "is": "is",
    "data": "data",
}


def test_s_stem_golden(spark):
    pdf = pd.DataFrame({"t": list(GOLDEN)})
    got = {
        r.t: r.s
        for r in spark.createDataFrame(pdf)
        .select("t", textops.s_stem_expr("t").alias("s"))
        .collect()
    }
    assert got == GOLDEN
    assert {t: s_stem_py(t) for t in GOLDEN} == GOLDEN


def test_stemmed_tf_merges_inflections(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 0, 0, 1],
            "term": ["query", "queries", "table", "tables"],
            "tf": [2, 3, 1, 4],
        }
    )
    got = {
        (r.doc_id, r.term): r.tf
        for r in textops.stemmed_tf(spark.createDataFrame(pdf)).collect()
    }
    assert got == {(0, "query"): 5, (0, "table"): 1, (1, "table"): 4}


def test_chunk_documents_law(spark):
    """Each chunk equals tokens[start : start+n_tok]; starts follow
    the stride law; every token is covered; no chunk is fully inside
    the previous window."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    chunk_tokens, overlap, stride = 16, 4, 12
    got = textops.chunk_documents(docs, chunk_tokens, overlap).toPandas()
    texts = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, toks in (
        (d, [t for t in txt.lower().split() if t]) for d, txt in texts.items()
    ):
        rows = got[got.doc_id == doc_id].sort_values("chunk_id")
        n = len(toks)
        want_starts = [
            s for s in range(0, n, stride) if s == 0 or s < n - overlap
        ]
        assert list(rows.start_tok) == want_starts
        assert list(rows.chunk_id) == list(range(len(want_starts)))
        covered = set()
        for _, r in rows.iterrows():
            window = toks[r.start_tok : r.start_tok + chunk_tokens]
            assert r.chunk_text == " ".join(window)
            assert r.n_tok == len(window)
            covered.update(range(r.start_tok, r.start_tok + len(window)))
        assert covered == set(range(n))


def test_chunk_no_shuffle(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = textops.chunk_documents(docs)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_rejects_bad_overlap(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError):
        textops.chunk_documents(docs, 16, 16)


def test_auto_stopwords_threshold_exact(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3] * 2,
            "term": ["hot"] * 4 + ["warm", "warm", "warm", "cold"],
            "tf": [1] * 8,
        }
    )
    tf = spark.createDataFrame(pdf)
    got = {
        r.term: (r.df, r.doc_frac)
        for r in textops.auto_stopwords(tf, 4, 0.75).collect()
    }
    # hot: 4/4, warm: 3/4 == exactly the threshold -> included
    assert got == {"hot": (4, 1.0), "warm": (3, 0.75)}


def test_mmr_rerank_greedy_law():
    """Hand-checkable greedy: near-duplicate top results get demoted
    in favor of a diverse lower-scored one."""
    from tse_spark.operators.textops import mmr_rerank_py

    rel = {1: 1.0, 2: 0.99, 3: 0.7, 4: 0.1}
    sims = {(1, 2): 1.0, (1, 3): 0.0, (2, 3): 0.0, (1, 4): 0.0}
    out = mmr_rerank_py(rel, sims, k=3, lam=0.75)
    ranks = [d for _, d, _ in out]
    # doc 2 (near-dup of 1) loses rank 2 to the diverse doc 3:
    # 0.75*0.99 - 0.25*1.0 = 0.4925 < 0.75*0.7 = 0.525
    assert ranks == [1, 3, 2]
    assert out[0] == (1, 1, 0.75)
    assert out[1] == (2, 3, 0.525)
    assert out[2] == (3, 2, 0.4925)


def test_mmr_diversify_matches_pure_python(spark):
    """The DataFrame wrapper reproduces the pure sweep over real
    candidates + real tf sims."""
    from tse_spark.operators import index_build as ib
    from tse_spark.operators import textops

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tf = ib.build_tf_ws(docs)
    cand = (
        tf.groupBy("doc_id")
        .agg(F.sum("tf").alias("score"))
        .select("doc_id", (F.col("score") / 100.0).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(8)
    )
    sims = textops.candidate_tf_sims(tf, cand)
    got = [
        (r["rank"], r.doc_id, r.mmr)
        for r in textops.mmr_diversify(spark, cand, sims, 5).collect()
    ]
    rel = {r.doc_id: float(r.score) for r in cand.collect()}
    sim_map = {
        (r.doc_a, r.doc_b): float(r.sim) for r in sims.collect()
    }
    assert got == textops.mmr_rerank_py(rel, sim_map, 5, 0.75)
