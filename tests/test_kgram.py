"""Wildcard search via the k-gram index (operators/kgram.py): gram
conjunction + regex post-filter must equal a plain LIKE scan, on both
the analysis (token-scan) and serving (tf-index) forms."""

import pytest

from pyspark.sql import functions as F

from tse_spark.operators import kgram as KG


def test_pattern_grams_anchoring():
    B = "\x01"
    assert KG.pattern_grams("red*", 3) == sorted({B + "re", "red"})
    assert KG.pattern_grams("*ing", 3) == sorted({"ing", "ng" + B})
    assert KG.pattern_grams("sp*rk", 3) == sorted({B + "sp", "rk" + B})
    # inner segment: no boundary padding
    assert KG.pattern_grams("a*bcd*e", 3) == ["bcd"]
    # all segments too short for k=3 -> no grams (fallback path)
    assert KG.pattern_grams("a*b", 3) == []
    # exact term (no *): fully padded
    assert KG.pattern_grams("hat", 3) == sorted(
        {B + "ha", "hat", "at" + B}
    )


@pytest.fixture(scope="module")
def vocab(spark):
    rows = [
        ("red", 10), ("redo", 8), ("retired", 6), ("bored", 5),
        ("ring", 4), ("boring", 3), ("moor", 2), ("a", 1), ("ab", 1),
    ]
    return spark.createDataFrame(rows, "term string, df long")


def _terms(df):
    return sorted(r["term"] for r in df.collect())


def test_wildcard_terms_equal_brute_regex_scan(vocab):
    # gram conjunction + post-filter must equal a plain regex scan on
    # every pattern shape: anchored, floating, multi-*, and the
    # short-segment fallbacks
    for pat in ["red*", "*red*", "*ing", "r*d", "*o*", "a*", "*b*d*"]:
        got = _terms(KG.wildcard_terms(vocab, pat, k=3))
        rx = KG._pattern_regex(pat)
        want = _terms(vocab.filter(F.col("term").rlike(rx)))
        assert got == want, pat


def test_wildcard_terms_gram_path_actually_prunes(vocab):
    # sanity that the gram path (not the fallback) ran for a pattern
    # with >= k fixed chars: candidate set strictly smaller than vocab
    grams = KG.pattern_grams("red*", 3)
    assert grams  # gram path
    cand = (
        KG.kgram_index(vocab, 3)
        .filter(F.col("gram").isin(grams))
        .select("term")
        .distinct()
    )
    assert 0 < cand.count() < vocab.count()


def test_wildcard_search_matches_like_scan(spark):
    """Both wildcard forms follow the INDEX-ELIGIBILITY tokenization
    (build_tf_ws, 2..8 bytes) — the analysis scan, the index-served
    form, and the ground-truth regex scan must agree on every pattern
    (the '*a*' case pins that a bare out-of-range token like 'a' is
    excluded everywhere, not just on the indexed path)."""
    from tse_spark.operators import index_build as ib

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tf = ib.build_tf_ws(docs)
    for pat in ["*or*", "s*", "st*m", "*a*"]:
        rx = KG._pattern_regex(pat)
        want = {
            (r["doc_id"], r["n_terms"], r["tf"])
            for r in (
                tf.filter(F.col("term").rlike(rx))
                .groupBy("doc_id")
                .agg(
                    F.countDistinct("term").alias("n_terms"),
                    F.sum("tf").alias("tf"),
                )
            ).collect()
        }
        got = {
            (r["doc_id"], r["n_terms"], r["tf"])
            for r in KG.wildcard_search(docs, pat, k=2).collect()
        }
        got_idx = {
            (r["doc_id"], r["n_terms"], r["tf"])
            for r in KG.wildcard_search_indexed(tf, pat, k=2).collect()
        }
        assert got == want and got_idx == want and want, pat


def test_persisted_kgram_index_pushdown(spark, vocab, tmp_path):
    out = str(tmp_path / "kgrams")
    KG.write_kgram_index(vocab, out, k=3)
    kgrams, k = KG.load_kgram_index(spark, out)
    assert k == 3
    got = _terms(KG.wildcard_terms(vocab, "red*", k=3, kgrams=kgrams))
    assert got == ["red", "redo"]
    plan = (
        kgrams.filter(F.col("gram").isin(KG.pattern_grams("red*", 3)))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "In(gram" in plan
