"""Index-build operators vs the pure-Python oracle on fixture pages."""

import pytest

from tse_spark import fixtures, oracle
from tse_spark.operators import index_build as ib

GB = "gb2312"


@pytest.fixture(scope="module")
def docs(spark, pages_df):
    d = ib.build_docs(pages_df, num_partitions=4)
    d.cache().count()
    return d


@pytest.fixture(scope="module")
def tf(docs, dict_broadcast):
    t = ib.build_tf(docs, dict_broadcast)
    t.cache().count()
    return t


@pytest.fixture(scope="module")
def oracle_engine(docs):
    rows = docs.select("doc_id", "text").collect()
    texts = {r["doc_id"]: r["text"].encode(GB) for r in rows}
    return oracle.BM25Oracle(texts, fixtures.mini_dict_bytes())


def test_dedup_and_doc_id_dense(docs, pages_pdf):
    n_unique = pages_pdf["url"].nunique()
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    assert sorted(ids) == list(range(n_unique))


def test_doc_id_deterministic_across_parallelism(spark, pages_df):
    a = ib.build_docs(pages_df, num_partitions=2)
    b = ib.build_docs(pages_df, num_partitions=7)
    ma = {r["url"]: r["doc_id"] for r in a.select("url", "doc_id").collect()}
    mb = {r["url"]: r["doc_id"] for r in b.select("url", "doc_id").collect()}
    assert ma == mb
    # and equals rank over md5(url) — the reference's Url.idx order
    # (sort Url.idx | uniq, index/readme.txt:14)
    import hashlib

    expect = {
        u: i
        for i, u in enumerate(
            sorted(ma, key=lambda u: hashlib.md5(u.encode()).hexdigest())
        )
    }
    assert ma == expect


def test_extract_byte_identity(pages_df, pages_pdf):
    # BASELINE.json input_hint invariant: UDF-extracted text is
    # byte-identical to the oracle's text per url.
    got = {
        r["url"]: r["text"]
        for r in ib.extract_text_df(pages_df).collect()
    }
    for url, text in zip(pages_pdf["url"], pages_pdf["text"]):
        assert got[url] == text


def test_tf_matches_oracle(tf, oracle_engine):
    got = {
        (r["doc_id"], r["term"].encode(GB)): r["tf"]
        for r in tf.collect()
    }
    want = {
        (d, t): c
        for d, counter in oracle_engine.tf.items()
        for t, c in counter.items()
    }
    assert got == want


def test_stats_match_oracle(tf, oracle_engine):
    doclen = ib.build_doclen(tf)
    dfreq = ib.build_df_stats(tf)
    got_dl = {r["doc_id"]: r["dl"] for r in doclen.collect()}
    want_dl = {d: n for d, n in oracle_engine.doclen.items() if n > 0}
    assert got_dl == want_dl
    got_df = {r["term"].encode(GB): r["df"] for r in dfreq.collect()}
    assert got_df == oracle_engine.df
    n, avgdl = ib.corpus_stats(doclen)
    assert n == len(want_dl)


def test_postings_flat_sorted(tf):
    p = ib.build_postings_flat(tf)
    row = p.orderBy(p.df.desc()).first()
    ids = [x["doc_id"] for x in row["postings"]]
    assert ids == sorted(ids)
    assert row["df"] == len(ids)


@pytest.mark.parametrize("conjunctive", [False, True])
def test_bm25_rank_identical_to_oracle(
    spark, tf, oracle_engine, dict_broadcast, conjunctive
):
    doclen = ib.build_doclen(tf).cache()
    dfreq = ib.build_df_stats(tf).cache()
    # oracle avgdl averages over ALL docs (incl. empty); engine over docs
    # with >=1 eligible token. Fixture docs are never empty — assert so.
    n, avgdl = ib.corpus_stats(doclen)
    assert n == oracle_engine.n_docs
    assert avgdl == pytest.approx(oracle_engine.avgdl, rel=1e-12)

    for qid, query, k in fixtures.gen_queries()[::3]:
        qterms = [
            t.decode(GB) for t in oracle_engine.query_terms(query.encode(GB))
        ]
        got = ib.bm25_topk(
            spark, tf, doclen, dfreq, n, avgdl, qterms, k, conjunctive
        ).collect()
        want = oracle_engine.search(
            query.encode(GB), k, conjunctive=conjunctive
        )
        assert [r["doc_id"] for r in got] == [d for d, _ in want], (
            f"qid={qid} q={query!r}"
        )
        for r, (_, s) in zip(got, want):
            assert r["score"] == pytest.approx(s, abs=1e-6)


def test_http_body_expr_matches_oracle(spark):
    """T1 JVM expression == pure-Python oracle on every golden/boundary
    shape (ASCII payloads; the expression is byte==char here)."""
    from pyspark.sql import functions as F

    from tse_spark.functions import extraction

    cases = [
        b"H1\n\nH2\n\nbody",
        b"H1\n\nH2\n\n",
        b"H1\r\n\r\nH2\r\n\r\nbody",
        b"a\n\r\nb\n\nc\n\nd",
        b"no pair at all",
        b"H1\n\n\nX\n\nbody",
        b"h" * 1020 + b"\n\nH2\n\nbody",
        b"h" * 1021 + b"\n\nH2\n\nbody",
        b"h" * 1022 + b"\n\nH2\n\nbody",
        b"H1\n\n" + b"h" * 1021 + b"\n\nbody",
        b"H1\n\n" + b"h" * 1019 + b"\n\nbody",
    ]
    df = spark.createDataFrame(
        [(i, c.decode("ascii")) for i, c in enumerate(cases)], "i int, raw string"
    )
    got = {
        r["i"]: r["body"]
        for r in df.selectExpr(
            "i", f"({extraction.http_body_expr('raw')}) AS body"
        ).collect()
    }
    for i, c in enumerate(cases):
        want = oracle.skip_http_headers(c)
        want = want.decode("ascii") if want is not None else None
        assert got[i] == want, (i, got[i], want)
