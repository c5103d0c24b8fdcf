"""Round-3b operators: int8-quantized ANN tier, impact-ordered static
index pruning, time-travel as-of snapshots, typeahead completion, and
the per-domain curation scoreboard.  Driver-level value parity is in
test_entry_contract.py; these pin the operator semantics on tiny
hand-checkable inputs plus the rerank-recovers-exact invariant."""

import datetime

from tse_spark.operators import index_build as ib
from tse_spark.operators import similarity as sim
from tse_spark.operators import textops

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def test_int8_quantize_law():
    q, s = sim._int8_quantize_vec([3.0, -1.5, 0.0])
    assert s == 3.0 / 127.0
    # 3.0/s = 127 exactly; -1.5/s = -63.5 -> floor(-63.0) = -63
    assert q == [127.0, -63.0, 0.0]
    # zero vector: the guard keeps the scale positive, codes all zero
    q0, s0 = sim._int8_quantize_vec([0.0, 0.0])
    assert s0 > 0 and q0 == [0.0, 0.0]


def test_int8_engine_matches_driver_law(spark):
    df = spark.createDataFrame(
        [(1, [3.0, -1.5, 0.0], "a"), (2, [1.0, 1.0, 1.0], "b")],
        "vec_id long, embedding array<float>, label string",
    )
    out = {
        r["vec_id"]: (r["qscale"], r["qcos"])
        for r in sim.int8_ann_topk(df, [3.0, -1.5, 0.0], k=2).collect()
    }
    assert abs(out[1][0] - round(3.0 / 127.0, 6)) < 1e-12
    assert out[1][1] == 1.0  # self-similarity of the codes
    assert abs(out[2][0] - round(1.0 / 127.0, 6)) < 1e-12


def test_int8_rerank_recovers_exact(spark):
    emb = spark.read.parquet(EMB)
    qv = sim.get_query_vec(emb, 0)
    exact = [
        r["vec_id"]
        for r in sim.cosine_topk(emb, qv, 10, exclude_id=0).collect()
    ]
    rr = [
        r["vec_id"]
        for r in sim.int8_ann_topk_rerank(
            emb, qv, 10, mult=4, exclude_id=0
        ).collect()
    ]
    assert rr == exact


def test_impact_pruned_tf_keeps_top_m(spark):
    # term 'aa': doc 1 (tf=5) beats doc 2 (tf=1); term 'bb': equal
    # impact in docs 2 and 3 (same tf, same dl) -> tie breaks to doc 2
    tf = spark.createDataFrame(
        [(1, "aa", 5), (2, "aa", 1), (2, "bb", 2), (3, "bb", 2)],
        "doc_id long, term string, tf long",
    )
    doclen = spark.createDataFrame(
        [(1, 5), (2, 3), (3, 2)], "doc_id long, dl long"
    )
    dfreq = spark.createDataFrame(
        [("aa", 2), ("bb", 2)], "term string, df long"
    )
    got = {
        (r["term"], r["doc_id"])
        for r in ib.impact_pruned_tf(
            tf, doclen, dfreq, n_docs=3, avgdl=10 / 3.0, m=1
        ).collect()
    }
    assert got == {("aa", 1), ("bb", 3)} or got == {("aa", 1), ("bb", 2)}
    # with identical tf, the shorter doc (3: dl=2) has the higher
    # impact under length normalization — so it must be doc 3
    assert ("bb", 3) in got


def test_snapshot_asof(spark):
    rows = [
        ("u1", datetime.datetime(2024, 1, 1), "v0"),
        ("u1", datetime.datetime(2024, 2, 1), "v1"),
        ("u1", datetime.datetime(2024, 3, 1), "v2"),  # after cutoff
        ("u2", datetime.datetime(2024, 3, 5), "v0"),  # all after cutoff
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, body string"
    )
    got = {
        r["url"]: r["body"]
        for r in textops.snapshot_asof(df, "2024-02-15 00:00:00").collect()
    }
    assert got == {"u1": "v1"}  # u2 has no version under the cutoff


def test_prefix_complete(spark):
    vocab = spark.createDataFrame(
        [("spark", 10), ("sort", 30), ("scan", 30), ("join", 99)],
        "term string, df long",
    )
    got = [
        (r["term"], r["df"])
        for r in textops.prefix_complete(vocab, "S", k=2).collect()
    ]
    # df desc, term asc on ties; prefix is case-folded
    assert got == [("scan", 30), ("sort", 30)]


def test_domain_stats(spark):
    docs = spark.createDataFrame(
        [
            ("h1", "en", "same text", 9),
            ("h1", "en", "same text", 9),
            ("h1", "de", "other", 5),
            ("h2", "en", "x", 1),
        ],
        "host string, lang string, text string, n_chars long",
    )
    got = {r["host"]: r for r in textops.domain_stats(docs).collect()}
    assert got["h1"]["n_docs"] == 3
    assert got["h1"]["n_unique"] == 2  # the duplicated text counts once
    assert got["h1"]["n_langs"] == 2
    assert abs(got["h1"]["mean_chars"] - round(23 / 3.0, 4)) < 1e-9
    assert got["h2"]["n_docs"] == 1 and got["h2"]["n_unique"] == 1


def test_strip_boilerplate_lines(spark):
    docs = spark.createDataFrame(
        [
            (1, "COOKIE BANNER\nunique alpha\nFOOTER"),
            (2, "COOKIE BANNER\nunique beta\nFOOTER"),
            (3, "COOKIE BANNER\nunique gamma"),
            (4, "all original\nnothing shared"),
            (5, "COOKIE BANNER"),  # fully boilerplate -> empty
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in textops.strip_boilerplate_lines(docs, min_df=2).collect()
    }
    assert out[1] == ("unique alpha", 2)
    assert out[2] == ("unique beta", 2)
    assert out[3] == ("unique gamma", 1)
    assert out[4] == ("all original\nnothing shared", 0)
    assert out[5] == ("", 1)


def test_strip_boilerplate_within_doc_repeat_kept(spark):
    # a line repeated INSIDE one doc but in no other doc is not
    # boilerplate (df counts distinct docs), and line ORDER survives
    docs = spark.createDataFrame(
        [(1, "x\ny\nx\nz"), (2, "z\nother")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in textops.strip_boilerplate_lines(docs, min_df=2).collect()
    }
    assert out[1] == "x\ny\nx"
    assert out[2] == "other"
