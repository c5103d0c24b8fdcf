"""Percolation (prospective search): standing queries vs doc batches.

Batch operator pinned against an independent per-query scan truth;
the streaming alerts sink must equal one batch percolation over the
union of its micro-batches, and a checkpoint replay must not
duplicate the log.
"""

import os

import pytest

from pyspark.sql import functions as F

from tse_spark import fixtures
from tse_spark.operators import index_build as ib
from tse_spark.operators import percolate as pc
from tse_spark.streaming import alerts

QUERIES = [
    (0, "web search"),
    (1, "spark index"),
    (2, "crawl rank html"),
]


@pytest.fixture(scope="module")
def docs(spark):
    pdf = fixtures.gen_pages(250, start=0)[["text"]].reset_index()
    return spark.createDataFrame(
        pdf.rename(columns={"index": "doc_id"})[["doc_id", "text"]]
    ).cache()


@pytest.fixture(scope="module")
def qdf(spark):
    return spark.createDataFrame(QUERIES, "query_id long, text string")


def _truth(spark, docs, conjunctive):
    """Independent truth: evaluate each query separately with plain
    DataFrame ops over the eligibility-filtered token stream."""
    tf = ib.build_tf_ws(docs)
    rows = set()
    for qid, text in QUERIES:
        terms = sorted({t for t in text.lower().split() if 2 <= len(t) <= 8})
        per_doc = (
            tf.filter(F.col("term").isin(terms))
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("tf").alias("s"),
            )
        ).collect()
        for r in per_doc:
            if conjunctive and r["n"] != len(terms):
                continue
            rows.add((qid, r["doc_id"], r["n"], r["s"]))
    return rows


@pytest.mark.parametrize("conjunctive", [True, False])
def test_percolate_matches_per_query_scan(spark, docs, qdf, conjunctive):
    got = {
        (r["query_id"], r["doc_id"], r["n_matched"], r["tf"])
        for r in pc.percolate(docs, qdf, conjunctive=conjunctive).collect()
    }
    assert got == _truth(spark, docs, conjunctive)
    assert got  # non-vacuous on the fixtures


def test_alert_stream_equals_batch(spark, qdf, tmp_path_factory):
    d = tmp_path_factory.mktemp("alerts")
    stream_dir = str(d / "pages")
    os.makedirs(stream_dir, exist_ok=True)
    p1 = fixtures.gen_pages(120, start=0)
    p2 = fixtures.gen_pages(120, start=120)
    for name, pdf in (("a.parquet", p1), ("b.parquet", p2)):
        pdf.to_parquet(
            os.path.join(stream_dir, name), index=False,
            coerce_timestamps="us",
        )
    alerts_dir = str(d / "log")
    ckpt = str(d / "ckpt")
    from tse_spark.streaming import ingest

    pages = ingest.read_pages_stream(spark, stream_dir, max_files_per_trigger=1)
    q = alerts.percolate_stream(pages, qdf, alerts_dir, ckpt)
    q.awaitTermination(300)
    got = {
        (r["query_id"], r["url"], r["n_matched"], r["tf"])
        for r in alerts.read_alerts(spark, alerts_dir).collect()
    }
    import pandas as pd

    # the sink reduces every micro-batch to its newest row per url
    # (the ingest side's reconciliation law); urls are disjoint across
    # these batches, so one reduce over the union is the same thing
    union = alerts.latest_per_url(
        spark.createDataFrame(pd.concat([p1, p2]))
    ).select(F.col("url").alias("doc_id"), "text")
    want = {
        (r["query_id"], r["doc_id"], r["n_matched"], r["tf"])
        for r in pc.percolate(union, qdf).collect()
    }
    assert got == want and got

    # replayed stream over the same checkpoint: no new batches, the
    # log is unchanged (dedup law: deterministic batch dirs)
    q2 = alerts.percolate_stream(pages, qdf, alerts_dir, ckpt)
    q2.awaitTermination(300)
    again = {
        (r["query_id"], r["url"], r["n_matched"], r["tf"])
        for r in alerts.read_alerts(spark, alerts_dir).collect()
    }
    assert again == got


def test_alert_suppression_window(spark, qdf, tmp_path_factory):
    """suppress_repeats: a (query, url) alerts on first sight, an
    UNCHANGED re-crawl is suppressed, a content CHANGE re-alerts —
    and a checkpoint replay still duplicates nothing."""
    import pandas as pd

    d = tmp_path_factory.mktemp("alerts_sup")
    stream_dir = str(d / "pages")
    os.makedirs(stream_dir, exist_ok=True)
    p1 = fixtures.gen_pages(100, start=0)
    # batch 2: rows 0..49 re-crawled UNCHANGED, rows 50..79 re-crawled
    # with changed text (a matched term appended), rows 100.. new
    dup = p1.iloc[:50].copy()
    chg = p1.iloc[50:80].copy()
    chg["text"] = chg["text"] + " web search"
    new = fixtures.gen_pages(40, start=100)
    p2 = pd.concat([dup, chg, new], ignore_index=True)
    import time

    now = time.time()
    for i, (name, pdf) in enumerate(
        (("a.parquet", p1), ("b.parquet", p2))
    ):
        path = os.path.join(stream_dir, name)
        pdf.to_parquet(path, index=False, coerce_timestamps="us")
        # pin micro-batch order: the file source orders by mod time
        os.utime(path, (now + 100 * i, now + 100 * i))
    alerts_dir = str(d / "log")
    ckpt = str(d / "ckpt")
    from tse_spark.streaming import ingest

    pages = ingest.read_pages_stream(
        spark, stream_dir, max_files_per_trigger=1
    )
    q = alerts.percolate_stream(
        pages, qdf, alerts_dir, ckpt, suppress_repeats=True
    )
    q.awaitTermination(300)
    log = alerts.read_alerts(spark, alerts_dir).collect()
    got = {(r["query_id"], r["url"]) for r in log}

    # ground truth per phase
    def matches(pdf):
        docs = spark.createDataFrame(pdf).select(
            F.col("url").alias("doc_id"), "text"
        )
        return {
            (r["query_id"], r["doc_id"])
            for r in pc.percolate(docs, qdf).collect()
        }

    m1 = matches(p1)
    m_dup = matches(dup)          # unchanged re-crawls: suppressed
    m_chg = matches(chg)          # changed content: re-alerts
    m_new = matches(new)
    assert got == m1 | m_chg | m_new
    assert m_dup <= m1            # sanity: dup matches were already seen
    # exact composition with batch order pinned (a then b): batch 1
    # emits m1; batch 2 re-alerts ONLY the changed docs plus the new
    # ones — every unchanged re-crawl match is suppressed
    assert len(log) == len(m1) + len(m_chg) + len(m_new)

    # replay: same checkpoint, log unchanged
    q2 = alerts.percolate_stream(
        pages, qdf, alerts_dir, ckpt, suppress_repeats=True
    )
    q2.awaitTermination(300)
    again = {
        (r["query_id"], r["url"])
        for r in alerts.read_alerts(spark, alerts_dir).collect()
    }
    assert again == got
