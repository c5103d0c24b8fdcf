"""BPE merge learning (operators/bpe.py) conformance against the
pure-Python truth (oracle.bpe_*): merge order, counts, tie-breaks,
stop rule, and full-vocabulary segmentation."""

import pytest
from pyspark.sql import functions as F

from tse_spark import oracle
from tse_spark.operators import bpe


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, "lower lowest newer newest wider widest low new")
        for i in range(3)
    ]
    rows += [(100, "abc abd abe"), (101, "zz qq"), (102, "")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_merges_match_reference(spark, corpus):
    merges, vocab = bpe.learn_bpe(spark, corpus, n_merges=12)
    texts = [r["text"] for r in corpus.collect()]
    wc = oracle.bpe_word_counts(texts)
    assert merges == oracle.bpe_learn(wc, 12)
    seg = {
        r["word"]: tuple(r["pieces"].split(" "))
        for r in bpe.segment_table(vocab).collect()
    }
    assert set(seg) == set(wc)
    for w in wc:
        assert seg[w] == oracle.bpe_segment_word(w, merges), w


def test_stop_rule_no_singleton_merges(spark):
    # every pair unique -> best count 1 -> zero merges learned
    docs = spark.createDataFrame(
        [(1, "ab cd ef gh")], "doc_id long, text string"
    )
    merges, _ = bpe.learn_bpe(spark, docs, n_merges=5)
    assert merges == []


def test_overlap_counting_and_leftmost_merge(spark):
    # "aaaa" x3: pair (a,a) counts 9 (overlaps all counted); the merge
    # applies left-to-right non-overlapping: aaaa -> [aa, aa]
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa")], "doc_id long, text string"
    )
    merges, vocab = bpe.learn_bpe(spark, docs, n_merges=1)
    assert merges == [("a", "a", 9)]
    row = vocab.filter(F.col("word") == "aaaa").collect()[0]
    assert list(row["syms"]) == ["aa", "aa"]


def test_corpus_touched_once(spark, corpus):
    # the vocabulary table is a localCheckpoint: iteration plans scan
    # an ExistingRDD, never the documents relation again
    _, vocab = bpe.learn_bpe(spark, corpus, n_merges=2)
    plan = vocab._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan


def test_local_and_distributed_loops_identical(spark, corpus):
    """The driver-local merge loop (vocab under the gate) and the
    distributed loop (gate=0 forces it) learn the SAME merges and the
    SAME final segmentation."""
    m_local, v_local = bpe.learn_bpe(spark, corpus, n_merges=8)
    m_dist, v_dist = bpe.learn_bpe(
        spark, corpus, n_merges=8, local_vocab_gate=0
    )
    assert m_local == m_dist
    seg = lambda df: {
        r["word"]: (r["count"], list(r["syms"])) for r in df.collect()
    }
    assert seg(v_local) == seg(v_dist)
