"""Bigram-LM perplexity curation (operators/lm.py): model sanity
(smoothed conditional mass), fluent-vs-gibberish ordering, and the
threshold (scale) form's consistency with the exact rank form."""

import math

import pytest
from pyspark.sql import functions as F

from tse_spark.operators import lm


@pytest.fixture(scope="module")
def docs(spark):
    fluent = "the cat sat on the mat and the cat sat again"
    rows = [(i, fluent) for i in range(8)]
    rows.append((100, "zqx vbn wkj plm qrs ztx bnv mkl"))  # gibberish
    rows.append((101, "the cat sat on the mat"))
    rows.append((102, "one"))  # single token: no bigram, unscored
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_model_reserves_smoothing_mass(spark, docs):
    rows = (
        lm.bigram_lm(docs)
        .groupBy("w1")
        .agg(F.sum(F.exp("logprob")).alias("mass"))
        .collect()
    )
    assert rows
    for r in rows:  # observed-continuation mass < 1: add-k holds back
        assert 0.0 < r["mass"] < 1.0


def test_fluent_scores_below_gibberish(spark, docs):
    ppl = {
        r["doc_id"]: r["ppl"]
        for r in lm.doc_perplexity(docs).collect()
    }
    assert 102 not in ppl  # no bigram -> unscored
    assert ppl[101] < ppl[100]
    # repeated corpus-dominant doc is the most predictable of all
    assert ppl[0] < ppl[101] < ppl[100]
    # ppl = exp(-avg_lp) sanity: all >= 1 is NOT required (probs < 1
    # make logprob < 0, so ppl > 1 always under add-k smoothing)
    assert all(p > 1.0 for p in ppl.values())


def test_rank_filter_cuts_exactly_half(spark, docs):
    scored = lm.doc_perplexity(docs).collect()
    kept = lm.perplexity_filter(docs, q=0.5).collect()
    assert len(kept) == math.floor(0.5 * len(scored))
    # kept = the lowest-(ppl, doc_id) prefix of the scored set
    order = sorted((r["ppl"], r["doc_id"]) for r in scored)
    expect = {d for _, d in order[: len(kept)]}
    assert {r["doc_id"] for r in kept} == expect


def test_threshold_form_is_consistent(spark, docs):
    kept = lm.perplexity_filter(docs, q=0.5).collect()
    cut = max(r["ppl"] for r in kept)
    thr = lm.perplexity_filter_threshold(docs, max_ppl=cut).collect()
    kept_ids = {r["doc_id"] for r in kept}
    thr_ids = {r["doc_id"] for r in thr}
    assert kept_ids <= thr_ids
    # anything extra the threshold admits ties the cut exactly
    for r in thr:
        if r["doc_id"] not in kept_ids:
            assert r["ppl"] == cut


def test_bigram_stage_never_self_joins(spark, docs):
    plan = (
        lm.doc_bigram_tf(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan  # zip_with inside the array, then agg