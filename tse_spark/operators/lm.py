"""Corpus n-gram language model + perplexity quality filtering — the
CCNet recipe (score every document's LM perplexity under a model
trained on the corpus itself, keep the fluent fraction), the standard
webtext curation step between heuristic quality scores and model-based
filters.

No reference twin (TSE ranks, it never curates); the laws are chosen
deterministic and SQL-expressible so the whole pipeline is
oracle-checkable:

- tokens: lowercase whitespace split, empties dropped (the
  textops.tokens law);
- bigrams: adjacent pairs INSIDE the token array (zip_with over two
  slices — no positional self-join, same trick as
  textops.bigram_counts);
- model: add-k smoothed bigram LM over the corpus,
  ``P(w2|w1) = (C(w1,w2) + k) / (C1(w1) + k·V)`` with ``C1(w1)`` the
  count of w1 as a bigram PREFIX (so the conditional sums to 1 over
  the smoothed vocabulary) and ``V`` the distinct-token vocabulary
  size;
- doc score: ``avg_logprob`` = occurrence-weighted mean of
  ``ln P(w2|w1)`` over the doc's bigrams; ``ppl = exp(-avg_logprob)``.
  Docs with < 2 tokens have no bigram and drop out of the scored set;
- filter: keep the ``floor(q · n_scored)`` lowest-perplexity docs
  ranked by ``(ppl asc, doc_id asc)`` over the scored relation's
  already-rounded ppl — a RANK law, not an interpolated quantile, so
  Spark and any SQL engine cut the same set (rounding makes
  byte-identical texts tie exactly, then doc_id breaks ties
  deterministically).

Scale notes: training is two hash aggregations (bigram counts with
map-side combine, prefix counts derived FROM the bigram counts — the
corpus is never re-tokenized); scoring pre-aggregates each doc's
bigrams to (doc_id, w1, w2, tf) before joining the model, so the join
input is per-doc-distinct bigrams, not raw occurrences.  The exact
rank filter is the oracle law and costs one global sort of (doc_id,
ppl) pairs — tiny rows, but at 10^12 docs prefer the two-phase form:
take a perplexity THRESHOLD (from a sample or a known budget) and use
:func:`perplexity_filter_threshold`, a pure map-side filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _token_arr(text_col: str):
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda t: F.octet_length(t) > 0,
    )


def doc_bigram_tf(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, w1, w2, tf) — each doc's distinct adjacent token pairs
    with occurrence counts, computed inside the token array so only
    the aggregated pairs ever shuffle."""
    arr = _token_arr(text_col)
    pairs = F.zip_with(
        F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        docs.select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", "p.w1", "p.w2")
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bigram_lm(
    docs: DataFrame, k: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """The smoothed model as a relation: (w1, w2, logprob), with
    ``logprob = ln((C(w1,w2) + k) / (C1(w1) + k·V))``.  Scoring joins
    only need rows for bigrams that OCCUR (absent bigrams never join),
    so the relation is corpus-bigram-vocabulary sized."""
    bg = doc_bigram_tf(docs, text_col)
    c12 = bg.groupBy("w1", "w2").agg(F.sum("tf").alias("n12"))
    c1 = c12.groupBy("w1").agg(F.sum("n12").alias("n1"))
    vocab = (
        docs.select(F.explode(_token_arr(text_col)).alias("t"))
        .agg(F.countDistinct("t").alias("v"))
    )
    return (
        c12.join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.log(
                (F.col("n12") + F.lit(float(k)))
                / (F.col("n1") + F.lit(float(k)) * F.col("v"))
            ).alias("logprob"),
        )
    )


def doc_perplexity(
    docs: DataFrame, k: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob, ppl) for every doc with at
    least one bigram; the corpus itself is the training set (the CCNet
    in-domain configuration — pass a different ``docs`` to
    :func:`bigram_lm` and join manually to score against a foreign
    model)."""
    bg = doc_bigram_tf(docs, text_col)
    lm = bigram_lm(docs, k=k, text_col=text_col)
    per = bg.join(lm, ["w1", "w2"]).groupBy("doc_id").agg(
        F.sum("tf").alias("n_bigrams"),
        (
            F.sum(F.col("tf") * F.col("logprob")) / F.sum("tf")
        ).alias("avg_lp"),
    )
    return per.select(
        "doc_id",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.round("avg_lp", 6).alias("avg_logprob"),
        F.round(F.exp(-F.col("avg_lp")), 4).alias("ppl"),
    )


def perplexity_filter(
    docs: DataFrame,
    q: float = 0.5,
    k: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """The exact rank law: (doc_id, ppl, rank) for the
    ``floor(q · n_scored)`` most-fluent documents.  Keeps the scored
    count in the plan as a 1-row cross join (zero driver collects).
    At 10^12 docs use :func:`perplexity_filter_threshold` instead —
    this form's global rank is the ORACLE law, priced at one
    corpus-cardinality sort of tiny (doc_id, ppl) rows."""
    scored = doc_perplexity(docs, k=k, text_col=text_col)
    n = scored.agg(F.count(F.lit(1)).alias("__n"))
    w = Window.orderBy(F.asc("ppl"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(n))
        .filter(F.col("rank") <= F.floor(F.lit(float(q)) * F.col("__n")))
        .select("doc_id", "ppl", F.col("rank").cast("long").alias("rank"))
    )


def perplexity_filter_threshold(
    docs: DataFrame,
    max_ppl: float,
    k: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """The scale form: keep docs with ``ppl <= max_ppl`` — no global
    sort, no window; the threshold comes from a sample quantile or a
    byte budget decided offline (how CCNet ships its cutoffs)."""
    return doc_perplexity(docs, k=k, text_col=text_col).filter(
        F.col("ppl") <= float(max_ppl)
    )
