"""Batch retrieval: serve a TABLE of queries against the index in one
job, plus the retrieval-quality metrics computed over the results.

The interactive engine (operators/search.py) is built for one query at
a time: per-query pushed-down posting fetches and driver-side caches.
A training-data pipeline asks the opposite question — run MILLIONS of
queries (hard-negative mining, distillation corpora, offline eval) —
where per-query fetches would scan the index once per query.  The batch
plan amortizes ONE pruned index pass over the whole query table:

  1. queries tokenize through the SAME law as the index build
     (index_build.build_tf_ws), so query and index agree on terms;
  2. the posting shards are pruned by a semi-join against the batch's
     term vocabulary (AQE broadcasts the vocabulary side), then decoded
     ONCE to the row-major (term, doc_id, tf, dl) relation
     (postings.decode_postings) — decode cost tracks the batch's
     vocabulary, not the corpus;
  3. BM25 addends are pure JVM column expressions over that relation
     (idf from term_stats — the index's own df law), joined to the
     per-query term sets, hash-aggregated per (query_id, doc_id), and
     window-ranked per query.

Shuffle budget: one broadcast semi-join, one addend/term join (the
query-term side is the small one), ONE hash aggregation and ONE window
partition by query_id — independent of how many queries share a term.
Scores are EXACTLY the interactive engine's (same idf/avgdl law), so
one oracle covers both paths.

Ranking law: score desc, doc_id asc, row_number per query (ties broken
identically in Spark and SQL); scores rounded once at the edge.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from tse_spark.operators import index_build as ib
from tse_spark.operators import postings as po


def tokenize_queries(
    queries: DataFrame,
    text_col: str = "text",
    tokenizer: str = "ws",
    dictionary: frozenset[bytes] = frozenset(),
) -> DataFrame:
    """Distinct (query_id, term) through the INDEX's tokenizer law —
    BM25 scores one addend per matched term, so query-side repeats
    collapse (the interactive engine's query_terms does the same).
    Pass the index meta's tokenizer (+ dictionary for "tse"): a
    ws-tokenized query against an FMM index would silently miss every
    CJK term."""
    docs = queries.select(
        F.col("query_id").alias("doc_id"), F.col(text_col).alias("text")
    )
    if tokenizer == "tse":
        b_dict = queries.sparkSession.sparkContext.broadcast(dictionary)
        tf = ib.doc_terms_to_tf(ib.build_doc_terms(docs, b_dict))
    else:
        tf = ib.build_tf_ws(docs)
    return tf.select(
        F.col("doc_id").alias("query_id"), "term"
    ).distinct()


def batch_search_topk(
    postings: DataFrame,
    term_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    queries: DataFrame,
    k: int = 10,
    require_all: bool = False,
    broadcast_queries: bool = True,
    tombstones: DataFrame | None = None,
    tokenizer: str = "ws",
    dictionary: frozenset[bytes] = frozenset(),
) -> DataFrame:
    """Top-k BM25 per query over the compressed shards, one index pass
    for the whole batch; see module docstring for the plan.  ``queries``
    is a (query_id long, text string) relation.  ``require_all=True``
    keeps only docs matching EVERY term of their query (the conjunctive
    batch).  Returns (query_id, doc_id, score, rank), rank 1..k.

    ``broadcast_queries`` (default) pins the query-side relations as
    broadcast builds: the posting scan's semi-join filters map-side and
    the decoded relation joins its queries WITHOUT being exchanged by
    term — the only full shuffle left is the per-(query_id, doc_id)
    aggregation, which no plan can avoid.  Turn it off only when the
    batch's term table itself outgrows broadcast (hundreds of millions
    of distinct (query, term) rows), accepting shuffle joins.

    ``tombstones`` (a (doc_id) relation — plans/delete.load_tombstones)
    masks deleted docs BEFORE the per-query top-k, upholding the
    takedown contract on the batch path too; ``tokenizer``/
    ``dictionary`` must be the index meta's so queries and index share
    one term law."""
    qt = tokenize_queries(
        queries, tokenizer=tokenizer, dictionary=dictionary
    )
    if broadcast_queries:
        qt = F.broadcast(qt)
    vocab = F.broadcast(qt.select("term").distinct()) \
        if broadcast_queries else qt.select("term").distinct()
    idf = term_stats.join(vocab, "term", "semi").select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
    )
    rel = po.decode_postings(postings.join(vocab, "term", "semi"))
    addends = rel.join(idf, "term").select(
        "term",
        "doc_id",
        (
            F.col("idf")
            * F.col("tf")
            * F.lit(2.2)
            / (
                F.col("tf")
                + F.lit(1.2)
                * (
                    F.lit(0.25)
                    + F.lit(0.75) * F.col("dl") / F.lit(float(avgdl))
                )
            )
        ).alias("s"),
    )
    scored = (
        addends.join(qt, "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("s").alias("score"), F.count(F.lit(1)).alias("n_hit"))
    )
    if tombstones is not None:
        scored = scored.join(
            F.broadcast(tombstones.select("doc_id")), "doc_id", "left_anti"
        )
    if require_all:
        n_terms = qt.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n_terms")
        )
        if broadcast_queries:
            n_terms = F.broadcast(n_terms)
        scored = scored.join(n_terms, "query_id").filter(
            F.col("n_hit") == F.col("n_terms")
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(
            "query_id",
            "doc_id",
            F.round("score", 4).alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def retrieval_metrics(
    results: DataFrame, qrels: DataFrame, k: int = 10
) -> DataFrame:
    """Offline retrieval quality per query from a ranked result table
    (query_id, doc_id, rank — batch_search_topk's shape) against
    binary relevance judgments (query_id, doc_id):

      recall_at_k  |top-k ∩ rel| / |rel|
      mrr          1 / rank of the first relevant hit (0 when none)
      ndcg_at_k    binary-gain DCG / ideal DCG, log2 discounts

    One hash agg over the hit join + one over qrels — metric cost
    tracks the result table, not the corpus.  Queries with no relevant
    hit in the top-k still get a row (zeros): a silent inner join here
    would inflate every average downstream."""
    ln2 = math.log(2.0)
    rel_n = qrels.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    hits = (
        results.filter(F.col("rank") <= int(k))
        .join(qrels, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_hit"),
            F.min("rank").alias("first_rank"),
            F.sum(
                F.lit(1.0) / (F.log(F.col("rank") + F.lit(1.0)) / F.lit(ln2))
            ).alias("dcg"),
        )
    )
    # ideal DCG for binary gains: the first min(n_rel, k) positions
    ideal = rel_n.select(
        "query_id",
        "n_rel",
        F.expr(
            f"aggregate(sequence(1, int(least(n_rel, {int(k)}))), "
            "cast(0.0 as double), "
            f"(acc, i) -> acc + 1.0 / (ln(i + 1.0) / ln(2.0)))"
        ).alias("idcg"),
    )
    return (
        ideal.join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_rel",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_rel"), 6
            ).alias("recall_at_k"),
            F.round(
                F.coalesce(
                    F.lit(1.0) / F.col("first_rank"), F.lit(0.0)
                ),
                6,
            ).alias("mrr"),
            F.round(
                F.coalesce(F.col("dcg") / F.col("idcg"), F.lit(0.0)), 6
            ).alias("ndcg_at_k"),
        )
    )
