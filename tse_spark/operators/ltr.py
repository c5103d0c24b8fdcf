"""Learning-to-rank feature export: the offline feature matrix a
ranker trainer (GBDT / LambdaMART / neural LTR) consumes.

The reference engine ranks by raw BM25 only (tse/Search.cpp single
score); modern web ranking layers a learned model on top, trained on
exactly this relation: one row per (query, candidate document) with
the classic feature block —

  rank        BM25 candidate rank (1..k)
  bm25        the retrieval score itself
  n_matched   how many distinct query terms the doc contains
  coverage    n_matched / |query terms|
  sum_tf      total occurrences of query terms in the doc
  max_tf      the hottest single query term's tf
  sum_idf     summed idf of the matched terms (query specificity)
  dl, dl_norm document length, and length / corpus avgdl
  quality     query-independent text-quality heuristic
              (textops.quality_score law)
  prior       query-independent authority prior (e.g. pagerank),
              joined from any (doc_id, prior) relation

Plan shape (scale story): candidate generation is ONE pruned pass over
the compressed posting shards for the whole query table — the
batchsearch plan with the feature aggregates fused into the same
hash-aggregation, so features cost no extra shuffle.  Everything
after the top-k window operates on the CANDIDATE set (|queries| x k
rows, tiny vs the corpus): the quality scan semi-joins docs to
candidate ids (broadcast), and the prior relation joins through the
same broadcast — the corpus is never rescanned for features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tse_spark.operators import batchsearch as bs
from tse_spark.operators import postings as po
from tse_spark.operators import textops


def ltr_features(
    postings: DataFrame,
    term_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    queries: DataFrame,
    docs: DataFrame,
    priors: DataFrame | None = None,
    k: int = 10,
    tokenizer: str = "ws",
    dictionary: frozenset[bytes] = frozenset(),
    broadcast_queries: bool = True,
) -> DataFrame:
    """One row per (query_id, candidate doc) for the BM25 top-``k`` of
    each query in ``queries`` (a (query_id long, text string)
    relation), with the feature block from the module docstring.

    ``docs`` is the documents relation (doc_id, text) for the quality
    features; ``priors`` an optional (doc_id, prior) relation (absent
    docs get prior 0.0).  ``tokenizer``/``dictionary`` must be the
    index meta's — query and index share one term law."""
    qt = bs.tokenize_queries(
        queries, tokenizer=tokenizer, dictionary=dictionary
    )
    if broadcast_queries:
        qt = F.broadcast(qt)
    vocab = (
        F.broadcast(qt.select("term").distinct())
        if broadcast_queries
        else qt.select("term").distinct()
    )
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
        "tf",
        "dl",
        "idf",
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
    # feature aggregates FUSED into the scoring aggregation: same
    # single shuffle as plain batch retrieval
    g = (
        addends.join(qt, "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("s").alias("score"),
            F.count(F.lit(1)).alias("n_matched"),
            F.sum("tf").alias("sum_tf"),
            F.max("tf").alias("max_tf"),
            F.sum("idf").alias("sum_idf"),
            F.max("dl").alias("dl"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    cand = g.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= int(k)
    )
    n_terms = qt.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_terms")
    )
    if broadcast_queries:
        n_terms = F.broadcast(n_terms)
    cand = cand.join(n_terms, "query_id")
    # materialize the candidate set ONCE (lazy local checkpoint):
    # three consumers reference it (the quality semi-join, the prior
    # join, the final row set) and would otherwise each re-run the
    # whole retrieval pass.  Candidates are |queries| x k rows —
    # trivially small vs the index — and a feature-export batch job
    # tolerates the truncated-lineage recompute risk.
    cand = cand.localCheckpoint(eager=False)
    # candidate ids are |queries| x k at most: broadcast them into the
    # doc-side feature scans instead of scanning the corpus
    cand_ids = F.broadcast(cand.select("doc_id").distinct())
    qual = textops.quality_score(
        docs.join(cand_ids, "doc_id", "semi")
    ).select("doc_id", "quality")
    # the feature relations are candidate-bounded: broadcast them so
    # the final assembly never sorts/exchanges (AQE would get there
    # too, but only after planning a sort-merge join it then rewrites)
    out = cand.join(F.broadcast(qual), "doc_id", "left")
    if priors is not None:
        pr = priors.select("doc_id", "prior").join(cand_ids, "doc_id")
        out = out.join(F.broadcast(pr), "doc_id", "left")
    else:
        out = out.withColumn("prior", F.lit(0.0))
    return out.select(
        "query_id",
        "doc_id",
        F.col("rank").cast("long").alias("rank"),
        F.round("score", 4).alias("bm25"),
        F.col("n_matched").cast("long").alias("n_matched"),
        F.round(F.col("n_matched") / F.col("n_terms"), 4).alias(
            "coverage"
        ),
        F.col("sum_tf").cast("long").alias("sum_tf"),
        F.col("max_tf").cast("long").alias("max_tf"),
        F.round("sum_idf", 4).alias("sum_idf"),
        F.col("dl").cast("long").alias("dl"),
        F.round(F.col("dl") / F.lit(float(avgdl)), 4).alias("dl_norm"),
        F.coalesce(F.col("quality"), F.lit(0.0)).alias("quality"),
        F.coalesce(F.col("prior"), F.lit(0.0)).alias("prior"),
    )
