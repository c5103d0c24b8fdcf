"""Percolation — prospective search over standing queries.

The retrospective engine indexes DOCUMENTS and evaluates a query
against them; percolation inverts the roles: a table of STANDING
queries (saved searches, alert subscriptions, topic monitors) is
evaluated against each incoming document batch, emitting (query, doc)
matches.  The reference has no such surface (tse/ serves ad-hoc CGI
queries only, SearchCGI.cpp); this is Elasticsearch's percolator /
Google-Alerts shape re-expressed in one Spark pass.

Scale story (the reason percolation is NOT "run every query"): the
standing-query table is the SMALL side — 10^6 subscriptions tokenize
to a few MB of distinct (query_id, term) rows — so it broadcasts into
a single tokenize-and-join pass over the document delta.  A day's
10^12-token crawl delta is scanned ONCE for all queries together; the
only shuffle groups the (query, doc) MATCH candidates (sparse — docs
sharing at least one term with a query), never the corpus.  Per-batch
cost is O(delta tokens + matches), independent of query count until
the broadcast no longer fits (then: hash-partition both sides on term,
same plan minus the broadcast hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tse_spark.operators import batchsearch as bs
from tse_spark.operators import index_build as ib


def percolate(
    docs: DataFrame,
    queries: DataFrame,
    conjunctive: bool = True,
    tokenizer: str = "ws",
    dictionary: frozenset[bytes] = frozenset(),
) -> DataFrame:
    """(query_id, doc_id, n_matched, tf) — standing queries matched
    against a document batch.

    ``docs`` is (doc_id, text); ``queries`` is (query_id, text).  Both
    sides tokenize through the SAME index law (tokenize_queries /
    build_tf_ws — ws or tse+dictionary), so percolation agrees with
    what the retrospective index would have matched.  ``conjunctive``
    demands every query term (the alert-subscription default: no
    partial-topic noise); ``False`` emits any-term matches with their
    coverage count for downstream thresholding.  ``tf`` is the total
    occurrences of the query's matched terms in the doc — a cheap
    relevance proxy for ranking a day's alerts."""
    qt = bs.tokenize_queries(
        queries, tokenizer=tokenizer, dictionary=dictionary
    )
    if tokenizer == "ws":
        # raw OCCURRENCE stream, not the tf aggregate: pre-aggregating
        # tf would shuffle the whole delta on (doc, term) before the
        # match join; joining occurrences against the broadcast query
        # terms first means the one real shuffle groups only the
        # sparse match rows
        m = (
            ib.ws_token_stream(docs)
            .join(F.broadcast(qt), "term")
            .groupBy("query_id", "doc_id")
            .agg(
                F.count_distinct("term").alias("n_matched"),
                F.count(F.lit(1)).alias("tf"),
            )
        )
    else:
        # the FMM tokenizer pre-aggregates inside its Arrow UDF (there
        # is no cheaper occurrence stream to expose)
        b_dict = docs.sparkSession.sparkContext.broadcast(dictionary)
        m = (
            ib.build_tf(docs, b_dict)
            .join(F.broadcast(qt), "term")
            .groupBy("query_id", "doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_matched"),
                F.sum("tf").alias("tf"),
            )
        )
    if conjunctive:
        n_terms = qt.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("__n_terms")
        )
        m = (
            m.join(F.broadcast(n_terms), "query_id")
            .filter(F.col("n_matched") == F.col("__n_terms"))
            .drop("__n_terms")
        )
    return m
