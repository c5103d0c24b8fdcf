"""Distributed BM25 query serving over posting shards.

Topology (replaces reference Query.cpp:59-82's whole-index-in-RAM map):

  1. broadcast the query terms; filter the postings table on term
     (parquet predicate pushdown — only the query's shard rows are read)
  2. groupBy(shard) + applyInPandas: block-max-pruned vectorized BM25
     (or conjunctive intersection) per doc-range shard — shards are
     disjoint doc ranges, so shard-local top-k lists compose exactly.
     wand.blockmax_topk_local uses the same per-block max-score skip
     metadata as classic WAND but prunes at block granularity with numpy
     scoring (the right trade on a Python runtime; the per-posting WAND
     in wand.wand_topk_local remains as the reference implementation)
  3. global ORDER BY score DESC, doc_id LIMIT k (TakeOrderedAndProject)

``search_local`` is the low-latency path for interactive serving: the
filtered shard rows (a few MB for typical queries) are collected once
and WAND runs in-process — the analog of the reference's CGI lookup,
without reloading the index per request.
"""

from __future__ import annotations

import math
from collections import OrderedDict

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from tse_spark import oracle
from tse_spark.operators import wand as wand_mod

RESULT_SCHEMA = "doc_id long, score double"


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


class SearchEngine:
    def __init__(
        self,
        spark: SparkSession,
        postings: DataFrame,
        term_stats: DataFrame,
        n_docs: int,
        avgdl: float,
        dictionary: frozenset[bytes] = frozenset(),
    ):
        self.spark = spark
        self.postings = postings
        self.term_stats = term_stats
        self.n_docs = n_docs
        self.avgdl = avgdl
        self.dictionary = dictionary
        self._df_cache: dict[str, int] | None = None
        # term -> merged doc-ascending blocks blob (hot-term posting
        # cache for the interactive path; bounded LRU)
        self._posting_cache: "OrderedDict[str, bytes]" = OrderedDict()
        self.posting_cache_max_terms = 65536
        # Q13 (reference Query.cpp:233-261 appends a timestamped query
        # line): JSONL query log, enabled by setting a path
        self.query_log_path: str | None = None

    def _log_query(self, query: str, k: int, n: int, ms: float) -> None:
        if not self.query_log_path:
            return
        import json
        import time as _t

        with open(self.query_log_path, "a", encoding="utf-8") as f:
            f.write(
                json.dumps(
                    {
                        "ts": _t.strftime(
                            "%Y-%m-%dT%H:%M:%SZ", _t.gmtime()
                        ),
                        "query": query,
                        "k": k,
                        "n_results": n,
                        "ms": round(ms, 2),
                    },
                    ensure_ascii=False,
                )
                + "\n"
            )

    def warm(self) -> "SearchEngine":
        """Interactive-serving mode: pin the postings table in cluster
        memory and the (small) term->df map on the driver, so a query
        costs ONE pruned job instead of stats-lookup + postings jobs.
        The reference does the opposite — it reloads the entire index
        from disk on every CGI request (Query.cpp:59-82).  At 10^12-doc
        scale the driver map should be replaced by an LRU of hot terms;
        the postings persist() is per-executor and scales out."""
        self.postings = self.postings.persist()
        self.postings.count()
        self._df_cache = {
            r["term"]: r["df"]
            for r in self.term_stats.select("term", "df").collect()
        }
        return self

    # -- query analysis (same tokenizer + eligibility as the index side) --
    def query_terms(self, query: str) -> list[str]:
        toks = oracle.tokenize(query.encode("gb2312"), self.dictionary)
        return sorted(
            {t.decode("gb2312") for t in toks if oracle.eligible(t)}
        )

    def _idf_map(self, terms: list[str]) -> dict[str, float]:
        if self._df_cache is not None:
            return {
                t: bm25_idf(self.n_docs, self._df_cache[t])
                for t in terms
                if t in self._df_cache
            }
        rows = self.term_stats.filter(
            F.col("term").isin(terms)
        ).select("term", "df").collect()
        return {r["term"]: bm25_idf(self.n_docs, r["df"]) for r in rows}

    def _shard_rows(self, terms: list[str]) -> DataFrame:
        return self.postings.filter(F.col("term").isin(terms)).select(
            "shard", "term", "blocks"
        )

    def search(
        self, query: str, k: int = 10, conjunctive: bool = False
    ) -> DataFrame:
        """Distributed WAND: per-shard Arrow UDF -> global top-k."""
        terms = self.query_terms(query)
        if not terms:
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        idf = self._idf_map(terms)
        if not idf or (conjunctive and len(idf) < len(terms)):
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        avgdl = self.avgdl
        b_idf = self.spark.sparkContext.broadcast(idf)
        n_terms = len(idf)

        def per_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            runs = [
                (b_idf.value[t], bytes(b))
                for t, b in zip(pdf["term"], pdf["blocks"])
                if t in b_idf.value
            ]
            if conjunctive:
                if len(runs) < n_terms:
                    return pd.DataFrame({"doc_id": [], "score": []})
                res = wand_mod.intersect_topk_vec(runs, avgdl, k)
            else:
                res = wand_mod.blockmax_topk_local(runs, avgdl, k)
            return pd.DataFrame(
                {
                    "doc_id": [d for d, _ in res],
                    "score": [s for _, s in res],
                }
            )

        local = self._shard_rows(terms).groupBy("shard").applyInPandas(
            per_shard, schema=RESULT_SCHEMA
        )
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def _term_blobs(self, terms: list[str]) -> dict[str, bytes]:
        """Merged doc-ascending posting blob per term, LRU-cached on the
        driver.  Shards are ascending disjoint doc-id ranges and blocks
        are self-delimiting, so per-term shard blobs concatenate (in
        shard order) into one valid run — one scoring pass per query
        instead of one per shard, and repeat terms skip the Spark job
        entirely (the reference reloads the WHOLE index per request,
        Query.cpp:59-82; this keeps just the hot working set)."""
        out: dict[str, bytes] = {}
        missing: list[str] = []
        for t in terms:
            if t in self._posting_cache:
                self._posting_cache.move_to_end(t)
                out[t] = self._posting_cache[t]
            else:
                missing.append(t)
        if missing:
            by_term: dict[str, list[tuple[int, bytes]]] = {}
            for r in self._shard_rows(missing).collect():
                by_term.setdefault(r["term"], []).append(
                    (r["shard"], bytes(r["blocks"]))
                )
            for t in missing:
                blob = b"".join(
                    b for _, b in sorted(by_term.get(t, []))
                )
                out[t] = blob
                self._posting_cache[t] = blob
                while len(self._posting_cache) > self.posting_cache_max_terms:
                    self._posting_cache.popitem(last=False)
        return out

    def search_local(
        self, query: str, k: int = 10, conjunctive: bool = False
    ) -> list[tuple[int, float]]:
        """Low-latency in-process serving: one collect of the query's
        shard rows, then WAND on the driver with shard results merged."""
        terms = self.query_terms(query)
        if not terms:
            return []
        idf = self._idf_map(terms)
        if not idf or (conjunctive and len(idf) < len(terms)):
            return []
        import time as _t

        t0 = _t.time()
        runs = [
            (idf[t], blob)
            for t, blob in self._term_blobs(list(idf)).items()
        ]
        if conjunctive:
            if len(runs) < len(terms):
                out: list[tuple[int, float]] = []
            else:
                out = wand_mod.intersect_topk_vec(runs, self.avgdl, k)
        else:
            out = wand_mod.blockmax_topk_local(runs, self.avgdl, k)
        out = out[:k]
        self._log_query(query, k, len(out), (_t.time() - t0) * 1000.0)
        return out
