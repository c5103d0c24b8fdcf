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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from tse_spark import oracle
from tse_spark.operators import codec, wand as wand_mod

RESULT_SCHEMA = "doc_id long, score double"


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def parse_boolean_query(
    query: str,
) -> tuple[list[str], list[str], list[str], list[str]]:
    """Split a web-style boolean query into
    ``(optional, required, excluded, phrases)``.

    Grammar (the classic search-box syntax the reference's CGI parser
    never grew, tse/Search.cpp takes the raw string as one bag of
    words): ``"..."`` spans are phrases (quotes never nest; an unclosed
    quote runs to the end of the string), and of the remaining
    whitespace-separated words a ``+`` prefix marks a required term, a
    ``-`` prefix an excluded term.  Bare ``+``/``-`` tokens are
    dropped.  Words are lowercased; per-bucket dedup/eligibility is the
    consumer's job (the engine routes each bucket through its own
    tokenizer so query and index obey one law)."""
    import re as _re

    phrases = [p.strip().lower() for p in _re.findall(r'"([^"]*)"', query)]
    phrases = [p for p in phrases if p]
    rest = _re.sub(r'"[^"]*"', " ", query)
    tail = rest.rsplit('"', 1)
    if len(tail) == 2:  # unclosed quote: trailing span is a phrase
        rest, p = tail
        p = p.strip().lower()
        if p:
            phrases.append(p)
    optional: list[str] = []
    required: list[str] = []
    excluded: list[str] = []
    for w in rest.split():
        if w.startswith("+"):
            bucket, w = required, w[1:]
        elif w.startswith("-"):
            bucket, w = excluded, w[1:]
        else:
            bucket = optional
        if w:
            bucket.append(w.lower())
    return optional, required, excluded, phrases


class SearchEngine:
    def __init__(
        self,
        spark: SparkSession,
        postings: DataFrame,
        term_stats: DataFrame,
        n_docs: int,
        avgdl: float,
        dictionary: frozenset[bytes] = frozenset(),
        bound_scale: float = 1.0,
        tombstones: "np.ndarray | None" = None,
    ):
        self.spark = spark
        self.postings = postings
        self.term_stats = term_stats
        self.n_docs = n_docs
        self.avgdl = avgdl
        self.dictionary = dictionary
        # deleted doc ids (plans/delete.py): SORTED unique int64, masked
        # out of every serving path before top-k selection.  Corpus
        # stats stay the full-corpus values until compact_index folds
        # the deletes physically (the documented stale-stats law — the
        # same "filtering narrows the result set, not the statistics"
        # contract as search_filtered).  Held driver-side + broadcast:
        # the live tombstone set is assumed small relative to the
        # corpus; large delete backlogs should be compacted away.
        self._tomb: "np.ndarray | None" = None
        if tombstones is not None and len(tombstones):
            self._tomb = np.unique(
                np.asarray(tombstones, dtype=np.int64)
            )
        self._tomb_bc = None
        # >= 1 after appends raise avgdl above the value the block
        # max-scores were encoded with (see wand.Cursor docstring)
        self.bound_scale = bound_scale
        # term -> (df, merged doc-ascending blocks blob): ONE bounded
        # LRU for the interactive path, filled lazily by one pruned job
        # per set of missing terms.  df rides along with the shard rows
        # (each shard row carries its df), so the stats lookup costs no
        # extra job.  df = 0 entries are cached negatives (term absent).
        self._term_cache: "OrderedDict[str, tuple[int, bytes]]" = OrderedDict()
        # stats-only twin for the distributed path (df without blobs)
        self._df_cache: "OrderedDict[str, int]" = OrderedDict()
        self.posting_cache_max_terms = 65536
        # scored-posting cache: term -> (docs int32, scores float64).
        # A term's per-posting BM25 addend depends only on (idf, avgdl)
        # — fixed for this engine/index generation — so hot terms skip
        # varint decode, block scans AND scoring (together ~75% of
        # per-query time at a 2M-doc corpus); entries are ~2-4x the
        # blob size, so this LRU is BYTE-budgeted, not entry-counted —
        # the classic posting-cache-in-RAM design.
        self._decoded_cache: "OrderedDict[str, tuple]" = OrderedDict()
        self._decoded_bytes = 0
        self.decoded_cache_budget = 512 << 20
        # optional SECOND cache tier shared across serving processes
        # (operators/servecache.py): consulted between the in-process
        # LRU and the pruned Spark fetch, write-through on fills.  One
        # replica's cold miss warms the whole fleet; keyed by the index
        # snapshot so a commit can never serve stale bytes.
        self.shared_cache = None
        # optional THIRD tier: snapshot-keyed top-k RESULT cache
        # (servecache.ResultCache) — the Zipf head of a query log is
        # answered without touching postings at all; keyed like the
        # posting tier, so a commit rotates results out with it
        self.result_cache = None
        # Q13 (reference Query.cpp:233-261 appends a timestamped query
        # line): JSONL query log, enabled by setting a path
        self.query_log_path: str | None = None

    def _tomb_broadcast(self):
        """Lazy one-time broadcast of the tombstone array for the
        per-shard UDF paths (None when the index has no deletes)."""
        if self._tomb is None:
            return None
        if self._tomb_bc is None:
            self._tomb_bc = self.spark.sparkContext.broadcast(self._tomb)
        return self._tomb_bc

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

    def warm(self, preload_terms: list[str] | None = None) -> "SearchEngine":
        """Interactive-serving mode: pin the postings table in cluster
        memory so a query's pruned fetch hits executor RAM, and
        optionally preload a hot-term list into the driver LRU.  The
        reference does the opposite — it reloads the entire index from
        disk on every CGI request (Query.cpp:59-82).

        Deliberately does NOT collect the full term->df map: at
        10^12-doc scale the vocabulary is 10^8+ terms and a full-vocab
        driver collect is the thing that would not survive — stats ride
        along with each pruned posting fetch instead (one job per set of
        cache-missing terms, amortized to zero for hot terms)."""
        self.postings = self.postings.persist()
        self.postings.count()
        if preload_terms:
            self._term_entries(sorted(set(preload_terms)))
        return self

    # -- query analysis (same tokenizer + eligibility as the index side) --
    def query_terms(self, query: str) -> list[str]:
        toks = oracle.tokenize(query.encode("gb2312"), self.dictionary)
        return sorted(
            {t.decode("gb2312") for t in toks if oracle.eligible(t)}
        )

    def _df_map(self, terms: list[str]) -> dict[str, int]:
        """term -> document frequency (present terms only); consults
        the blob LRU, then a stats-only df cache, then one pruned
        term_stats job for the rest — repeat queries for the same terms
        cost zero jobs (the stats-only cache holds df without blobs;
        absent terms cache as df=0 negatives).  This is also the
        federation hook: aggregating union df across member indexes
        needs STATS only, never posting blobs."""
        out: dict[str, int] = {}
        missing: list[str] = []
        for t in terms:
            e = self._term_cache.get(t)
            if e is None:
                df = self._df_cache.get(t)
                if df is None:
                    missing.append(t)
                    continue
                # true LRU, not FIFO: without the bump, hot query terms
                # evict in insertion order once the cap is hit
                self._df_cache.move_to_end(t)
            else:
                self._term_cache.move_to_end(t)
                df = e[0]
            if df > 0:
                out[t] = int(df)
        if missing and self.shared_cache is not None:
            # shared tier, df-only read (header bytes, never the blob)
            still = []
            for t in missing:
                df = self.shared_cache.get_df(t)
                if df is None:
                    still.append(t)
                    continue
                self._df_cache[t] = df
                if df > 0:
                    out[t] = df
            missing = still
        if missing:
            rows = self.term_stats.filter(
                F.col("term").isin(missing)
            ).select("term", "df").collect()
            found = {r["term"]: int(r["df"]) for r in rows}
            for t in missing:
                df = found.get(t, 0)
                self._df_cache[t] = df
                if df > 0:
                    out[t] = df
            while len(self._df_cache) > self.posting_cache_max_terms:
                self._df_cache.popitem(last=False)
        return out

    def _idf_map(self, terms: list[str]) -> dict[str, float]:
        """term -> idf for present terms (see :meth:`_df_map`)."""
        return {
            t: bm25_idf(self.n_docs, df)
            for t, df in self._df_map(terms).items()
        }

    def _shard_rows(self, terms: list[str]) -> DataFrame:
        return self.postings.filter(F.col("term").isin(terms)).select(
            "shard", "term", "df", "blocks"
        )

    def search(
        self, query: str, k: int = 10, conjunctive: bool = False,
        idf_override: dict | None = None,
        avgdl_override: float | None = None,
        algo: str = "wand",
    ) -> DataFrame:
        """Distributed WAND: per-shard Arrow UDF -> global top-k.

        ``idf_override``/``avgdl_override`` replace this index's own
        statistics — the federation hook (plans/federate.py): a member
        of a multi-index deployment must score with GLOBAL (df, n_docs,
        avgdl) or per-member rankings aren't comparable.  Block-max
        pruning stays sound under an avgdl override by rescaling the
        stored bounds against the member's own encoding avgdl (same
        law as the append drift correction, wand.Cursor)."""
        terms = self.query_terms(query)
        if not terms:
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        if idf_override is not None:
            idf = {t: idf_override[t] for t in terms if t in idf_override}
        else:
            idf = self._idf_map(terms)
        if not idf or (conjunctive and len(idf) < len(terms)):
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        avgdl = self.avgdl
        bscale = self.bound_scale
        if avgdl_override is not None and avgdl_override > 0:
            # bounds were encoded with enc_avgdl = self.avgdl / bscale
            enc_avgdl = self.avgdl / self.bound_scale
            avgdl = float(avgdl_override)
            bscale = max(1.0, avgdl / enc_avgdl)
        b_idf = self.spark.sparkContext.broadcast(idf)
        b_tomb = self._tomb_broadcast()
        n_terms = len(idf)

        def per_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            ex = b_tomb.value if b_tomb is not None else None
            runs = [
                (b_idf.value[t], bytes(b))
                for t, b in zip(pdf["term"], pdf["blocks"])
                if t in b_idf.value
            ]
            if conjunctive:
                if len(runs) < n_terms:
                    return pd.DataFrame({"doc_id": [], "score": []})
                res = wand_mod.intersect_topk_vec(runs, avgdl, k, ex)
            elif algo == "maxscore":
                # second dynamic-pruning algorithm; exact under the
                # same scoring, must return identical results to wand
                res = wand_mod.maxscore_topk_local(
                    runs, avgdl, k, bound_scale=bscale, excluded=ex
                )
            else:
                res = wand_mod.blockmax_topk_local(
                    runs, avgdl, k, bound_scale=bscale, excluded=ex
                )
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

    def search_filtered(
        self, query: str, facet_rows: DataFrame, k: int = 10
    ) -> DataFrame:
        """Facet-restricted serving (the click on a facet sidebar row):
        BM25 over the query terms with results limited to the doc-id
        sets in ``facet_rows`` — one (shard, df, blocks) row per
        doc-range shard from :func:`tse_spark.operators.facets
        .load_facet_rows`, i.e. a partition-pruned scan of the facet
        sidecar.  The ranking law is identical to :meth:`search`
        (corpus-wide idf/avgdl): filtering narrows the RESULT SET, not
        the statistics, so this path shares ``bm25_filtered``'s oracle.

        The allowed set rides into each shard task as a pseudo-term row
        (:data:`facets.ALLOW_TERM` — '#' can't tokenize), unioned into
        the same pruned posting fetch: facet shards follow the posting
        shards' doc-range law, so the mask and the postings meet in the
        same task with no extra shuffle and no doc-id list ever visits
        the driver.  A shard with no allowed docs simply has no mask
        row and contributes nothing; per-shard top-k still composes
        exactly because shards stay disjoint."""
        from tse_spark.operators.facets import ALLOW_TERM

        terms = self.query_terms(query)
        if not terms:
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        idf = self._idf_map(terms)
        if not idf:
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        avgdl = self.avgdl
        b_idf = self.spark.sparkContext.broadcast(idf)
        b_tomb = self._tomb_broadcast()

        def per_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            allow, runs = [], []
            for t, blob in zip(pdf["term"], pdf["blocks"]):
                if t == ALLOW_TERM:
                    allow.append(codec.decode_all(bytes(blob))[0])
                    continue
                i = b_idf.value.get(t)
                if i is None:
                    continue
                d, tf, dl = codec.decode_all(bytes(blob))
                runs.append(
                    (d, wand_mod._score_arrays(i, tf, dl, avgdl))
                )
            if not allow or not runs:
                return pd.DataFrame({"doc_id": [], "score": []})
            al = np.unique(np.concatenate(allow))
            if b_tomb is not None:
                al = al[~wand_mod._in_sorted(al, b_tomb.value)]
            masked = []
            for d, s in runs:
                m = wand_mod._in_sorted(d, al)
                if m.any():
                    masked.append((d[m], s[m]))
            res = wand_mod.topk_from_scored(masked, k)
            return pd.DataFrame(
                {
                    "doc_id": [d for d, _ in res],
                    "score": [s for _, s in res],
                }
            )

        rows = self._shard_rows(sorted(idf)).unionByName(
            facet_rows.select(
                "shard",
                F.lit(ALLOW_TERM).alias("term"),
                "df",
                "blocks",
            )
        )
        local = rows.groupBy("shard").applyInPandas(
            per_shard, schema=RESULT_SCHEMA
        )
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def facet_counts(
        self, query: str, facet_rows: DataFrame
    ) -> DataFrame:
        """Index-only facet sidebar: per-(facet, value) counts of the
        docs matching ANY query term, computed entirely from index
        structures — the union of the query terms' posting doc sets
        intersected with each facet value's doc set inside each
        doc-range shard, partial counts summed across shards (disjoint
        ranges make the sum exact).  The documents table is never
        scanned at serving time; this is how engines keep the sidebar
        as cheap as the ranking.  Shares the declarative
        :func:`tse_spark.operators.textops.facet_counts` oracle.

        ``facet_rows`` is a (facet, value, shard, blocks) relation —
        pass the whole sidecar read (or one facet's directory) from
        :mod:`tse_spark.operators.facets`."""
        from tse_spark.operators.facets import ALLOW_TERM

        out_schema = "facet string, value string, n_docs long"
        terms = self.query_terms(query)
        if not terms:
            return self.spark.createDataFrame([], out_schema)
        b_tomb = self._tomb_broadcast()

        def per_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            match_parts, frows = [], []
            for t, fc, v, blob in zip(
                pdf["term"], pdf["facet"], pdf["value"], pdf["blocks"]
            ):
                if t == ALLOW_TERM:
                    frows.append((fc, v, bytes(blob)))
                else:
                    match_parts.append(
                        codec.decode_all(bytes(blob))[0]
                    )
            if not match_parts or not frows:
                return pd.DataFrame(
                    {"facet": [], "value": [], "n_docs": []}
                )
            match = np.unique(np.concatenate(match_parts))
            if b_tomb is not None:
                match = match[~wand_mod._in_sorted(match, b_tomb.value)]
            fs, vs, ns = [], [], []
            for fc, v, blob in frows:
                d = codec.decode_all(blob)[0]
                n = int(wand_mod._in_sorted(d, match).sum())
                if n > 0:
                    fs.append(fc)
                    vs.append(v)
                    ns.append(n)
            return pd.DataFrame(
                {"facet": fs, "value": vs, "n_docs": ns}
            )

        rows = self._shard_rows(sorted(set(terms))).select(
            "shard",
            "term",
            F.lit(None).cast("string").alias("facet"),
            F.lit(None).cast("string").alias("value"),
            "blocks",
        ).unionByName(
            facet_rows.select(
                "shard",
                F.lit(ALLOW_TERM).alias("term"),
                F.col("facet").cast("string"),
                F.col("value").cast("string"),
                "blocks",
            )
        )
        partial = rows.groupBy("shard").applyInPandas(
            per_shard, schema=out_schema
        )
        return partial.groupBy("facet", "value").agg(
            F.sum("n_docs").alias("n_docs")
        )

    def _boolean_buckets(
        self, query: str
    ) -> tuple[list[str], list[str], list[str], bool]:
        """Parse + normalize a boolean query into
        ``(optional, required, excluded, contradiction)`` with every
        bucket routed through the index's own tokenizer (one law for
        query and index).  A term both required and excluded is a
        contradiction (no doc can satisfy it) — flagged so callers
        return empty; an optional term that is also excluded can never
        contribute (its docs are all masked), so it is dropped; an
        optional term that is also required is folded into required."""
        optional, required, excluded, phrases = parse_boolean_query(query)
        if phrases:
            raise ValueError(
                "quoted phrases are served by the positional index "
                "(operators/positions.py phrase_snippet_topk); "
                "search_boolean takes bare/+/- terms only"
            )
        req = self.query_terms(" ".join(required))
        exc = self.query_terms(" ".join(excluded))
        contradiction = bool(set(req) & set(exc))
        drop = set(req) | set(exc)
        opt = [t for t in self.query_terms(" ".join(optional)) if t not in drop]
        return opt, req, exc, contradiction

    def search_boolean(self, query: str, k: int = 10) -> DataFrame:
        """Distributed boolean serving: ``+term`` must match, ``-term``
        must not, plain terms score optionally (disjunctive BM25 over
        required + optional — a required term both gates and scores).

        One pruned posting fetch covers scoring AND excluded terms
        (same pushed-down term IN as :meth:`search`); shards are
        disjoint doc-id ranges, so an excluded term's postings can only
        mask docs inside their own shard — exclusion never crosses the
        shard boundary and the per-shard top-k lists still compose
        exactly.  Exclusion is applied before top-k selection inside
        :func:`tse_spark.operators.wand.boolean_topk_scored`."""
        opt, req, exc, contradiction = self._boolean_buckets(query)
        scoring = sorted(set(opt) | set(req))
        if contradiction or not scoring:
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        idf = self._idf_map(sorted(set(scoring) | set(exc)))
        if any(t not in idf for t in req) or not any(
            t in idf for t in scoring
        ):
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        avgdl = self.avgdl
        n_req = len(req)
        sc = self.spark.sparkContext
        b_idf = sc.broadcast({t: idf[t] for t in scoring if t in idf})
        b_req = sc.broadcast(frozenset(req))
        b_exc = sc.broadcast(frozenset(t for t in exc if t in idf))
        b_tomb = self._tomb_broadcast()

        def per_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            req_runs, opt_runs, exc_docs = [], [], []
            for t, blob in zip(pdf["term"], pdf["blocks"]):
                if t in b_exc.value:
                    exc_docs.append(codec.decode_all(bytes(blob))[0])
                    continue
                i = b_idf.value.get(t)
                if i is None:
                    continue
                d, tf, dl = codec.decode_all(bytes(blob))
                run = (d, wand_mod._score_arrays(i, tf, dl, avgdl))
                (req_runs if t in b_req.value else opt_runs).append(run)
            if len(req_runs) < n_req:
                # a required term has no postings in this doc range
                return pd.DataFrame({"doc_id": [], "score": []})
            if b_tomb is not None:
                exc_docs.append(b_tomb.value)
            ex = (
                np.unique(np.concatenate(exc_docs)) if exc_docs else None
            )
            res = wand_mod.boolean_topk_scored(req_runs, opt_runs, k, ex)
            return pd.DataFrame(
                {
                    "doc_id": [d for d, _ in res],
                    "score": [s for _, s in res],
                }
            )

        terms = sorted(set(scoring) | set(t for t in exc if t in idf))
        local = self._shard_rows(terms).groupBy("shard").applyInPandas(
            per_shard, schema=RESULT_SCHEMA
        )
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def _expansion_buckets(
        self, query: str, synonyms: list[list[str]]
    ) -> tuple[list[str], list[list[str]]]:
        """Normalize query + synonym groups through the index tokenizer
        and split into (plain terms, active groups): a group is active
        only when the query matched one of its members; the group then
        replaces that member and scores by its best-matching present
        member (``#syn`` semantics — expansion follows the query, a
        synonym table entry the query never touched adds nothing)."""
        qterms = self.query_terms(query)
        groups = []
        claimed: set[str] = set()
        for g in synonyms:
            gt = self.query_terms(" ".join(g))
            if set(gt) & set(qterms):
                groups.append(gt)
                claimed |= set(gt)
        plain = [t for t in qterms if t not in claimed]
        return plain, groups

    def search_expanded(
        self, query: str, synonyms: list[list[str]], k: int = 10
    ) -> DataFrame:
        """Distributed synonym-expanded serving: each active synonym
        group contributes the MAX of its members' BM25 addends per doc
        (one concept never double-counts; each member scores with its
        own idf), plain terms sum as usual.  One pruned posting fetch
        covers all expanded terms; the group-max fold happens per shard
        on scored runs (wand.synmax_run) before the usual disjunctive
        top-k, so the expansion adds zero extra scans or shuffles.
        Oracle-parity twin: :func:`index_build.bm25_expanded_topk`."""
        plain, groups = self._expansion_buckets(query, synonyms)
        allt = sorted(set(plain) | {t for g in groups for t in g})
        if not allt:
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        idf = self._idf_map(allt)
        if not idf:
            return self.spark.createDataFrame([], RESULT_SCHEMA)
        avgdl = self.avgdl
        sc = self.spark.sparkContext
        b_idf = sc.broadcast(idf)
        # term -> group ordinal; plain terms are their own group
        b_grp = sc.broadcast(
            {t: i for i, g in enumerate(groups) for t in g}
        )
        b_tomb = self._tomb_broadcast()

        def per_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            plain_runs, grp_runs = [], {}
            for t, blob in zip(pdf["term"], pdf["blocks"]):
                i = b_idf.value.get(t)
                if i is None:
                    continue
                d, tf, dl = codec.decode_all(bytes(blob))
                run = (d, wand_mod._score_arrays(i, tf, dl, avgdl))
                g = b_grp.value.get(t)
                if g is None:
                    plain_runs.append(run)
                else:
                    grp_runs.setdefault(g, []).append(run)
            runs = plain_runs + [
                wand_mod.synmax_run(rs) for rs in grp_runs.values()
            ]
            res = wand_mod.topk_from_scored(
                runs, k,
                excluded=b_tomb.value if b_tomb is not None else None,
            )
            return pd.DataFrame(
                {
                    "doc_id": [d for d, _ in res],
                    "score": [s for _, s in res],
                }
            )

        local = self._shard_rows(allt).groupBy("shard").applyInPandas(
            per_shard, schema=RESULT_SCHEMA
        )
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def search_expanded_local(
        self, query: str, synonyms: list[list[str]], k: int = 10
    ) -> list[tuple[int, float]]:
        """Interactive twin of :meth:`search_expanded` over the
        scored-posting cache."""
        plain, groups = self._expansion_buckets(query, synonyms)
        allt = sorted(set(plain) | {t for g in groups for t in g})
        if not allt:
            return []
        import time as _t

        t0 = _t.time()
        entries = self._term_entries(allt)
        present = [t for t in allt if entries[t][0] > 0]
        if not present:
            return []
        decoded = self._decoded_runs(present, entries)
        pset = set(present)
        runs = [decoded[t] for t in plain if t in pset]
        for g in groups:
            members = [decoded[t] for t in g if t in pset]
            if members:
                runs.append(wand_mod.synmax_run(members))
        out = wand_mod.topk_from_scored(runs, k, n_docs=self.n_docs)
        self._log_query(query, k, len(out), (_t.time() - t0) * 1000.0)
        return out

    def search_boolean_local(
        self, query: str, k: int = 10
    ) -> list[tuple[int, float]]:
        """Interactive twin of :meth:`search_boolean`, served from the
        scored-posting cache (the excluded terms' cached doc arrays are
        the exclusion mask — their scores are simply unused)."""
        opt, req, exc, contradiction = self._boolean_buckets(query)
        scoring = sorted(set(opt) | set(req))
        if contradiction or not scoring:
            return []
        import time as _t

        t0 = _t.time()
        entries = self._term_entries(sorted(set(scoring) | set(exc)))
        present = {t for t, (df, _) in entries.items() if df > 0}
        if any(t not in present for t in req) or not (
            present & set(scoring)
        ):
            return []
        decoded = self._decoded_runs(
            sorted(present & (set(scoring) | set(exc))), entries
        )
        req_runs = [decoded[t] for t in req]
        opt_runs = [decoded[t] for t in opt if t in present]
        exc_arrs = [decoded[t][0] for t in exc if t in present]
        ex = np.unique(np.concatenate(exc_arrs)) if exc_arrs else None
        out = wand_mod.boolean_topk_scored(req_runs, opt_runs, k, ex)
        self._log_query(query, k, len(out), (_t.time() - t0) * 1000.0)
        return out

    def _term_entries(self, terms: list[str]) -> dict[str, tuple[int, bytes]]:
        """(df, merged doc-ascending posting blob) per term, LRU-cached
        on the driver; ONE pruned collect for all cache-missing terms.
        Shards are ascending disjoint doc-id ranges and blocks are
        self-delimiting, so per-term shard blobs concatenate (in shard
        order) into one valid run — one scoring pass per query instead
        of one per shard, and repeat terms skip the Spark job entirely
        (the reference reloads the WHOLE index per request,
        Query.cpp:59-82; this keeps just the hot working set).  df rides
        along in the same rows, so stats cost no separate job; absent
        terms cache as (0, b'') negatives."""
        out: dict[str, tuple[int, bytes]] = {}
        missing: list[str] = []
        for t in terms:
            e = self._term_cache.get(t)
            if e is not None:
                self._term_cache.move_to_end(t)
                out[t] = e
            else:
                missing.append(t)
        if missing and self.shared_cache is not None:
            # shared tier: another replica's fill (or negative) serves
            # this one without a Spark job
            still = []
            for t in missing:
                e = self.shared_cache.get(t)
                if e is None:
                    still.append(t)
                    continue
                out[t] = e
                self._term_cache[t] = e
                while len(self._term_cache) > self.posting_cache_max_terms:
                    self._term_cache.popitem(last=False)
            missing = still
        if missing:
            by_term: dict[str, list[tuple[int, bytes]]] = {}
            dfs: dict[str, int] = {}
            for r in self._shard_rows(missing).collect():
                by_term.setdefault(r["term"], []).append(
                    (r["shard"], bytes(r["blocks"]))
                )
                dfs[r["term"]] = dfs.get(r["term"], 0) + int(r["df"])
            for t in missing:
                blob = b"".join(b for _, b in sorted(by_term.get(t, [])))
                entry = (dfs.get(t, 0), blob)
                out[t] = entry
                self._term_cache[t] = entry
                if self.shared_cache is not None:
                    # write-through (atomic, immutable per snapshot key)
                    self.shared_cache.put(t, entry[0], entry[1])
                while len(self._term_cache) > self.posting_cache_max_terms:
                    self._term_cache.popitem(last=False)
        return out

    def _decoded_runs(
        self, terms: list[str], entries: dict[str, tuple[int, bytes]]
    ) -> dict[str, tuple]:
        """term -> (docs int32, scores float64) via the byte-budgeted
        LRU; a cache miss decodes the term's merged blob and scores it
        ONCE with this engine's fixed (idf, avgdl).  Tombstoned docs are
        dropped AT CACHE FILL, so every scored-cache consumer
        (search_local, boolean/expanded local, intersect/synmax) serves
        only surviving docs with zero per-query masking cost; the
        engine's tombstone set is fixed for its lifetime (delete_docs
        returns a fresh handle), so cached entries never go stale."""
        from tse_spark.operators import codec

        out: dict[str, tuple] = {}
        for t in terms:
            arrs = self._decoded_cache.get(t)
            if arrs is None:
                docs, tfs, dls = codec.decode_all(entries[t][1])
                if self._tomb is not None and len(docs):
                    m = ~wand_mod._in_sorted(docs, self._tomb)
                    docs, tfs, dls = docs[m], tfs[m], dls[m]
                if len(docs) == 0 or docs.max() < 2**31:
                    docs = docs.astype(np.int32, copy=False)
                scores = wand_mod._score_arrays(
                    bm25_idf(self.n_docs, entries[t][0]), tfs, dls,
                    self.avgdl,
                )
                arrs = (docs, scores)
                self._decoded_cache[t] = arrs
                self._decoded_bytes += sum(a.nbytes for a in arrs)
            else:
                self._decoded_cache.move_to_end(t)
            out[t] = arrs
        # enforce the budget on EVERY access (a lowered budget must take
        # effect on hit-only traffic too); the current query's terms sit
        # at the LRU tail, so they are evicted last
        while (
            self._decoded_bytes > self.decoded_cache_budget
            and len(self._decoded_cache) > 1
        ):
            _, old = self._decoded_cache.popitem(last=False)
            self._decoded_bytes -= sum(a.nbytes for a in old)
        return out

    def search_local(
        self, query: str, k: int = 10, conjunctive: bool = False
    ) -> list[tuple[int, float]]:
        """Low-latency in-process serving: one collect of the query's
        shard rows (stats + blobs together), then WAND on the driver
        with shard results merged."""
        terms = self.query_terms(query)
        if not terms:
            return []
        rkey = None
        if self.result_cache is not None:
            # canonical form is built AFTER segmentation, so surface
            # variants of the same term sequence share one entry
            mode = "and" if conjunctive else "or"
            rkey = self.result_cache.canonical(terms, k, mode)
            cached = self.result_cache.get(rkey)
            if cached is not None:
                self._log_query(query, k, len(cached), 0.0)
                return cached
        entries = self._term_entries(terms)
        idf = {
            t: bm25_idf(self.n_docs, df)
            for t, (df, _) in entries.items()
            if df > 0
        }
        if not idf or (conjunctive and len(idf) < len(terms)):
            if rkey is not None:  # negative results are snapshot-stable
                self.result_cache.put(rkey, [])
            return []
        import time as _t

        t0 = _t.time()
        present = sorted(idf)
        decoded = self._decoded_runs(present, entries)
        runs = [decoded[t] for t in present]
        if conjunctive:
            if len(runs) < len(terms):
                out: list[tuple[int, float]] = []
            else:
                out = wand_mod.intersect_topk_scored(runs, k)
        else:
            # addends were scored exactly with the LIVE avgdl at cache
            # fill — no block-max pruning on this path, so no
            # bound_scale correction is needed either
            out = wand_mod.topk_from_scored(runs, k, n_docs=self.n_docs)
        out = out[:k]
        if rkey is not None:
            self.result_cache.put(rkey, out)
        self._log_query(query, k, len(out), (_t.time() - t0) * 1000.0)
        return out
