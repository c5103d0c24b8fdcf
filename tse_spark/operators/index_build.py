"""Inverted-index build dataflow (SURVEY.md §2.4, B1-B7) — Spark-first.

Replaces the reference's 6-process pipeline (index/readme.txt:11-28:
DocIndex -> sort|uniq -> DocSegment -> CrtForwardIdx -> sort ->
CrtInvertedIdx) with one declarative DAG:

    pages --dedup(url)--> --deterministic doc_id--> docs
    docs --pandas UDF (extract+tokenize+per-doc tf)--> explode --> tf
    tf --groupBy--> doclen / df / corpus stats
    tf --range-salted repartition-by-term + applyInPandas codec--> postings

Scale notes (10^12 docs):
- doc_id assignment is a *rank over md5(url)* computed JVM-side with
  uniform md5-prefix range buckets + per-bucket windows — no
  single-partition Window, no ``monotonically_increasing_id`` (ids must
  be identical at any parallelism, SURVEY.md §7 determinism risk).
- tf is pre-aggregated inside the tokenizer UDF (one output row per
  (doc, term), not per occurrence), i.e. map-side combine before any
  shuffle (B4+B6 fused).
- the 2..8-byte term filter (CrtInvertedIdx.cpp:25) is applied inside
  the UDF, before the shuffle (§4: constant filter pre-groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tse_spark import oracle
from tse_spark.functions import extraction


# ---------------------------------------------------------------------------
# B1/B2: dedup + deterministic dense doc ids
# ---------------------------------------------------------------------------

def dedup_pages(pages: DataFrame) -> DataFrame:
    """URL dedup (B2; reference index/readme.txt:14 ``sort|uniq``).
    Fixture duplicates carry identical content, so survivor choice is
    immaterial; at scale prefer ``max_by(warc_ts)`` semantics if
    re-crawls differ — kept as dropDuplicates for plan simplicity."""
    return pages.dropDuplicates(["url"])


def _hkey_bucket(order_col: str, num_buckets: int):
    """(md5-hex, range-bucket) column expressions for ``order_col``.

    md5 is uniform, so the first 16 bits of the digest give perfectly
    balanced deterministic range buckets with no sampling, no counts,
    no data-dependent boundaries.  The md5 ordering itself is
    reference-faithful: the url index ships sorted by md5
    (``sort Url.idx | uniq``, index/readme.txt:14; binary-searched in
    Snapshot.cpp:106-120)."""
    h = F.md5(F.col(order_col).cast("string"))
    bucket = (
        F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
        * num_buckets
        / F.lit(65536)
    ).cast("int")
    return h, bucket


def assign_doc_ids(
    df: DataFrame, order_col: str = "url", num_partitions: int | None = None
) -> DataFrame:
    """Dense deterministic doc ids: global rank over **md5(order_col)**
    (B1; the reference assigns scan-order ints, DocIndex.cpp:74,96, and
    keys its url index by sorted md5).

    Fully JVM-side, parallelism-independent (SURVEY.md §7 — the
    2-cluster-size bench would expose any violation as rank mismatches):

      1. ``bucket = first-16-bits(md5(key)) * NB / 65536`` — pure
         deterministic column expression;
      2. exact per-bucket counts -> bucket offset map (tiny collect of
         NB rows);
      3. ``row_number`` over Window(partitionBy=bucket, orderBy=md5)
         + broadcast-joined bucket offset.  One shuffle, no Python in
         the row path, whole-stage codegen end to end.

    No single-partition Window, no ``monotonically_increasing_id``, no
    ``repartitionByRange`` (whose per-job sampling seeds can shift
    partition boundaries *between* jobs, silently corrupting ids).

    ``order_col`` values must be unique (run after :func:`dedup_pages`).
    """
    from pyspark.sql.window import Window

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    num_buckets = min(max(num_partitions * 8, 1), 65536)

    h, bucket = _hkey_bucket(order_col, num_buckets)
    with_b = df.withColumn("__hkey", h).withColumn("__bucket", bucket)

    # exclusive prefix sum of per-bucket counts as a broadcast subplan
    # (no driver collect; single-partition window over NB rows only)
    offs_df = (
        with_b.groupBy("__bucket")
        .count()
        .select(
            "__bucket",
            F.coalesce(
                F.sum("count").over(
                    Window.orderBy("__bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("__offset"),
        )
    )

    w = Window.partitionBy("__bucket").orderBy("__hkey")
    out = (
        with_b.join(F.broadcast(offs_df), "__bucket")
        .withColumn(
            "doc_id",
            (F.col("__offset") + F.row_number().over(w) - F.lit(1)).cast(
                "long"
            ),
        )
        .drop("__bucket", "__hkey", "__offset")
    )
    return out.select("doc_id", *df.columns)


def build_docs(
    pages: DataFrame,
    num_partitions: int | None = None,
    force_extract: bool = False,
) -> DataFrame:
    """``docs(doc_id, url, warc_ts, text, lang, content_md5)`` from the
    raw pages table.  If ``text`` is absent (raw crawl) — or
    ``force_extract`` — it is derived from ``html`` with the byte-exact
    extraction UDF (T2-T4).

    Fused single-shuffle plan: instead of dropDuplicates (url-hash
    shuffle) followed by the rank shuffle, both dedup and id assignment
    ride ONE exchange on the md5-range bucket — duplicates share
    md5(url), hence a bucket, so ``lag`` spots them and ``dense_rank``
    counts each url once.  Extraction + content-md5 run on the scan side
    and html is dropped before the exchange, so only the extracted text
    crosses the wire.
    """
    from pyspark.sql.window import Window

    spark = pages.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    num_buckets = min(max(num_partitions * 8, 1), 65536)

    # heavy per-byte work (extraction automaton, content md5) BEFORE the
    # exchange, so the raw html bytes never cross the wire — the shuffle
    # then carries only the extracted text; ~1% of pages are url-dupes
    # whose extraction is wasted, a good trade against shuffling html
    if force_extract or "text" not in pages.columns:
        pages = pages.withColumn(
            "text", extraction.make_extract_text_udf()(F.col("html"))
        )
    pages = pages.withColumn("content_md5", F.md5(F.col("html"))).drop("html")

    h, bucket = _hkey_bucket("url", num_buckets)
    with_b = pages.withColumn("__hkey", h).withColumn("__bucket", bucket)

    # bucket -> global offset = exclusive prefix sum of exact per-bucket
    # distinct-url counts.  Declared as a broadcast subplan instead of a
    # driver collect: the url-pruned count scan and the NB-row cumsum
    # window run inside the same query (one py4j round-trip fewer per
    # build — measured fixed cost, not data cost).  The single-partition
    # window is over NB <= 65536 aggregated rows, never the data.
    from pyspark.sql.window import Window as _W

    offs_df = (
        with_b.groupBy("__bucket")
        .agg(F.count_distinct("__hkey").alias("__n"))
        .select(
            "__bucket",
            F.coalesce(
                F.sum("__n").over(
                    _W.orderBy("__bucket").rowsBetween(
                        _W.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("__offset"),
        )
    )

    # one shuffle by bucket; two window specs share it (same partition
    # key, compatible sort prefixes -> Catalyst plans one Exchange)
    w_first = Window.partitionBy("__bucket").orderBy("__hkey", "warc_ts")
    w_rank = Window.partitionBy("__bucket").orderBy("__hkey")
    docs = (
        with_b.withColumn(
            "__is_first",
            F.lag("__hkey").over(w_first).isNull()
            | (F.lag("__hkey").over(w_first) != F.col("__hkey")),
        )
        .withColumn("__rank", F.dense_rank().over(w_rank))
        .filter(F.col("__is_first"))
        .join(F.broadcast(offs_df), "__bucket")
        .withColumn(
            "doc_id",
            (F.col("__offset") + F.col("__rank") - F.lit(1)).cast("long"),
        )
    )
    return docs.select("doc_id", "url", "warc_ts", "text", "lang", "content_md5")


def extract_text_df(pages: DataFrame) -> DataFrame:
    """(url, text) with text re-derived from html — used by the
    byte-identity invariant test (BASELINE.json input_hint)."""
    return pages.select(
        "url",
        extraction.make_extract_text_udf()(F.col("html")).alias("text"),
    )


# ---------------------------------------------------------------------------
# B3-B6: term frequencies (two tokenizer paths)
# ---------------------------------------------------------------------------

def build_tf(docs: DataFrame, dict_broadcast) -> DataFrame:
    """``tf(doc_id, term, tf)`` via the TSE tokenizer (K1/K2 + 2..8-byte
    filter), pre-aggregated per document inside the Arrow UDF."""
    udf = extraction.make_term_freqs_udf(dict_broadcast)
    pairs = docs.select(
        "doc_id", F.explode(udf(F.col("text"))).alias("p")
    )
    return pairs.select(
        "doc_id",
        F.col("p.term").alias("term"),
        F.col("p.tf").cast("long").alias("tf"),
    )


def build_tf_dl(docs: DataFrame, dict_broadcast) -> DataFrame:
    """``(doc_id, term, tf, dl)`` — like :func:`build_tf` but with the
    doc length inline (emitted by the UDF), so the posting build avoids
    a doclen join/window shuffle entirely."""
    udf = extraction.make_term_freqs_dl_udf(dict_broadcast)
    r = docs.select("doc_id", udf(F.col("text")).alias("r"))
    return r.select(
        "doc_id",
        F.explode(F.col("r.pairs")).alias("p"),
        F.col("r.dl").cast("long").alias("dl"),
    ).select(
        "doc_id",
        F.col("p.term").alias("term"),
        F.col("p.tf").cast("long").alias("tf"),
        "dl",
    )


def ws_token_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The pre-aggregation ``(doc_id, term)`` token stream of the
    whitespace tokenizer with the 2..8-byte eligibility filter
    (CrtInvertedIdx.cpp:25) applied — one row per OCCURRENCE, all
    whole-stage codegen.  Consumers that can aggregate later than the
    tf grain (percolation's sparse match join) read this directly and
    skip the full-delta (doc, term) shuffle."""
    return docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
    ).filter(
        (F.octet_length("term") >= oracle.MIN_TERM_BYTES)
        & (F.octet_length("term") <= oracle.MAX_TERM_BYTES)
    )


def build_tf_ws(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``tf(doc_id, term, tf)`` via the whitespace tokenizer — fully
    JVM-side (split + explode + groupBy, whole-stage codegen; no Python)
    for already-clean text like the driver's ``documents`` table.  The
    2..8-byte eligibility filter applies inside :func:`ws_token_stream`,
    pushed before the aggregation shuffle."""
    return (
        ws_token_stream(docs, text_col)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


# ---------------------------------------------------------------------------
# B7: side stats for BM25
# ---------------------------------------------------------------------------

def build_doclen(tf: DataFrame) -> DataFrame:
    """``doclen(doc_id, dl)`` — dl = count of index-eligible tokens."""
    return tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))


def build_df_stats(tf: DataFrame) -> DataFrame:
    """``dfreq(term, df)`` — document frequency per term."""
    return tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def corpus_stats(doclen: DataFrame) -> tuple[int, float]:
    row = doclen.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"] or 0.0)


def build_postings_flat(tf: DataFrame) -> DataFrame:
    """Uncompressed postings ``(term, df, postings: array<struct<doc_id,tf>>)``
    with doc_id-ascending posting order (B6).  The compressed shard path
    (delta-gap varint blocks, salted build) lives in operators/codec.py."""
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sort_array(
            F.collect_list(F.struct("doc_id", "tf"))
        ).alias("postings"),
    )


# ---------------------------------------------------------------------------
# Q4-Q8 (naive declarative path): BM25 scoring via joins
# ---------------------------------------------------------------------------

def bm25_topk(
    spark: SparkSession,
    tf: DataFrame,
    doclen: DataFrame,
    dfreq: DataFrame,
    n_docs: int,
    avgdl: float,
    terms: list[str],
    k: int = 10,
    conjunctive: bool = False,
) -> DataFrame:
    """Declarative BM25 top-k: broadcast the query terms, prune tf, join
    stats, aggregate, TakeOrderedAndProject.  This is the oracle-parity
    path; the scale path is WAND over compressed shards (operators/wand).

    Returns ``(doc_id, score)`` ordered by score desc, doc_id asc.
    """
    terms = sorted(set(terms))
    if not terms:
        return spark.createDataFrame(
            [], "doc_id long, score double"
        )
    agg = bm25_scores(spark, tf, doclen, dfreq, n_docs, avgdl, terms)
    if conjunctive:
        agg = agg.filter(F.col("nterms") == len(terms))
    return (
        agg.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_boolean_topk(
    spark: SparkSession,
    tf: DataFrame,
    doclen: DataFrame,
    dfreq: DataFrame,
    n_docs: int,
    avgdl: float,
    positive: list[str],
    required: list[str] = (),
    excluded: list[str] = (),
    k: int = 10,
) -> DataFrame:
    """Declarative boolean BM25 top-k (the web search box's
    ``term +must -mustnot`` syntax the reference's CGI parser never
    grew): a doc must contain ALL ``required`` terms and NONE of
    ``excluded``; the score is the disjunctive BM25 sum over
    ``positive`` + ``required`` (a required term gates AND scores —
    classic ``+term`` semantics).  Oracle-parity path; the serving
    path is :meth:`SearchEngine.search_boolean` over posting shards.

    Scale shape: all three legs are pruned scans of the SAME tf
    relation with a pushed-down term IN — no leg ever reads the full
    vocabulary.  The required gate is a semi-join against a term-count
    aggregate of the required postings; exclusion is an anti hash-join
    against the excluded terms' distinct doc ids (both sides shuffle on
    doc_id, and AQE broadcasts whichever posting set is small).  An
    empty scoring set returns no rows (pure-negative queries are
    unanswerable without a full corpus scan — same rule as the engine).
    """
    required = sorted(set(required))
    excluded = sorted(set(excluded))
    if set(required) & set(excluded):
        return spark.createDataFrame([], "doc_id long, score double")
    scoring = sorted((set(positive) | set(required)) - set(excluded))
    if not scoring:
        return spark.createDataFrame([], "doc_id long, score double")
    agg = bm25_scores(spark, tf, doclen, dfreq, n_docs, avgdl, scoring)
    if required:
        ok = (
            tf.filter(F.col("term").isin(required))
            .groupBy("doc_id")
            .agg(F.count_distinct("term").alias("nreq"))
            .filter(F.col("nreq") == len(required))
            .select("doc_id")
        )
        agg = agg.join(ok, "doc_id", "left_semi")
    if excluded:
        bad = (
            tf.filter(F.col("term").isin(excluded))
            .select("doc_id")
            .distinct()
        )
        agg = agg.join(bad, "doc_id", "left_anti")
    return (
        agg.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_scores(
    spark: SparkSession,
    tf: DataFrame,
    doclen: DataFrame,
    dfreq: DataFrame,
    n_docs: int,
    avgdl: float,
    terms: list[str],
) -> DataFrame:
    """Per-doc BM25 partial sums ``(doc_id, score, nterms)`` over the
    matched query terms — the composable core of :func:`bm25_topk`,
    reused by field-combining scorers (:func:`bm25f_topk`)."""
    per_term = bm25_per_term(spark, tf, doclen, dfreq, n_docs, avgdl, terms)
    return per_term.groupBy("doc_id").agg(
        F.sum("s").alias("score"), F.count(F.lit(1)).alias("nterms")
    )


def bm25_per_term(
    spark: SparkSession,
    tf: DataFrame,
    doclen: DataFrame,
    dfreq: DataFrame,
    n_docs: int,
    avgdl: float,
    terms: list[str],
    detail: bool = False,
) -> DataFrame:
    """Pre-aggregation BM25 addends ``(doc_id, term, s)`` for the query
    terms (one row per matched (doc, term) — tf is already per-pair
    unique), shared by the sum (:func:`bm25_scores`) and group-max
    (:func:`bm25_expanded_topk`) combiners.  ``detail=True`` keeps the
    formula inputs (tf, df, dl, idf) alongside ``s`` — the explain
    surface (:func:`bm25_explain`)."""
    if len(terms) <= 64:
        # short queries: a pushed-down IN predicate prunes the tf scan
        # with zero extra jobs (a broadcast join would schedule a
        # createDataFrame job + a broadcast exchange per side)
        tf_q = tf.filter(F.col("term").isin(terms))
        df_q = dfreq.filter(F.col("term").isin(terms))
    else:
        qt = spark.createDataFrame([(t,) for t in terms], "term string")
        tf_q = tf.join(F.broadcast(qt), "term")
        df_q = dfreq.join(F.broadcast(qt), "term")
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    k1, b = oracle.BM25_K1, oracle.BM25_B
    per_term = (
        tf_q.join(F.broadcast(df_q), "term")
        .join(doclen, "doc_id")
        .withColumn(
            "s",
            idf
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
            ),
        )
    )
    if detail:
        return per_term.select(
            "doc_id", "term", "tf", "df", "dl", idf.alias("idf"), "s"
        )
    return per_term.select("doc_id", "term", "s")


def bm25_explain(
    spark: SparkSession,
    tf: DataFrame,
    doclen: DataFrame,
    dfreq: DataFrame,
    n_docs: int,
    avgdl: float,
    terms: list[str],
    k: int = 10,
) -> DataFrame:
    """Score EXPLAIN: the per-term BM25 decomposition for the top-k
    docs — one row per (doc, matched query term) with the formula
    inputs (tf, df, dl, idf) and the term's contribution, plus the
    doc's total score.  The 'why does this doc rank here' serving
    surface (relevance debugging, quality triage); the reference
    exposes no such introspection (tse/SearchCGI.cpp prints final
    scores only).

    The top-k cut is bm25_topk's exact law (exact score desc, doc_id),
    so explain rows always describe exactly the docs bm25_topk
    returns; detail rows for the winners broadcast-join back against
    the pruned per-term relation — two scans of the SAME pushed-down
    tf subset, no extra corpus pass."""
    terms = sorted(set(terms))
    if not terms:
        return spark.createDataFrame(
            [],
            "doc_id long, term string, tf long, df long, dl long,"
            " idf double, contrib double, score double",
        )
    per = bm25_per_term(
        spark, tf, doclen, dfreq, n_docs, avgdl, terms, detail=True
    )
    top = (
        per.groupBy("doc_id")
        .agg(F.sum("s").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    return per.join(F.broadcast(top), "doc_id").select(
        "doc_id",
        "term",
        "tf",
        "df",
        "dl",
        F.round("idf", 6).alias("idf"),
        F.round("s", 4).alias("contrib"),
        F.round("score", 4).alias("score"),
    )


def bm25_filtered_topk(
    spark: SparkSession,
    tf: DataFrame,
    doclen: DataFrame,
    dfreq: DataFrame,
    n_docs: int,
    avgdl: float,
    terms: list[str],
    allowed: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Facet-filtered search — the click on a :func:`facet_counts` row:
    BM25 over ``terms`` restricted to the docs in ``allowed`` (a doc_id
    relation, e.g. ``documents.filter(lang == 'en')``).  Corpus
    statistics (df, avgdl) deliberately stay corpus-wide: the filter
    narrows the RESULT SET, not the ranking law — how engines serve
    facet-restricted queries without maintaining one index per facet.

    Returns ``(doc_id, score)`` ordered score desc, doc_id asc.

    Scale shape: the semi-join lands on the per-doc score aggregate
    (cardinality ≤ matching docs, already pruned by the query terms),
    never on the raw tf scan; AQE broadcasts whichever side is small;
    the final order is TakeOrderedAndProject, no global sort."""
    agg = bm25_scores(
        spark, tf, doclen, dfreq, n_docs, avgdl, sorted(set(terms))
    )
    hit = agg.join(
        allowed.select("doc_id").distinct(), "doc_id", "left_semi"
    )
    return (
        hit.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def more_like_this(
    spark: SparkSession,
    tf: DataFrame,
    doclen: DataFrame,
    n_docs: int,
    avgdl: float,
    seed_doc_id: int,
    n_terms: int = 5,
    k: int = 10,
) -> DataFrame:
    """Related-documents query ("more like this", the link next to every
    result in a classic engine): the seed document's top ``n_terms``
    tf-idf keywords (same rounded law and tie order as
    :func:`tse_spark.operators.textops.doc_keywords`) become a BM25
    query over the corpus, with the seed itself excluded.

    Returns ``(doc_id, score)`` ordered score desc, doc_id asc.

    Scale shape: the seed filter is a pushed-down point predicate on the
    tf table; keyword df comes from ONE aggregate over tf pruned by a
    broadcast semi-join to the seed's vocabulary (never the full
    vocabulary shuffle); the keyword-ranking window covers a single
    document's terms (bounded by its doclen, so the unpartitioned
    window is a few hundred rows by construction); scoring then joins
    the broadcast keyword list into the standard pruned-scan BM25 shape.
    The keyword list never leaves the cluster — no driver collect
    between the two halves, so the whole query composes into one plan.
    """
    sid = int(seed_doc_id)
    seed = tf.filter(F.col("doc_id") == sid).select(
        "term", F.col("tf").alias("seed_tf")
    )
    dfq = (
        tf.join(F.broadcast(seed.select("term")), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    kscore = F.round(
        F.col("seed_tf").cast("double")
        * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
        4,
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("kscore"), F.asc("term"))
    kw = (
        seed.join(dfq, "term")
        .select("term", "df", kscore.alias("kscore"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(n_terms))
        .select("term", "df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    k1, b = oracle.BM25_K1, oracle.BM25_B
    per = (
        tf.join(F.broadcast(kw), "term")
        .filter(F.col("doc_id") != sid)
        .join(doclen, "doc_id")
        .withColumn(
            "s",
            idf
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
            ),
        )
    )
    return (
        per.groupBy("doc_id")
        .agg(F.sum("s").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_expanded_topk(
    spark: SparkSession,
    tf: DataFrame,
    doclen: DataFrame,
    dfreq: DataFrame,
    n_docs: int,
    avgdl: float,
    terms: list[str],
    groups: list[list[str]] = (),
    k: int = 10,
) -> DataFrame:
    """Synonym-expanded BM25 top-k (the ``#syn`` operator): each group
    of synonyms contributes the MAX of its members' BM25 addends per
    doc — matching two spellings of one concept never double-counts,
    while the best-matching member still scores with its own idf —
    plus the plain terms' usual sum.  Absent members simply contribute
    nothing (max over the present ones).

    Scale shape: one pruned tf scan over all expanded terms (pushed-
    down IN), then group-max folded INTO the per-doc hash aggregation:
    member rows are first combined per (doc, group) map-side — the
    only extra cost over plain BM25 is that two-level agg, no extra
    scan and no join.  Serving twin:
    :meth:`SearchEngine.search_expanded`."""
    groups = [sorted(set(g)) for g in groups if g]
    # '#' can't appear in a tokenized term, so pseudo-labels never
    # collide with a real vocabulary term in the grp column
    gmap = {t: f"#g{i}" for i, g in enumerate(groups) for t in g}
    plain = [t for t in sorted(set(terms)) if t not in gmap]
    allt = sorted(set(plain) | set(gmap))
    if not allt:
        return spark.createDataFrame([], "doc_id long, score double")
    per = bm25_per_term(spark, tf, doclen, dfreq, n_docs, avgdl, allt)
    grp = F.col("term")
    for t, g in gmap.items():
        grp = F.when(F.col("term") == t, g).otherwise(grp)
    agg = (
        per.withColumn("grp", grp)
        .groupBy("doc_id", "grp")
        .agg(F.max("s").alias("gs"))
        .groupBy("doc_id")
        .agg(F.sum("gs").alias("score"))
    )
    return (
        agg.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def impact_pruned_tf(
    tf: DataFrame,
    doclen: DataFrame,
    dfreq: DataFrame,
    n_docs: int,
    avgdl: float,
    m: int,
) -> DataFrame:
    """Impact-ordered static index pruning (Carmel et al.: keep only
    each term's top-``m`` postings by BM25 impact).  A build-time
    transformation: per-term window over the posting impact (the SAME
    score expression as :func:`bm25_scores`, full-corpus df/avgdl),
    keep rank <= m, return the pruned ``(doc_id, term, tf)`` relation.

    At 10^12 docs this bounds every posting list at ``m`` entries, so
    serving cost tracks the query, not the corpus tail; the one shuffle
    (partitionBy term) happens once at build, never at query time.
    Ties break by doc_id ascending so the pruned set is deterministic
    and the DuckDB oracle reproduces it row-for-row.
    """
    from pyspark.sql import Window

    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    k1, b = oracle.BM25_K1, oracle.BM25_B
    imp = (
        tf.join(dfreq, "term")
        .join(doclen, "doc_id")
        .withColumn(
            "impact",
            idf
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
            ),
        )
    )
    w = Window.partitionBy("term").orderBy(
        F.desc("impact"), F.asc("doc_id")
    )
    return (
        imp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= m)
        .select("doc_id", "term", "tf")
    )


def bm25f_topk(
    spark: SparkSession,
    tf: DataFrame,
    doclen: DataFrame,
    dfreq: DataFrame,
    n_docs: int,
    avgdl: float,
    anchor_tf: DataFrame,
    terms: list[str],
    k: int = 10,
    w_anchor: float = 0.5,
) -> DataFrame:
    """Fielded ranking: body BM25 plus ``w_anchor`` times an anchor-field
    BM25 — the classic web-search move of letting what OTHER pages say
    about a target count as evidence (per-field scores summed, the
    simple fielded variant; true BM25F would merge tfs pre-saturation).

    ``anchor_tf`` is ``(doc_id, term, atf)`` from
    :func:`tse_spark.operators.crawl.anchor_text_agg` joined to doc ids.
    The anchor field uses b=0 (anchor sets are short evidence strings,
    not length-normalized documents) and its own df for idf with the
    corpus-level N.  A doc matched only via anchors still ranks (full
    outer combine) — the page about the query that never says the words.

    Scale shape: both fields prune on the broadcast/IN term list before
    any shuffle; the combine joins two per-doc aggregates (tiny — only
    matching docs survive)."""
    terms = sorted(set(terms))
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    body = bm25_scores(spark, tf, doclen, dfreq, n_docs, avgdl, terms)
    k1 = oracle.BM25_K1
    atf_q = anchor_tf.filter(F.col("term").isin(terms))
    adf = atf_q.groupBy("term").agg(
        F.count(F.lit(1)).alias("adf")
    )
    aidf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("adf") + F.lit(0.5))
        / (F.col("adf") + F.lit(0.5))
    )
    aper = atf_q.join(F.broadcast(adf), "term").withColumn(
        "s",
        aidf * F.col("atf") * F.lit(k1 + 1.0) / (F.col("atf") + F.lit(k1)),
    )
    asum = aper.groupBy("doc_id").agg(F.sum("s").alias("ascore"))
    combined = body.select("doc_id", "score").join(
        asum, "doc_id", "full_outer"
    )
    return (
        combined.select(
            "doc_id",
            (
                F.coalesce(F.col("score"), F.lit(0.0))
                + F.lit(w_anchor) * F.coalesce(F.col("ascore"), F.lit(0.0))
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def build_doc_terms(docs: DataFrame, dict_broadcast) -> DataFrame:
    """Document-major tf: ``(doc_id, dl, terms array, tfs array)`` — one
    row per doc.  The row-major ``(doc_id, term, tf, dl)`` view is
    ``explode(arrays_zip(...))`` away when needed; the posting build
    consumes the arrays directly (operators/postings.py)."""
    from tse_spark.functions.extraction import make_doc_terms_udf

    udf = make_doc_terms_udf(dict_broadcast)
    r = docs.select("doc_id", udf(F.col("text")).alias("r"))
    return r.select(
        "doc_id",
        F.col("r.dl").cast("long").alias("dl"),
        F.col("r.terms").alias("terms"),
        F.col("r.tfs").alias("tfs"),
    )


def doc_terms_to_tf(doc_terms: DataFrame) -> DataFrame:
    """Row-major view of the document-major tf (for stats/joins)."""
    z = F.explode(F.arrays_zip("terms", "tfs")).alias("p")
    return doc_terms.select("doc_id", "dl", z).select(
        "doc_id",
        F.col("p.terms").alias("term"),
        F.col("p.tfs").cast("long").alias("tf"),
        "dl",
    )


# ---------------------------------------------------------------------------
# impact quantization (X102) — Anserini-style linear impact codes
# ---------------------------------------------------------------------------

def impact_scores(
    tf: DataFrame,
    doclen: DataFrame,
    dfreq: DataFrame,
    n_docs: int,
    avgdl: float,
) -> DataFrame:
    """``(term, doc_id, s)`` — every posting's exact BM25 impact (same
    formula as :func:`bm25_scores`, full-vocabulary df): the build-time
    relation quantization and static pruning both consume."""
    k1, b = oracle.BM25_K1, oracle.BM25_B
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    return (
        tf.join(dfreq, "term")
        .join(doclen, "doc_id")
        .select(
            "term",
            "doc_id",
            (
                idf
                * F.col("tf")
                * F.lit(k1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.lit(avgdl)
                    )
                )
            ).alias("s"),
        )
    )


def quantized_impacts(
    tf: DataFrame,
    doclen: DataFrame,
    dfreq: DataFrame,
    n_docs: int,
    avgdl: float,
    bits: int = 8,
) -> DataFrame:
    """Global linear impact quantization (Anserini / JASS style):
    ``q = min(2^bits - 1, floor(s / max_s * 2^bits))`` per posting,
    returned as ``(term, doc_id, q)``.

    Serving then sums small integers instead of evaluating the BM25
    float kernel — the precomputed-impact index family.  The global
    max is a 1-row agg broadcast back into the plan (no driver
    round-trip), and the whole transform is one build-time pass over
    the postings; ``q`` fits the shard codec's byte payload at
    ``bits <= 8``.  The reference scores floats at query time
    (index/Query.cpp); this is the storage/serving tradeoff it never
    had.
    """
    levels = 1 << bits
    s = impact_scores(tf, doclen, dfreq, n_docs, avgdl)
    mx = s.agg(F.max("s").alias("__m"))
    return s.crossJoin(F.broadcast(mx)).select(
        "term",
        "doc_id",
        F.least(
            F.lit(levels - 1),
            F.floor(F.col("s") / F.col("__m") * F.lit(float(levels))),
        )
        .cast("long")
        .alias("q"),
    )


def quantized_topk(
    spark: SparkSession,
    qimpacts: DataFrame,
    terms: list[str],
    k: int = 10,
) -> DataFrame:
    """Top-k over quantized impacts: ``score = sum(q)`` over the query
    terms — pure integer adds, pushed-down IN, hash agg,
    TakeOrderedAndProject.  Returns ``(doc_id, qscore)``."""
    terms = sorted(set(terms))
    if not terms:
        return spark.createDataFrame([], "doc_id long, qscore long")
    return (
        qimpacts.filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.sum("q").cast("long").alias("qscore"))
        .orderBy(F.desc("qscore"), F.asc("doc_id"))
        .limit(k)
    )


def anytime_topk(
    spark: SparkSession,
    qimpacts: DataFrame,
    terms: list[str],
    rho: int,
    k: int = 10,
) -> DataFrame:
    """Anytime ranking over impact-ordered postings (Lin & Trotman,
    ICTIR'15 — the JASS traversal): score only the first ``rho``
    postings of the query's lists in GLOBAL impact order
    ``(q DESC, term ASC, doc_id ASC)`` and answer from the partial
    accumulators — a strict per-query work budget that holds at ANY
    corpus size (latency is capped by rho, not by posting-list
    length; quality degrades gracefully and measurably, cf. X109's
    accumulator cap which bounds MEMORY instead).

    The top-rho selection never globally sorts posting rows: integer
    impact codes take at most 2^bits distinct values, so an exact
    per-code histogram (a <=2^bits-row agg, broadcast back) yields
    the cutoff code directly — codes above it admit wholly, rows at
    the boundary code admit their ``(term, doc_id)``-first remainder
    via a rank windowed WITHIN that single code stratum.  ``rho >=``
    the query's posting mass degenerates to exhaustive
    :func:`quantized_topk` (pytest-pinned).

    Returns ``(doc_id, qscore)`` with ``qscore = sum(q)`` over the
    processed postings — all-integer, so the SQL oracle (a global
    ``row_number() <= rho`` over the same total order) reproduces it
    bit-exactly."""
    from pyspark.sql.window import Window

    terms = sorted(set(terms))
    if not terms or rho <= 0:
        return spark.createDataFrame([], "doc_id long, qscore long")
    cand = qimpacts.filter(F.col("term").isin(terms))
    hist = (
        cand.groupBy("q")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            "q",
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy(F.desc("q")).rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("__before"),
        )
    )
    w = Window.partitionBy("q").orderBy(F.asc("term"), F.asc("doc_id"))
    return (
        cand.join(F.broadcast(hist), "q")
        .filter(F.col("__before") < F.lit(int(rho)))
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__before") + F.col("__r") <= F.lit(int(rho)))
        .groupBy("doc_id")
        .agg(F.sum("q").cast("long").alias("qscore"))
        .orderBy(F.desc("qscore"), F.asc("doc_id"))
        .limit(k)
    )


def anytime_tradeoff(
    spark: SparkSession,
    qimpacts: DataFrame,
    terms: list[str],
    rhos: list[int],
    k: int = 10,
) -> DataFrame:
    """Quality-vs-budget curve for :func:`anytime_topk` — the number an
    operator reads before choosing a posting budget: for each rho,
    overlap@k of the anytime top-k with the exhaustive quantized
    top-k (the same report shape as ``prune_recall``).  One plan: the
    budget legs reuse one shared candidate lineage and union into
    ``(rho, n_hit, overlap)``."""
    exact = quantized_topk(spark, qimpacts, terms, k).select("doc_id")
    legs = None
    for rho in sorted(set(int(r) for r in rhos)):
        hit = (
            anytime_topk(spark, qimpacts, terms, rho, k)
            .join(exact, "doc_id")
            .agg(F.count(F.lit(1)).alias("__h"))
            .select(
                F.lit(rho).cast("long").alias("rho"),
                F.col("__h").cast("long").alias("n_hit"),
                F.round(F.col("__h") / F.lit(float(k)), 4).alias(
                    "overlap"
                ),
            )
        )
        legs = hit if legs is None else legs.unionAll(hit)
    return legs


def quantization_error(
    tf: DataFrame,
    doclen: DataFrame,
    dfreq: DataFrame,
    n_docs: int,
    avgdl: float,
    bits: int = 8,
) -> DataFrame:
    """Fidelity report ``(n_postings, max_err, mean_err)`` for the
    ``bits``-bit quantizer: error of the midpoint dequantization
    ``(q + 0.5) * max_s / 2^bits`` vs the exact impact — the number a
    capacity/relevance review reads before flipping serving to the
    integer index."""
    levels = 1 << bits
    s = impact_scores(tf, doclen, dfreq, n_docs, avgdl)
    mx = s.agg(F.max("s").alias("__m"))
    q = F.least(
        F.lit(levels - 1),
        F.floor(F.col("s") / F.col("__m") * F.lit(float(levels))),
    )
    err = F.abs(
        F.col("s")
        - (q + F.lit(0.5)) * F.col("__m") / F.lit(float(levels))
    )
    return (
        s.crossJoin(F.broadcast(mx))
        .agg(
            F.count(F.lit(1)).alias("n_postings"),
            F.round(F.max(err), 6).alias("max_err"),
            F.round(F.avg(err), 6).alias("mean_err"),
        )
    )


# ---------------------------------------------------------------------------
# query-likelihood ranking (X106) — Dirichlet-smoothed language model
# ---------------------------------------------------------------------------

def ql_dirichlet_topk(
    spark: SparkSession,
    tf: DataFrame,
    doclen: DataFrame,
    terms: list[str],
    k: int = 10,
    mu: float = 2000.0,
) -> DataFrame:
    """Query-likelihood ranking with Dirichlet smoothing (Zhai &
    Lafferty SIGIR'01) — the second classic ranking family next to
    BM25:

        score(d) = sum over query terms t of
                   ln( (tf_{t,d} + mu * cf_t / T) / (dl_d + mu) )

    cf_t = collection frequency, T = total corpus tokens.  Candidates
    are docs matching >= 1 query term (the standard index-driven cut);
    missing terms still contribute their smoothing mass, which is what
    distinguishes QL from a per-posting sum and is why the plan builds
    the candidate x query-term grid explicitly: a |cand| x |q| relation
    (bounded by matches, never corpus-sized), left-joined back to the
    pruned tf.  Collection stats are two tiny aggs broadcast into the
    scoring join.  Returns ``(doc_id, score)``.
    """
    terms = sorted(set(terms))
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    pruned = tf.filter(F.col("term").isin(terms)).select(
        "doc_id", "term", "tf"
    )
    cand = pruned.select("doc_id").distinct()
    cf = pruned.groupBy("term").agg(
        F.sum("tf").cast("double").alias("cf")
    )
    tot = doclen.agg(F.sum("dl").cast("double").alias("T"))
    grid = cand.crossJoin(F.broadcast(cf)).crossJoin(F.broadcast(tot))
    scored = (
        grid.join(pruned, ["doc_id", "term"], "left")
        .join(doclen, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.log(
                    (
                        F.coalesce(F.col("tf"), F.lit(0)).cast("double")
                        + F.lit(mu) * F.col("cf") / F.col("T")
                    )
                    / (F.col("dl") + F.lit(mu))
                )
            ).alias("score")
        )
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", F.round("score", 4).alias("score"))
    )


# ---------------------------------------------------------------------------
# accumulator-limited evaluation (X109) — Moffat & Zobel quit/continue
# ---------------------------------------------------------------------------

def accumulator_limited_topk(
    spark: SparkSession,
    tf: DataFrame,
    doclen: DataFrame,
    dfreq: DataFrame,
    n_docs: int,
    avgdl: float,
    terms: list[str],
    k: int = 10,
    acc_limit: int = 1000,
) -> DataFrame:
    """Bounded-memory ranking (Moffat & Zobel, TOIS'96 quit/continue,
    term-granular): query terms are processed rarest-first (df asc,
    term asc); while the accumulator table holds < ``acc_limit`` docs a
    term's whole posting list may CREATE accumulators, afterwards terms
    only UPDATE existing ones.  A doc is therefore a candidate iff the
    number of docs first reached by EARLIER terms is < acc_limit, and a
    candidate's score is the full BM25 sum over all its query terms
    (continue semantics).  This is the accumulator-memory answer at
    10^12 docs: serving RAM is bounded by acc_limit per query, not by
    posting-union size, with the quality loss concentrated in docs
    reachable only through the commonest terms.

    Declarative shape: per-term scores once (pruned IN), first-term
    index per doc (hash agg), per-step entry counts + an exclusive
    prefix sum over <= len(terms) rows, broadcast-joined back — no new
    shuffle class.  Deterministic, so the DuckDB oracle reproduces it
    row-for-row.  Returns ``(doc_id, score)``.
    """
    from pyspark.sql.window import Window

    terms = sorted(set(terms))
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    per_term = bm25_per_term(
        spark, tf, doclen, dfreq, n_docs, avgdl, terms
    )
    tord = dfreq.filter(F.col("term").isin(terms)).select(
        "term",
        (
            F.row_number().over(Window.orderBy(F.asc("df"), F.asc("term")))
            - 1
        ).alias("ord"),
    )
    firstt = (
        per_term.join(F.broadcast(tord), "term")
        .groupBy("doc_id")
        .agg(F.min("ord").alias("j"))
    )
    steps = firstt.groupBy("j").agg(F.count(F.lit(1)).alias("n"))
    cum = steps.select(
        "j",
        F.coalesce(
            F.sum("n").over(
                Window.orderBy("j").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("before"),
    )
    elig = cum.filter(F.col("before") < acc_limit).select("j")
    cand = firstt.join(F.broadcast(elig), "j").select("doc_id")
    scored = (
        per_term.join(cand, "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.sum("s").alias("score"))
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", F.round("score", 4).alias("score"))
    )


def ql_jm_topk(
    spark: SparkSession,
    tf: DataFrame,
    doclen: DataFrame,
    terms: list[str],
    k: int = 10,
    lam: float = 0.1,
) -> DataFrame:
    """Jelinek-Mercer-smoothed query likelihood (Zhai & Lafferty's
    second classic smoothing, tuned for short keyword queries):

        score(d) = sum over query terms t of
                   ln( (1 - lam) * tf_{t,d} / dl_d + lam * cf_t / T )

    Same candidate law and plan shape as :func:`ql_dirichlet_topk`
    (any-term match, candidate x query-term grid, broadcast collection
    stats); together they cover the LM ranking family's two standard
    smoothings.  Returns ``(doc_id, score)``.
    """
    terms = sorted(set(terms))
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    pruned = tf.filter(F.col("term").isin(terms)).select(
        "doc_id", "term", "tf"
    )
    cand = pruned.select("doc_id").distinct()
    cf = pruned.groupBy("term").agg(
        F.sum("tf").cast("double").alias("cf")
    )
    tot = doclen.agg(F.sum("dl").cast("double").alias("T"))
    grid = cand.crossJoin(F.broadcast(cf)).crossJoin(F.broadcast(tot))
    scored = (
        grid.join(pruned, ["doc_id", "term"], "left")
        .join(doclen, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.log(
                    F.lit(1.0 - lam)
                    * F.coalesce(F.col("tf"), F.lit(0)).cast("double")
                    / F.col("dl")
                    + F.lit(lam) * F.col("cf") / F.col("T")
                )
            ).alias("score")
        )
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", F.round("score", 4).alias("score"))
    )
