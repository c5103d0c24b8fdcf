"""Inverted-index build dataflow (SURVEY.md §2.4, B1-B7) — Spark-first.

Replaces the reference's 6-process pipeline (index/readme.txt:11-28:
DocIndex -> sort|uniq -> DocSegment -> CrtForwardIdx -> sort ->
CrtInvertedIdx) with one declarative DAG:

    pages --dedup(url)--> --deterministic doc_id--> docs
    docs --pandas UDF (extract+tokenize+per-doc tf)--> explode --> tf
    tf --groupBy--> doclen / df / corpus stats
    tf --range-salted repartition-by-term + applyInPandas codec--> postings

Scale notes (10^12 docs):
- doc_id assignment is a *rank over url* computed with range
  repartition + per-partition offsets — no single-partition Window, no
  ``monotonically_increasing_id`` (ids must be identical at any
  parallelism, SURVEY.md §7 determinism risk).
- tf is pre-aggregated inside the tokenizer UDF (one output row per
  (doc, term), not per occurrence), i.e. map-side combine before any
  shuffle (B4+B6 fused).
- the 2..8-byte term filter (CrtInvertedIdx.cpp:25) is applied inside
  the UDF, before the shuffle (§4: constant filter pre-groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

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


def assign_doc_ids(
    df: DataFrame, order_col: str = "url", num_partitions: int | None = None
) -> DataFrame:
    """Dense deterministic doc ids: global rank over ``order_col``
    (B1; reference DocIndex.cpp:74,96 assigns scan-order ints).

    Scalable pattern: range-repartition + sortWithinPartitions, count
    rows per partition (tiny collect), then add per-partition offsets in
    a mapInPandas pass.  The resulting id equals the global rank
    regardless of partition boundaries or parallelism — a single-
    partition ``Window.orderBy`` would serialize at scale.
    """
    import pandas as pd

    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    d = df.repartitionByRange(num_partitions, order_col).sortWithinPartitions(
        order_col
    )
    counts = (
        d.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["pid"]):
        offsets[row["pid"]] = acc
        acc += row["count"]
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)] + list(d.schema.fields)
    )
    b_offsets = df.sparkSession.sparkContext.broadcast(offsets)

    def add_ids(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        nxt = b_offsets.value.get(pid, 0)
        for pdf in it:
            n = len(pdf)
            out = pdf.copy()
            out.insert(0, "doc_id", pd.RangeIndex(nxt, nxt + n).astype("int64"))
            nxt += n
            yield out

    return d.mapInPandas(add_ids, schema=schema)


def build_docs(pages: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """``docs(doc_id, url, warc_ts, text, lang, content_md5)`` from the
    raw pages table.  If ``text`` is absent (raw crawl), it is derived
    from ``html`` with the byte-exact extraction UDF (T2-T4)."""
    cols = pages.columns
    if "text" not in cols:
        pages = pages.withColumn(
            "text", extraction.make_extract_text_udf()(F.col("html"))
        )
    docs = dedup_pages(pages)
    docs = docs.withColumn("content_md5", F.md5(F.col("html")))
    docs = assign_doc_ids(docs, "url", num_partitions)
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


def build_tf_ws(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``tf(doc_id, term, tf)`` via the whitespace tokenizer — fully
    JVM-side (split + explode + groupBy, whole-stage codegen; no Python)
    for already-clean text like the driver's ``documents`` table.  The
    2..8-byte eligibility filter (CrtInvertedIdx.cpp:25) applies here
    too, pushed before the aggregation shuffle."""
    return (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("term"),
        )
        .filter(
            (F.octet_length("term") >= oracle.MIN_TERM_BYTES)
            & (F.octet_length("term") <= oracle.MAX_TERM_BYTES)
        )
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
    qt = spark.createDataFrame([(t,) for t in terms], "term string")
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    k1, b = oracle.BM25_K1, oracle.BM25_B
    per_term = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfreq.join(F.broadcast(qt), "term")), "term")
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
    agg = per_term.groupBy("doc_id").agg(
        F.sum("s").alias("score"), F.count(F.lit(1)).alias("nterms")
    )
    if conjunctive:
        agg = agg.filter(F.col("nterms") == len(terms))
    return (
        agg.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
