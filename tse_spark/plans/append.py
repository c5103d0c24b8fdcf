"""Incremental index append: add new pages WITHOUT rewriting old shards.

The reference rebuilds its index from scratch per crawl (index/readme.txt
pipeline); at 10^12 documents a rebuild is days of work for a 0.1% delta.
This plan appends like an Iceberg table append (north_star S1):

1. new pages are url-deduped against the EXISTING docs table (anti-join)
   and among themselves;
2. appended doc ids start at the next multiple of the original build's
   ``shard_range`` — so every delta (term, shard) row lands in a shard
   strictly ABOVE all existing ones.  Old posting rows are never read,
   merged, or rewritten; the append is new parquet files only, and both
   serving paths already compose disjoint shards (the distributed path
   groups by shard; the driver path concatenates blobs in shard order);
3. delta blocks are encoded with the ORIGINAL build's ``enc_avgdl`` so
   every block's max-score metadata shares one reference avgdl; the live
   avgdl moves in meta.json and the engine scales pruning bounds by
   ``max(1, avgdl/enc_avgdl)`` (sound — see wand.Cursor);
4. term_stats is recomputed from the full postings table (tiny: one row
   per (term, shard)), and meta.json gets the merged n_docs / weighted
   avgdl / new max_doc_id.

Scores after an append equal a full rebuild's scores per url: tf, dl,
df, n_docs and avgdl are all identical; only doc ids differ (appends
keep old ids stable — itself a feature: downstream references to old
doc ids survive).
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from tse_spark.operators import index_build as ib
from tse_spark.operators import postings as po
from tse_spark.plans import pipeline as pl


def append_pages(
    spark: SparkSession,
    out_dir: str,
    pages_path: str,
    dictionary: frozenset[bytes] = frozenset(),
    force_extract: bool = False,
) -> "pl.IndexHandle":
    """Append a pages parquet table to an existing index at ``out_dir``.

    Returns a fresh handle over the merged index.  No existing posting
    or docs file is modified; a crash mid-append leaves the old index
    intact (delta parquet files only become visible to readers through
    the meta.json update, which is written last, atomically).
    """
    meta_path = os.path.join(out_dir, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    n0 = int(meta["n_docs"])
    avgdl0 = float(meta["avgdl"])
    enc_avgdl = float(meta.get("enc_avgdl", avgdl0))
    shard_range = int(
        meta.get(
            "shard_range", max(1, math.ceil(n0 / meta.get("num_shards", 32)))
        )
    )
    max_id = int(meta.get("max_doc_id", n0 - 1))
    base = ((max_id + 1 + shard_range - 1) // shard_range) * shard_range

    docs_dir = os.path.join(out_dir, "docs")
    old_docs = spark.read.parquet(docs_dir)
    pages = spark.read.parquet(pages_path)

    # dedup: within the batch (build_docs fuses it into id assignment)
    # and against the existing corpus (broadcast anti-join on url when
    # the delta is small relative to the index — at 10^12 docs flip the
    # build side; Spark picks it from sizes under AQE)
    fresh = pages.join(old_docs.select("url"), "url", "left_anti")
    delta_docs = ib.build_docs(fresh, force_extract=force_extract)
    delta_docs = delta_docs.withColumn(
        "doc_id", (F.col("doc_id") + F.lit(base)).cast("long")
    )
    # write FIRST, then derive everything from the written table so tf
    # and stats see exactly what landed
    delta_dir = os.path.join(out_dir, "docs_delta_tmp")
    delta_docs.write.mode("overwrite").parquet(delta_dir)
    delta_docs = spark.read.parquet(delta_dir)

    b_dict = spark.sparkContext.broadcast(dictionary)
    if meta.get("tokenizer", "tse") == "tse":
        tf = ib.build_doc_terms(delta_docs, b_dict)
        dl_per_doc = tf.select("doc_id", "dl")
    else:
        tf = po.with_doclen(ib.build_tf_ws(delta_docs))
        dl_per_doc = tf.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    row = dl_per_doc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sdl"),
        F.max("doc_id").alias("mx"),
    ).collect()[0]
    n_delta = int(row["n"])
    if n_delta == 0:
        import shutil

        shutil.rmtree(delta_dir, ignore_errors=True)
        return pl.load_index(spark, out_dir, dictionary)

    # delta shards: original shard_range, original enc_avgdl (uniform
    # block-max reference point across the whole index)
    delta_postings = po.build_posting_shards(
        tf,
        n_docs=n0 + n_delta,
        avgdl=enc_avgdl,
        num_shards=int(meta.get("num_shards", 32)),
        block_size=int(meta.get("block_size", 128)),
        shard_range=shard_range,
    )
    delta_postings.write.mode("append").parquet(
        os.path.join(out_dir, "postings")
    )

    # publish the delta docs into the docs table (parquet append), then
    # refresh term_stats from the merged postings
    delta_docs.write.mode("append").parquet(docs_dir)
    postings = spark.read.parquet(os.path.join(out_dir, "postings"))
    stats_tmp = os.path.join(out_dir, "term_stats_tmp")
    po.term_stats(postings).write.mode("overwrite").parquet(stats_tmp)
    stats_dir = os.path.join(out_dir, "term_stats")
    import shutil

    shutil.rmtree(stats_dir, ignore_errors=True)
    os.rename(stats_tmp, stats_dir)
    shutil.rmtree(delta_dir, ignore_errors=True)

    n1 = n0 + n_delta
    meta["avgdl"] = (avgdl0 * n0 + float(row["sdl"])) / n1
    meta["n_docs"] = n1
    meta["max_doc_id"] = int(row["mx"])
    meta["enc_avgdl"] = enc_avgdl
    meta["shard_range"] = shard_range
    meta.setdefault("appends", []).append(
        {"pages": pages_path, "n_docs": n_delta, "base": base}
    )
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, meta_path)

    # the original build's stage checkpoints no longer describe the full
    # index; poison their fingerprints so a later resume=True rerun of
    # the base pipeline rebuilds instead of silently mixing stale stages
    # with appended data
    from tse_spark.plans import checkpoint as cp

    man = cp.Manifest(out_dir)
    for st in man.stages.values():
        fp = st.get("fingerprint")
        if fp and not str(fp).startswith("appended:"):
            st["fingerprint"] = f"appended:{fp}"
    man.save()
    return pl.load_index(spark, out_dir, dictionary)
