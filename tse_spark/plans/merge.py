"""Cross-segment index merge (the Lucene/Anserini segment-merge
capability the reference never had — it rebuilt per crawl,
index/readme.txt pipeline).

Two INDEPENDENTLY BUILT indexes — e.g. one per crawl segment, each
indexed close to its fetch fleet — become one serving index without
re-tokenizing a single document:

1. segment A keeps its doc ids (the same stability contract as
   append/compact: downstream references into A survive); segment B's
   id space lifts by ``shift = max_doc_id(A) + 1``;
2. both segments' (term, shard) rows are UNIONED (B tagged with an
   ``id_shift`` column) and fed through the SAME sorted-merge
   re-encode kernel compaction uses (postings.reencode_shards): one
   vectorized decode pass re-buckets every posting into a uniform
   merged shard grid, then the shared (term, shard) merge combines
   runs from both segments — cross-segment folding costs nothing
   extra because the kernel already folds across dirs;
3. blocks re-encode against the MERGED corpus avgdl (exact integer
   arithmetic: total_dl and n_docs sum across segments), term_stats
   recompute from the merged shards, so the published index scores
   EXACTLY like a from-scratch build over the union corpus
   (rank-identical by url — pytest-pinned in tests/test_merge.py);
4. the merged index publishes through the snapshot commit log as
   ``op="merge"`` snapshot v1 of the new out_dir.

Preconditions (all fail loudly, same philosophy as append_pages):
segments must share tokenizer + dictionary fingerprint (different
segmentation would break the union-rebuild equivalence silently),
must be unpruned (a per-term top-m invariant does not compose across
segments), must have no live tombstones (compact first — merge folds
bytes, not deletes), and must be url-disjoint (checked with one
inner-join count unless the caller vouches; overlapping urls need
upsert semantics, not a merge).

At 10^12 docs this is the map-reduce-free path to a global index:
each crawl wave indexes its own segment near the data, and merges
run pairwise as pure posting-level work — no HTML, no tokenizer, no
per-document CPU, just one decode+re-encode pass over compressed
bytes with a vocabulary-keyed shuffle.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import SparkSession, functions as F

from tse_spark.operators import postings as po
from tse_spark.plans import checkpoint as cp
from tse_spark.plans import pipeline as pl


def _load_meta(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "meta.json")) as f:
        return json.load(f)


def _validate_pair(ma: dict, mb: dict, a: str, b: str) -> None:
    ta, tb = ma.get("tokenizer", "tse"), mb.get("tokenizer", "tse")
    if ta != tb:
        raise ValueError(
            f"merge_indexes: tokenizer mismatch ({a}={ta}, {b}={tb}); "
            "segments tokenized differently cannot share one index"
        )
    if ma.get("dict_fp") != mb.get("dict_fp"):
        raise ValueError(
            "merge_indexes: dictionary fingerprint mismatch "
            f"({ma.get('dict_fp')} != {mb.get('dict_fp')}); different "
            "dictionaries FMM-segment the same text differently, which "
            "would silently break merge == union-rebuild"
        )
    for name, m in ((a, ma), (b, mb)):
        if m.get("prune_m") is not None:
            raise ValueError(
                f"merge_indexes: {name} was built with impact pruning "
                f"(prune_m={m['prune_m']}); per-term top-m does not "
                "compose across segments — merge unpruned segments and "
                "prune the result instead"
            )
        if m.get("tombstones_dir"):
            raise ValueError(
                f"merge_indexes: {name} has live tombstones; run "
                "compact_index on it first (merge folds bytes, not "
                "deletes)"
            )


def merge_indexes(
    spark: SparkSession,
    dir_a: str,
    dir_b: str,
    out_dir: str,
    dictionary: frozenset[bytes] = frozenset(),
    num_shards: int | None = None,
    check_url_disjoint: bool = True,
) -> "pl.IndexHandle":
    """Merge two independently built indexes into ``out_dir``; see the
    module docstring for the contract.  Returns a handle on the merged
    index."""
    if os.path.exists(os.path.join(out_dir, "meta.json")):
        raise ValueError(
            f"merge_indexes: {out_dir} already holds a published index; "
            "merging would silently overwrite its artifacts — choose a "
            "fresh out_dir (the merged index is a NEW index with its "
            "own commit log)"
        )
    ma, mb = _load_meta(dir_a), _load_meta(dir_b)
    _validate_pair(ma, mb, dir_a, dir_b)
    if dictionary and ma.get("dict_fp") is not None:
        fp = cp.fingerprint(sorted(dictionary))
        if fp != ma["dict_fp"]:
            raise ValueError(
                "merge_indexes: caller dictionary does not match the "
                f"segments' build dictionary ({fp} != {ma['dict_fp']})"
            )

    # run_from_docs builds own no docs dir (the docs table belongs to
    # the caller); merge then produces a postings+stats-only index —
    # the serving paths never touch docs, and the url-disjointness
    # check becomes the caller's responsibility
    def _docs_of(base, m):
        dirs = [os.path.join(base, d) for d in m.get("docs_dirs", ["docs"])]
        if not all(os.path.exists(p) for p in dirs):
            return None
        return spark.read.parquet(*dirs)

    docs_a, docs_b = _docs_of(dir_a, ma), _docs_of(dir_b, mb)
    have_docs = docs_a is not None and docs_b is not None
    if (
        check_url_disjoint
        and have_docs
        and "url" in docs_a.columns
        and "url" in docs_b.columns
    ):
        # one broadcast-or-shuffle semi join over two url projections —
        # vocabulary-of-urls work, no posting bytes touched
        n_overlap = (
            docs_a.select("url").join(docs_b.select("url"), "url").count()
        )
        if n_overlap:
            raise ValueError(
                f"merge_indexes: {n_overlap} urls exist in BOTH "
                "segments; merge requires url-disjoint segments "
                "(re-crawls need upsert_pages semantics, not a merge)"
            )

    shift = int(ma["max_doc_id"]) + 1
    max_doc_id = shift + int(mb["max_doc_id"])
    n_a, n_b = int(ma["n_docs"]), int(mb["n_docs"])
    tot_a = int(ma.get("total_dl", round(float(ma["avgdl"]) * n_a)))
    tot_b = int(mb.get("total_dl", round(float(mb["avgdl"]) * n_b)))
    n_docs = n_a + n_b
    total_dl = tot_a + tot_b
    avgdl = total_dl / n_docs if n_docs else 0.0
    n_sh = num_shards or max(
        int(ma.get("num_shards", 32)), int(mb.get("num_shards", 32))
    )
    block_size = max(
        int(ma.get("block_size", 128)), int(mb.get("block_size", 128))
    )
    shard_range = max(1, math.ceil((max_doc_id + 1) / n_sh))

    post_a = spark.read.parquet(
        *[os.path.join(dir_a, d) for d in ma.get("postings_dirs", ["postings"])]
    ).withColumn("id_shift", F.lit(0).cast("long"))
    post_b = spark.read.parquet(
        *[os.path.join(dir_b, d) for d in mb.get("postings_dirs", ["postings"])]
    ).withColumn("id_shift", F.lit(shift).cast("long"))

    os.makedirs(out_dir, exist_ok=True)
    po.reencode_shards(
        post_a.unionByName(post_b), avgdl, shard_range, block_size
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "postings"))

    merged_postings = spark.read.parquet(os.path.join(out_dir, "postings"))
    po.term_stats(merged_postings).write.mode("overwrite").parquet(
        os.path.join(out_dir, "term_stats")
    )

    if have_docs:
        shifted_b = docs_b.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(shift)).cast("long")
        )
        docs_a.unionByName(shifted_b).write.mode("overwrite").parquet(
            os.path.join(out_dir, "docs")
        )

    meta = {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "total_dl": total_dl,
        # blocks were re-encoded under the merged avgdl: WAND bounds
        # are exact from the first query (bound_scale == 1)
        "enc_avgdl": avgdl,
        "shard_range": shard_range,
        "max_doc_id": max_doc_id,
        "dict_fp": ma.get("dict_fp"),
        "prune_m": None,
        "tokenizer": ma.get("tokenizer", "tse"),
        "num_shards": n_sh,
        "block_size": block_size,
        "merged_from": [
            {"dir": dir_a, "snapshot_id": ma.get("snapshot_id"), "shift": 0},
            {"dir": dir_b, "snapshot_id": mb.get("snapshot_id"),
             "shift": shift},
        ],
    }
    from tse_spark.plans import snapshots as sn

    sn.publish_meta(out_dir, meta, op="merge")
    return pl.load_index(spark, out_dir, dictionary)
