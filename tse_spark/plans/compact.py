"""Post-append index compaction (the maintenance half of append.py).

Every :func:`tse_spark.plans.append.append_pages` adds ``docs_delta_*``
and ``postings_delta_*`` directories and grows meta.json's dir lists —
after many small appends the postings read fans out over many tiny
files and per-term (term, shard) rows, the delta shards sit above the
base doc range with the original (now too narrow) ``shard_range``, and
WAND runs with scaled (conservative) pruning bounds because the live
avgdl has drifted from ``enc_avgdl``.  ``compact_index`` merges it all
back to the steady state:

1. all docs dirs      -> one ``docs_base_v{N}`` dir;
2. all postings dirs  -> one ``postings_base_v{N}`` dir, re-sharded to
   ``shard_range = ceil((max_doc_id+1)/num_shards)`` and re-encoded
   against the LIVE avgdl (operators/postings.reencode_shards), so
   ``enc_avgdl == avgdl`` again and the WAND bound_scale resets to 1;
3. term_stats recomputed from the new shards -> ``term_stats_base_v{N}``;
4. meta.json atomically republished with the reset dir lists.

Doc ids are NOT renumbered (downstream references survive, same
contract as append); only the doc-id -> shard bucketing changes.

Crash-atomicity and retry-safety: all three output dirs are versioned
by a deterministic ``compact_version`` counter and invisible until the
final atomic meta replace — a crash anywhere before it leaves the
uncompacted index fully intact, and a retry overwrites the same
version dirs.  Old dirs become unreferenced garbage after the publish;
they are left on disk by default (a concurrent reader may hold the old
meta) and removed by ``gc=True`` when the caller knows there are none.

Rankings are invariant: compaction moves postings between shards but
changes no tf/dl/df/n_docs/avgdl, and per-shard WAND composes exactly
over any disjoint doc-range decomposition (pytest: scores identical
before/after, and equal to a from-scratch rebuild).
"""

from __future__ import annotations

import json
import math
import os
import shutil

from pyspark.sql import SparkSession

from tse_spark.operators import postings as po
from tse_spark.plans import pipeline as pl


def compact_index(
    spark: SparkSession,
    out_dir: str,
    dictionary: frozenset[bytes] = frozenset(),
    gc: bool = False,
) -> "pl.IndexHandle":
    """Merge all append deltas back into single base dirs; see module
    docstring for the contract.  No-op (returns a fresh handle) when
    the index has no deltas and exact encoding stats."""
    meta_path = os.path.join(out_dir, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    docs_dirs = meta.get("docs_dirs", ["docs"])
    postings_dirs = meta.get("postings_dirs", ["postings"])
    avgdl = float(meta["avgdl"])
    enc_avgdl = float(meta.get("enc_avgdl", avgdl))
    if (
        len(docs_dirs) == 1
        and len(postings_dirs) == 1
        and enc_avgdl == avgdl
    ):
        return pl.load_index(spark, out_dir, dictionary)

    version = int(meta.get("compact_version", 0)) + 1
    num_shards = int(meta.get("num_shards", 32))
    block_size = int(meta.get("block_size", 128))
    max_doc_id = int(meta["max_doc_id"])
    new_range = max(1, math.ceil((max_doc_id + 1) / num_shards))

    docs_out = f"docs_base_v{version}"
    postings_out = f"postings_base_v{version}"
    stats_out = f"term_stats_base_v{version}"

    spark.read.parquet(
        *[os.path.join(out_dir, d) for d in docs_dirs]
    ).write.mode("overwrite").parquet(os.path.join(out_dir, docs_out))

    old_postings = spark.read.parquet(
        *[os.path.join(out_dir, d) for d in postings_dirs]
    )
    po.reencode_shards(
        old_postings, avgdl, new_range, block_size
    ).write.mode("overwrite").parquet(os.path.join(out_dir, postings_out))

    new_postings = spark.read.parquet(os.path.join(out_dir, postings_out))
    po.term_stats(new_postings).write.mode("overwrite").parquet(
        os.path.join(out_dir, stats_out)
    )

    old_dirs = [
        meta.get("term_stats_dir", "term_stats"), *docs_dirs, *postings_dirs
    ]
    meta["docs_dirs"] = [docs_out]
    meta["postings_dirs"] = [postings_out]
    meta["term_stats_dir"] = stats_out
    meta["enc_avgdl"] = avgdl  # blocks re-encoded: bounds exact again
    meta["shard_range"] = new_range
    meta["compact_version"] = version
    meta.setdefault("compactions", []).append(
        {"version": version, "merged_dirs": old_dirs}
    )
    # publish LAST: the atomic replace is the only step that makes the
    # compacted dirs visible (and the old ones unreferenced)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, meta_path)

    if gc:
        for d in old_dirs:
            shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
    return pl.load_index(spark, out_dir, dictionary)
