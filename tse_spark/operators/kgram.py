"""Wildcard term matching via a k-gram index (the standard IR scale
path for ``sp*rk`` / ``*ing`` query-box patterns; Manning, Raghavan &
Schuetze, *Introduction to Information Retrieval* ch. 3.2 — public
textbook material, no reference counterpart: TSE has no wildcard
support, its query path is exact-term only, tse/SearchCGI.cpp).

A wildcard pattern cannot be answered by the term dictionary's sort
order alone (only pure prefixes can — :func:`textops.prefix_complete`);
the k-gram index inverts the VOCABULARY: one row per (gram, term) where
grams are the k-character windows of ``^term$`` (boundary-padded).  A
pattern's fixed segments yield a conjunction of grams; terms containing
ALL of them are a small candidate set, and one exact regex post-filter
removes the false positives k-gram conjunction admits (e.g. pattern
``red*`` gram-matching ``retired``).  At web scale:

- the index is VOCABULARY-sized (millions of rows when the corpus is
  10^12 docs — tiny), built with one explode + distinct, all JVM-side;
- a query touches only the pattern's grams (pushed-down ``gram IN``
  over a gram-sorted table — the same file-skip law the posting shards
  use), then a groupBy over candidate rows only;
- matched terms flow to serving as a BROADCAST into the (term, doc)
  index — candidates are data-dependent, so a semi-join (not a driver
  collect + IN literal) keeps the whole plan distributed.

Tokenization follows the index-eligibility law (build_tf_ws:
lowercase whitespace tokens, 2..8 bytes) so the analysis and
index-served forms agree by construction; the oracle twin is plain
SQL ``LIKE`` with ``*`` -> ``%`` over the same filtered token stream.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

# boundary char for anchored grams: \x01 never appears in real tokens
# (and a token that did contain it would only create a harmless extra
# candidate — the regex post-filter keeps matching exact)
_B = "\x01"


def kgram_index(vocab: DataFrame, k: int = 3) -> DataFrame:
    """(gram, term) — distinct k-grams of ``^term$`` per vocabulary
    term.  ``vocab`` is any (term, ...) relation: the df aggregate at
    analysis time or a built index's term_stats at serving time.  One
    codegen expression (no Python): pad, slide, dedup, explode."""
    padded = F.concat(F.lit(_B), F.col("term"), F.lit(_B))
    grams = F.transform(
        F.sequence(F.lit(1), F.length(padded) - (k - 1)),
        lambda i: F.substring(padded, i, F.lit(k)),
    )
    return vocab.select(
        F.explode(F.array_distinct(grams)).alias("gram"), "term"
    )


def _segments(pattern: str) -> list[str]:
    """Fixed segments of a ``*``-wildcard pattern (empties dropped);
    metacharacters other than ``*`` are taken literally."""
    return [s for s in pattern.lower().split("*") if s]


def pattern_grams(pattern: str, k: int = 3) -> list[str]:
    """The k-gram conjunction a pattern implies: grams of each fixed
    segment, boundary-padded where the pattern is anchored (no leading
    ``*`` -> first segment starts with ^, no trailing ``*`` -> last
    ends with $).  Segments shorter than k after padding contribute
    nothing — an empty result means the index cannot prune and the
    caller must fall back to a vocabulary scan."""
    p = pattern.lower()
    segs = p.split("*")
    out: list[str] = []
    for i, s in enumerate(segs):
        if not s:
            continue
        if i == 0:
            s = _B + s
        if i == len(segs) - 1:
            s = s + _B
        out.extend(s[j : j + k] for j in range(len(s) - k + 1))
    return sorted(set(out))


def _pattern_regex(pattern: str) -> str:
    return "^" + ".*".join(
        re.escape(s) for s in pattern.lower().split("*")
    ) + "$"


def write_kgram_index(vocab: DataFrame, out_dir: str, k: int = 3) -> str:
    """Materialize the k-gram index gram-sorted, so a query's
    ``gram IN`` filter skips whole parquet files on row-group min/max
    stats (the positional table's layout law).  A derived artifact —
    rebuildable from term_stats at any time — but rebuilds must still
    be crash-safe: data lands in a fresh VERSIONED dir and the atomic
    meta rename flips the pointer last, so a crash mid-rebuild leaves
    the previous version fully readable (no snapshot log needed for a
    derived artifact; the version counter is the whole history)."""
    import json
    import os

    meta_path = os.path.join(out_dir, "meta.json")
    version = 1
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            version = int(json.load(f).get("version", 0)) + 1
    dname = f"data_v{version}"
    (
        kgram_index(vocab, k)
        .repartitionByRange(8, "gram")
        .sortWithinPartitions("gram", "term")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, dname))
    )
    tmp = os.path.join(out_dir, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {
                "kind": "kgram",
                "k": int(k),
                "data_dir": dname,
                "version": version,
            },
            f,
        )
    os.replace(tmp, meta_path)
    return out_dir


def load_kgram_index(spark, out_dir: str) -> tuple[DataFrame, int]:
    """-> (kgrams, k) from :func:`write_kgram_index` output."""
    import json
    import os

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    return (
        spark.read.parquet(
            os.path.join(out_dir, meta.get("data_dir", "data"))
        ),
        int(meta["k"]),
    )


def wildcard_terms(
    vocab: DataFrame,
    pattern: str,
    k: int = 3,
    kgrams: DataFrame | None = None,
) -> DataFrame:
    """(term, df) — vocabulary terms matching a ``*`` pattern.  Gram
    path: filter the k-gram index to the pattern's grams (pushed-down
    IN), keep terms holding ALL of them, regex post-filter the
    candidates.  ``kgrams`` is a prebuilt (gram, term) table
    (:func:`write_kgram_index` — the serving form; when omitted the
    index derives from ``vocab`` inline, a vocabulary-sized scan).
    No-gram patterns (every fixed segment shorter than k, e.g. ``a*b``
    with k=3) scan the vocabulary with the regex alone — still
    vocabulary-sized, the documented worst case."""
    grams = pattern_grams(pattern, k)
    rx = _pattern_regex(pattern)
    if not grams:
        return vocab.filter(F.col("term").rlike(rx)).select("term", "df")
    cand = (
        (kgrams if kgrams is not None else kgram_index(vocab, k))
        .filter(F.col("gram").isin(grams))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") == len(grams))
        .select("term")
    )
    return vocab.join(F.broadcast(cand), "term").filter(
        F.col("term").rlike(rx)
    ).select("term", "df")


def wildcard_search(
    docs: DataFrame, pattern: str, k: int = 3
) -> DataFrame:
    """(doc_id, n_terms, tf) — documents containing any term matching
    the pattern: distinct matched terms per doc and total occurrences.
    Analysis form: ONE tokenization lineage (index_build.build_tf_ws —
    the same 2..8-byte index-eligibility law the serving index applies,
    so analysis and :func:`wildcard_search_indexed` agree by
    construction and share one oracle).  The oracle twin is ``LIKE``
    with % for *."""
    from tse_spark.operators import index_build as ib

    return wildcard_search_indexed(ib.build_tf_ws(docs), pattern, k)


def wildcard_search_indexed(
    tf: DataFrame, pattern: str, k: int = 3
) -> DataFrame:
    """The serving form: answer entirely from the (term, doc_id, tf)
    index — the documents table is never scanned.  The vocabulary IS
    the index's term column (df = distinct docs per term), candidates
    broadcast-join back into the index rows.  Result-identical to
    :func:`wildcard_search` (shared oracle)."""
    vocab = tf.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    matched = wildcard_terms(vocab, pattern, k).select("term")
    return (
        tf.join(F.broadcast(matched), "term")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("term").alias("n_terms"),
            F.sum("tf").alias("tf"),
        )
    )
