"""BPE tokenizer training (Sennrich et al.'s byte-pair-encoding merge
learning) over the corpus — the tokenizer-fitting stage of a training
-data pipeline, next to the application-side ``bpe_token_count``.

The reference engine ships a hand-made dictionary (index/readme.txt);
a modern pipeline LEARNS its subword vocabulary from the corpus.  Laws
mirror :mod:`tse_spark.oracle`'s pure-Python truth exactly (word
counts over lowercase whitespace tokens; adjacent symbol pairs
weighted by word count, overlaps all counted; argmax with (left,
right) tie-break; left-to-right non-overlapping merge; stop when the
best count drops below 2).

Scale shape — the part worth getting right on Spark:

- the CORPUS is touched exactly once, to build the (word, count)
  table; every merge iteration runs over that vocabulary table, which
  is orders of magnitude smaller than the corpus (Heaps' law) and
  cached between iterations;
- per-iteration pair counting is an in-array zip_with + one hash
  aggregation (map-side combine over the pair key);
- the argmax pair is a 1-row driver fetch (the merge DECISION is
  inherently sequential — this is the one place a driver loop is the
  honest design, matching every production BPE trainer);
- applying a merge rewrites the symbol arrays with a vectorized
  Arrow batch (the scan-with-lookbehind has no whole-stage-codegen
  form); each iteration localCheckpoints the vocabulary so lineage
  stays flat across tens of merges.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def word_count_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the corpus — the single corpus-wide pass."""
    tok = F.explode(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"),
            lambda t: F.octet_length(t) > 0,
        )
    )
    return (
        docs.select(tok.alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _syms_col():
    # unicode characters of the word; split('', -1) yields one element
    # per char in Spark 3/4
    return F.split(F.col("word"), "")


def pair_count_table(vocab: DataFrame) -> DataFrame:
    """(left, right, n) adjacent-symbol pair counts of the CURRENT
    segmentation, weighted by word count — one iteration's statistics
    (in-array adjacency, no positional shuffle)."""
    pairs = F.zip_with(
        F.slice(
            "syms", 1, F.greatest(F.size("syms") - 1, F.lit(0))
        ),
        F.slice(
            "syms", 2, F.greatest(F.size("syms") - 1, F.lit(0))
        ),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        vocab.select("count", F.explode(pairs).alias("p"))
        .groupBy("p.left", "p.right")
        .agg(F.sum("count").alias("n"))
    )


def _apply_merge(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Rewrite every symbol array with the (a, b) -> ab merge,
    left-to-right non-overlapping — an Arrow-batched map over the
    vocabulary table (never the corpus)."""
    schema = "word string, count long, syms array<string>"

    def rewrite(it):
        for pdf in it:
            out = []
            for syms in pdf["syms"]:
                s = list(syms)
                res = []
                i = 0
                while i < len(s):
                    if (
                        i + 1 < len(s)
                        and s[i] == a
                        and s[i + 1] == b
                    ):
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                out.append(res)
            pdf = pdf.copy()
            pdf["syms"] = out
            yield pdf

    return vocab.mapInPandas(rewrite, schema=schema)


def _learn_local(
    words: "list[tuple[str, int]]", n_merges: int
) -> "tuple[list[tuple[str, str, int]], list[tuple[str, int, list[str]]]]":
    """Driver-local merge loop over a collected (word, count) vocab —
    same laws as the distributed loop (pytest-pinned identical), kept
    INDEPENDENT of oracle.bpe_learn so the conformance tests still
    compare two implementations."""
    vocab = [(w, c, list(w)) for w, c in words]
    merges: list[tuple[str, str, int]] = []
    for _ in range(int(n_merges)):
        counts: dict[tuple[str, str], int] = {}
        for _w, c, syms in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        # argmax with (count desc, left asc, right asc) tie-break
        (a, b), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < 2:
            break
        merges.append((a, b, int(n)))
        for idx, (w, c, syms) in enumerate(vocab):
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            vocab[idx] = (w, c, res)
    return merges, vocab


def learn_bpe(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = 30,
    text_col: str = "text",
    local_vocab_gate: int = 2_000_000,
) -> "tuple[list[tuple[str, str, int]], DataFrame]":
    """Learn up to ``n_merges`` merges; returns (merge list in learn
    order, final vocabulary DataFrame (word, count, syms)).

    The corpus pass (word counts) is always distributed.  The merge
    loop itself is inherently sequential (each decision depends on the
    last), so when the vocabulary fits the driver (``<=
    local_vocab_gate`` distinct words — Heaps' law keeps real-corpus
    vocabularies far under web-corpus sizes, and every production BPE
    trainer is driver/host-local at this stage) the loop runs on a
    collected copy: ~2 Spark jobs total instead of 2 per merge.  Above
    the gate the distributed loop runs: per-iteration pair counting as
    an in-array zip_with + hash agg over the cached vocab table, a
    1-row argmax fetch, and an Arrow-batched merge rewrite with
    localCheckpoint lineage cuts.  Both paths implement the same laws
    and are pytest-pinned identical."""
    wc = word_count_table(docs, text_col)
    rows = (
        wc.limit(local_vocab_gate + 1).collect() if local_vocab_gate else []
    )
    if local_vocab_gate and len(rows) <= local_vocab_gate:
        # one corpus pass total: the limit+collect doubles as the size
        # probe (a vocab within the gate arrives complete)
        words = [(r["word"], int(r["count"])) for r in rows]
        merges, voc = _learn_local(words, n_merges)
        out = spark.createDataFrame(
            [(w, c, syms) for w, c, syms in voc],
            "word string, count long, syms array<string>",
        )
        return merges, out
    vocab = (
        wc.select("word", "count", _syms_col().alias("syms"))
        .localCheckpoint()
    )
    merges = []
    for _ in range(int(n_merges)):
        top = (
            pair_count_table(vocab)
            .orderBy(F.desc("n"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        a, b, n = top[0]["left"], top[0]["right"], int(top[0]["n"])
        merges.append((a, b, n))
        vocab = _apply_merge(vocab, a, b).localCheckpoint()
    return merges, vocab


def merges_df(spark: SparkSession, merges) -> DataFrame:
    return spark.createDataFrame(
        [
            (i + 1, a, b, a + b, int(n))
            for i, (a, b, n) in enumerate(merges)
        ],
        "rank long, left string, right string, pair string, count long",
    )


def segment_table(vocab: DataFrame) -> DataFrame:
    """(word, count, n_pieces, pieces) — the learned segmentation of
    the corpus vocabulary (what a tokenizer export ships)."""
    return vocab.select(
        "word",
        "count",
        F.size("syms").cast("long").alias("n_pieces"),
        F.concat_ws(" ", "syms").alias("pieces"),
    )
