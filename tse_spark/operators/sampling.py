"""Training-mix construction operators: deterministic stratified
sampling and fixed-token-budget sequence packing.

These are the two pipeline steps between "filtered corpus" and
"training batches" that the quality filters (textops.repetition_stats,
dedup.ngram_contamination, …) feed:

- ``mix_sample``: keep each document with a per-source probability
  using a salted hash of its id — NOT ``DataFrame.sample``.  The
  decision is a pure per-row expression, so it is (a) reproducible
  bit-for-bit across runs, cluster sizes and partitionings (sample()
  is seeded per-partition and changes membership when the split
  changes — useless for an auditable training mix), (b) shuffle-free
  (a map-side filter fused into the scan), and (c) consistent across
  tables: any other table keyed by the same id selects the identical
  subset with the same salt.  Changing the salt draws an independent
  mix; raising one source's rate keeps every previously-kept doc
  (hash thresholds nest), which is what incremental mix tuning needs.
- ``mix_report``: per-source audit of a mix — totals, kept counts,
  observed vs target rate — one hash-agg over the sampled output.
- ``pack_sequences``: pack the token stream into fixed-budget training
  sequences.  Documents are concatenated in deterministic (shard,
  doc_id) order and split at exact ``budget`` token boundaries — the
  standard pretraining packer (a doc straddling a boundary continues
  in the next sequence).  The cumulative offset is a running-sum
  window per shard: shards are independent, so parallelism = n_shards
  and no global sort ever happens; at 10^12 docs pick n_shards ~=
  cluster cores and each shard's window is one in-partition pass.
  Per-sequence token counts are exact (every interior sequence ==
  budget) because a straddling doc's tokens are apportioned by offset
  arithmetic inside the row (explode of its bin range — codegen, no
  extra shuffle).

Hash law (portable on purpose): u = first 8 hex chars of
md5('<salt>:<id>') as an integer in [0, 2^32); keep iff
u < rate * 2^32.  DuckDB recomputes it verbatim
(('0x' || substr(md5(...),1,8))::BIGINT), so the driver oracle
hash-checks sampling decisions exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_U32 = float(1 << 32)


def _hash_u32(id_col: Column, salt: str) -> Column:
    """Salted uniform hash in [0, 2^32): hex-prefix of md5, portable to
    any engine with md5 (the DuckDB oracle recomputes it verbatim)."""
    key = F.concat(F.lit(salt), F.lit(":"), id_col.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def mix_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "mix_v1",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic stratified sample: keep a row iff
    ``hash(salt, id) < rates[source] * 2^32``.  Returns the kept rows
    with the hash draw ``u`` attached (audit column).

    The rates dict compiles to a literal CASE chain — sources are a
    handful of corpus names, never data-sized.  The whole operator is
    one codegen'd filter over the scan: no shuffle, no sample() seed
    dependence on partitioning, and the same (salt, id) law selects
    consistent subsets from any table sharing the key.
    """
    u = _hash_u32(F.col(id_col), salt)
    rate = F.lit(float(default_rate))
    for src, r in sorted(rates.items()):
        rate = F.when(F.col(source_col) == src, F.lit(float(r))).otherwise(
            rate
        )
    return docs.withColumn("u", u).filter(
        F.col("u") < rate * F.lit(_U32)
    )


def mix_report(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "mix_v1",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-source audit of a mix: (source, n_total, n_kept, target_rate,
    observed_rate).  One pass, one hash-agg: the keep decision is
    re-expressed as a conditional count, so the report never
    materializes the sample."""
    u = _hash_u32(F.col(id_col), salt)
    rate = F.lit(float(default_rate))
    for src, r in sorted(rates.items()):
        rate = F.when(F.col(source_col) == src, F.lit(float(r))).otherwise(
            rate
        )
    kept = F.when(u < rate * F.lit(_U32), 1).otherwise(0)
    return (
        docs.groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(kept).cast("long").alias("n_kept"),
            F.round(F.max(rate), 6).alias("target_rate"),
        )
        .withColumn(
            "observed_rate",
            F.round(F.col("n_kept") / F.col("n_total"), 6),
        )
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pack whitespace-token counts into fixed ``budget``-token training
    sequences, split at exact boundaries (straddling docs continue into
    the next sequence — the standard pretraining packer, so every
    interior sequence holds exactly ``budget`` tokens).

    Returns (shard, seq_id, n_docs, n_tokens): ``n_docs`` counts the
    docs contributing >= 1 token to the sequence, ``n_tokens`` its
    exact token count (== budget except each shard's final sequence).

    Plan shape: token counts are per-row codegen; the only exchange is
    the repartition-by-shard for the running-offset window (shard =
    id % n_shards keeps it deterministic and oracle-portable); the
    doc→sequence apportioning explodes each doc's bin RANGE —
    ((start/budget) .. (end-1)/budget), almost always 1-2 rows — and
    the final per-sequence rollup's map-side combine sees shard-local
    data already sorted by the window, so at 10^12 docs the cost is
    one shuffle of (doc_id, n_tok) pairs, never of text."""
    toks = F.size(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"),
            lambda t: t != "",
        )
    )
    d = docs.select(
        (F.col(id_col) % n_shards).alias("shard"),
        F.col(id_col).alias("__id"),
        toks.cast("long").alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("end", F.sum("n_tok").over(w)).withColumn(
        "start", F.col("end") - F.col("n_tok")
    )
    b = F.lit(int(budget)).cast("long")
    bins = F.sequence(
        (F.col("start") / b).cast("long"),
        ((F.col("end") - 1) / b).cast("long"),
    )
    per_bin = d.select(
        "shard",
        "start",
        "end",
        F.explode(bins).alias("seq_id"),
    ).select(
        "shard",
        "seq_id",
        (
            F.least(F.col("end"), (F.col("seq_id") + 1) * b)
            - F.greatest(F.col("start"), F.col("seq_id") * b)
        ).alias("tok_in_bin"),
    )
    return per_bin.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("tok_in_bin").cast("long").alias("n_tokens"),
    )
