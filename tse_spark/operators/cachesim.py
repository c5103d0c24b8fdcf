"""LRU cache hit-rate analysis over an access log (X103).

The serving tier carries three caches (per-process stats LRU, the
scored-posting cache, the cross-process shared cache — operators/
search.py, servecache.py).  Sizing them is a measurement problem:
given a query/access log, what hit rate does an LRU of capacity C
achieve?  Mattson's classic result: an access to key x hits an LRU of
size C iff the number of DISTINCT other keys touched since the
previous access to x (the *reuse distance* d) satisfies d < C — so one
pass that computes every access's reuse distance yields the exact hit
rate for ALL capacities at once.

Distributed formulation (no sequential stack walk): with ``pos`` a
dense global access sequence and per-key ``prev``/``nxt`` occurrence
links (one shuffle by key),

    d(p) = #{ rows r : prev_p < r.pos < p  and  (r.nxt is null or
              r.nxt >= p) }

i.e. count the rows in the gap that are the LAST occurrence of their
key before p — each distinct key in the gap contributes exactly one
such row.  That predicate is an interval containment (``r.pos < p <=
r.nxt``), so instead of a nested-loop inequality join we bucket the
sequence axis: every interval (r.pos, r.nxt] explodes onto the fixed
grid of width B it overlaps, probes join on their bucket, and the
exact predicate filters inside the bucket.  Total exploded mass is
sum(gap)/B + n <= n*K/B + n where K = #distinct keys (each position is
covered by at most K intervals), so the join is equi-partitioned and
skew-free at any log length.  For web logs K is cache-sized (hosts,
queries, terms), which is exactly the regime where the analysis is
wanted.

No reference twin — the reference has no cache instrumentation at all
(its CrawlCache is a fixed array, tse/Crawl.cpp); this is the
capacity-planning half the Spark engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def access_log(df: DataFrame, key_col: str, pos_col: str) -> DataFrame:
    """Normalize to ``(pos, key)`` — ``pos_col`` must be a dense-ish,
    unique, deterministic global sequence (an event id; NOT a wall
    clock with duplicates)."""
    return df.select(
        F.col(pos_col).cast("long").alias("pos"),
        F.col(key_col).cast("string").alias("key"),
    )


def reuse_distances(log: DataFrame, bucket: int = 256) -> DataFrame:
    """Per-access reuse distance ``(pos, key, d)``.

    First-ever accesses (cold misses) carry ``d = NULL``.  ``bucket``
    is the sequence-axis grid width B for the interval join.
    """
    wk = Window.partitionBy("key").orderBy("pos")
    linked = log.select(
        "pos",
        "key",
        F.lag("pos").over(wk).alias("prev"),
        F.lead("pos").over(wk).alias("nxt"),
    )
    hi = linked.agg(F.max("pos")).first()[0]
    if hi is None:
        return log.select("pos", "key", F.lit(None).cast("long").alias("d"))
    # intervals: r covers positions (r.pos, r.nxt]; open-ended tails
    # cover through the end of the log
    iv = linked.select(
        F.col("pos").alias("lo"),
        F.coalesce("nxt", F.lit(hi + 1)).alias("hi"),
    ).withColumn(
        "b",
        F.explode(
            F.sequence(
                (F.col("lo") / bucket).cast("long"),
                (F.col("hi") / bucket).cast("long"),
            )
        ),
    )
    probes = linked.filter(F.col("prev").isNotNull()).select(
        "pos", "prev", (F.col("pos") / bucket).cast("long").alias("b")
    )
    hits = (
        probes.join(iv, "b")
        .filter(
            (F.col("lo") > F.col("prev"))
            & (F.col("lo") < F.col("pos"))
            & (F.col("hi") >= F.col("pos"))
        )
        .groupBy("pos")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    return (
        linked.join(hits, "pos", "left")
        .select(
            "pos",
            "key",
            F.when(
                F.col("prev").isNotNull(), F.coalesce("d", F.lit(0))
            ).alias("d"),
        )
    )


def lru_hit_rates(
    log: DataFrame, sizes: list[int], bucket: int = 256
) -> DataFrame:
    """Exact LRU hit rate per capacity: ``(cache_size, hits, accesses,
    hit_rate)`` — hit iff reuse distance d < C (Mattson inclusion:
    one distance pass prices every capacity)."""
    d = reuse_distances(log, bucket=bucket).select("d")
    aggs = [F.count(F.lit(1)).alias("accesses")]
    for c in sizes:
        aggs.append(
            F.sum(
                F.when(F.col("d") < c, F.lit(1)).otherwise(F.lit(0))
            ).alias(f"__h{c}")
        )
    tot = d.agg(*aggs)
    legs = None
    for c in sizes:
        leg = tot.select(
            F.lit(c).cast("long").alias("cache_size"),
            F.col(f"__h{c}").cast("long").alias("hits"),
            F.col("accesses").cast("long").alias("accesses"),
            F.round(F.col(f"__h{c}") / F.col("accesses"), 4).alias(
                "hit_rate"
            ),
        )
        legs = leg if legs is None else legs.unionAll(leg)
    return legs
