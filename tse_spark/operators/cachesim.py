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


def static_cache_admission(
    qtf: DataFrame,
    tf: DataFrame,
    budget_bytes: int | None = None,
    num_buckets: int = 1024,
    budget_frac: float | None = None,
) -> DataFrame:
    """QtfDf static posting-cache admission (Baeza-Yates et al.,
    SIGIR'07 "The impact of caching on search engines"): pin in the
    posting cache the terms with the highest query-popularity /
    posting-cost ratio, greedily until a byte budget — the STATIC
    counterpart of the LRU sizing above (the paper's result: for
    posting lists, static QtfDf admission beats LRU because term
    popularity is stable while posting sizes vary by orders of
    magnitude).

    ``qtf``: (term, qtf) — query-log term frequencies.  ``tf``: the
    row-major (term, doc_id, ...) relation; each term's cache cost is
    its EXACT varint delta-gap byte law (intcodec.codec_advisor — the
    X113 law, pytest-pinned against the real encoder) and its df is
    the posting count, so ratio = qtf/df is the paper's QtfDf.

    The greedy scan is a running byte sum over the global
    (ratio desc, term asc) order — computed scale-correctly with the
    same two-pass bucket-prefix-sum shape as index_build.
    assign_doc_ids: deterministic value-range buckets over ratio (a
    2-row min/max broadcast subplan, no sampling), exclusive
    per-bucket byte offsets (a window over ``num_buckets`` rows
    only), then a within-bucket running sum.  No single-partition
    window at any vocabulary size.  Caveat: terms sharing one exact
    ratio value land in one bucket by construction (the order demands
    it); a pathological log where most terms tie on ratio would skew
    that bucket.

    The budget is either absolute (``budget_bytes``) or relative
    (``budget_frac`` — a fraction of the candidate set's total byte
    mass, computed as a 1-row broadcast subplan; the sane form for a
    capacity report that must stay meaningful across corpus sizes).
    With a dyadic fraction (0.25, 0.5) the cut compares exactly in
    binary floating point, so the SQL oracle reproduces it bit-exact.
    Exactly one of the two must be given.

    Returns the ADMITTED terms: (term, qtf, df, ratio, bytes,
    cum_bytes), ordered by the admission scan.
    """
    if (budget_bytes is None) == (budget_frac is None):
        raise ValueError(
            "static_cache_admission: give exactly one of budget_bytes "
            "or budget_frac"
        )
    from pyspark.sql.window import Window

    from tse_spark.operators import intcodec as ic

    adv = ic.codec_advisor(tf).select(
        "term",
        F.col("n_postings").alias("df"),
        F.col("varint_bytes").alias("bytes"),
    )
    base = (
        qtf.join(adv, "term")
        .withColumn(
            "ratio", F.col("qtf").cast("double") / F.col("df")
        )
    )
    mm = base.agg(
        F.min("ratio").alias("__lo"),
        F.max("ratio").alias("__hi"),
        F.sum("bytes").alias("__tot"),
    )
    r, lo, hi = F.col("ratio"), F.col("__lo"), F.col("__hi")
    bucket = (
        F.when(hi == lo, F.lit(0))
        .otherwise(
            F.least(
                F.lit(num_buckets - 1),
                F.floor((hi - r) / (hi - lo) * num_buckets),
            )
        )
        .cast("int")
    )
    with_b = base.crossJoin(F.broadcast(mm)).withColumn("__bucket", bucket)
    offs = (
        with_b.groupBy("__bucket")
        .agg(F.sum("bytes").alias("__bb"))
        .select(
            "__bucket",
            F.coalesce(
                F.sum("__bb").over(
                    Window.orderBy("__bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("__offset"),
        )
    )
    w = Window.partitionBy("__bucket").orderBy(
        F.desc("ratio"), F.asc("term")
    )
    return (
        with_b.join(F.broadcast(offs), "__bucket")
        .withColumn(
            "cum_bytes",
            (
                F.col("__offset")
                + F.sum("bytes").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                )
            ).cast("long"),
        )
        .filter(
            F.col("cum_bytes") <= F.lit(int(budget_bytes))
            if budget_frac is None
            else F.col("cum_bytes")
            <= F.col("__tot") * F.lit(float(budget_frac))
        )
        .select(
            "term", "qtf", "df", F.round("ratio", 6).alias("ratio"),
            "bytes", "cum_bytes",
        )
        .orderBy(F.desc("ratio"), F.asc("term"))
    )
