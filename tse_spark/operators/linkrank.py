"""Link-graph analytics: PageRank and connected components.

The reference stops at writing the link structure out (Link4SE,
tse/Crawl.cpp:965-1027 — url, outdegree, out-links per page); ranking
over that graph happened downstream.  These operators are that
downstream, Spark-first:

- :func:`pagerank` — power iteration as a fully declarative DataFrame
  loop: NO driver-side collect anywhere (the two scalars each round —
  total vertex count and dangling mass — stay in the plan as 1-row
  DataFrames cross-joined back in), so the whole run is one lazy plan
  per iteration, checkpointed every ``checkpoint_every`` rounds to keep
  lineage flat.  Per iteration: one shuffle for the src-side join + one
  for the dst-side aggregation — the minimum for edge-partitioned
  PageRank.
- :func:`connected_components` — min-label propagation to fixpoint
  over symmetrized edges: the standard closer for near-dup pipelines
  (MinHash/LSH/cosine emit PAIRS; dedup needs GROUPS).  Near-dup
  clusters have tiny graph diameter, so the loop converges in a
  handful of rounds; each round is one join + one aggregation, and the
  only driver action is the per-round convergence test (a scalar —
  the same control-flow shape GraphFrames uses).  For adversarial
  long-chain graphs prefer the large-star/small-star variant; for
  dedup work this is the right default.
- :func:`dedup_keep_one` — canonicalization: keep exactly one document
  per near-dup component (the minimum id), pass untouched documents
  through.

Determinism: pure float64 arithmetic + integer ids, so a SQL oracle
(unrolled power iteration / recursive-CTE reachability) reproduces the
results bit-for-bit up to float rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 5,
    prior: DataFrame | None = None,
    prior_rank_col: str = "rank",
) -> DataFrame:
    """PageRank after ``n_iter`` power iterations.

    ``vertices``: one row per node (``id_col``); ``edges``: directed
    (``src``, ``dst``) rows, deduplicated here (multigraph edges count
    once).  Nodes with no out-edges are dangling: their rank mass is
    redistributed uniformly each round, so ``sum(rank) == 1`` is an
    invariant (pinned in tests).

        r'(v) = (1-d)/n + d * (sum_{u->v} r(u)/deg(u) + dangling/n)

    Returns (``id_col``, ``rank``).

    Scale notes: ranks and out-degrees are joined on the src key and
    aggregated on dst — both hash-shuffles on graph keys, no broadcast
    of anything O(V).  The 1-row count/dangling aggregates cross-join
    back in (Spark plans these as broadcast nested loops over one row).
    ``checkpoint_every`` bounds lineage via ``localCheckpoint`` so deep
    iteration counts do not stack a quadratic plan.

    Warm start: ``prior`` (``id_col``, ``prior_rank_col``) seeds the
    iteration instead of the uniform vector — the live-index loop
    (append a crawl wave, re-rank) re-converges from the previous
    generation's ranks in a fraction of the iterations a cold start
    needs.  Power iteration is Markovian, so continuing from a prior
    IS the cold trajectory: seed = r_k gives exactly r_{k+n_iter}
    (pinned in tests and the ``pagerank_warm`` driver oracle).
    Vertices absent from the prior (newly appended docs) seed at the
    uniform 1/n share; the seed is then renormalized to sum 1 so the
    invariant holds regardless of how stale the prior is.  The prior
    joins on the vertex key (one hash shuffle) and the normalizer is a
    1-row cross join — same no-collect discipline as the loop body.
    """
    verts = vertices.select(F.col(id_col).alias("id")).distinct()
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    # the vertex set is authoritative: edges with an endpoint outside it
    # are dropped ONCE here (otherwise their mass would leak and break
    # the sum(rank) == 1 invariant)
    e = (
        e.join(verts.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .persist()
    )
    n_df = verts.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))

    if prior is None:
        ranks = verts.crossJoin(n_df).select(
            "id", (F.lit(1.0) / F.col("__n")).alias("rank")
        )
    else:
        p = prior.select(
            F.col(id_col).alias("id"),
            F.col(prior_rank_col).cast("double").alias("__p"),
        )
        seeded = (
            verts.join(p, "id", "left")
            .crossJoin(n_df)
            .select(
                "id",
                F.coalesce(
                    F.col("__p"), F.lit(1.0) / F.col("__n")
                ).alias("__s"),
            )
        )
        tot = seeded.agg(F.sum("__s").alias("__tot"))
        ranks = seeded.crossJoin(tot).select(
            "id", (F.col("__s") / F.col("__tot")).alias("rank")
        )
        # cut the seed's lineage ONCE: each iteration references the
        # rank vector from two subplans (contrib + dangling), so an
        # unchecked prior lineage — itself possibly a full PageRank
        # run — would re-evaluate ~4x per warm iteration
        ranks = ranks.localCheckpoint(eager=False)
    for i in range(n_iter):
        contrib = (
            e.join(ranks, e.src == ranks.id)
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("__deg")).alias("__c"))
        )
        dangling = (
            ranks.join(deg, ranks.id == deg.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        )
        ranks = (
            verts.crossJoin(n_df)
            .crossJoin(dangling)
            .join(contrib, verts.id == contrib.dst, "left")
            .select(
                "id",
                (
                    F.lit(1.0 - damping) / F.col("__n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__c"), F.lit(0.0))
                        + F.col("__dm") / F.col("__n")
                    )
                ).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and (
            i + 1
        ) < n_iter:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.withColumnRenamed("id", id_col)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """(node, component) over the undirected graph given as pair rows;
    ``component`` is the minimum node id reachable from ``node``.
    Nodes are exactly the ids appearing in ``pairs`` (callers union in
    singletons if they want every document labeled — see
    :func:`dedup_keep_one`).

    The pair lineage is cut ONCE up front (eager localCheckpoint): pair
    sources are expensive (an LSH bucket join, a cosine verify) and an
    iterative consumer must never re-evaluate them per round.

    Then a size-based strategy pick, same logic as a broadcast join:
    near-dup pair sets are SMALL relative to the corpus (at 10^12 docs
    a 0.1% dup rate is ~10^9 pairs of two longs — tens of GB, but at
    any bench/sandbox scale a few thousand), so below
    ``driver_threshold`` edges the whole graph fits on the driver and a
    vectorized numpy pointer-jumping pass labels it in milliseconds —
    rounds of distributed joins would pay fixed scheduling latency per
    round for no parallelism gain.  Above the threshold, distributed
    min-label propagation: each round every node takes the min of its
    own label and its neighbors' labels, plus a pointer-jumping
    self-join (adopt the label of my label) that makes convergence
    O(log diameter) rounds; stop when no label changed (one scalar
    isEmpty() action per round — the loop's only driver involvement).
    """
    a = pairs.select(F.col(id_a).alias("s"), F.col(id_b).alias("d"))
    base = a.localCheckpoint(eager=True)
    if base.count() <= driver_threshold:
        return _components_driver_local(base)
    return _components_distributed(base, max_iter)


def _components_driver_local(base: DataFrame) -> DataFrame:
    """Vectorized numpy pointer-jumping over a driver-resident edge
    list — output identical to the distributed loop (component = min
    reachable id; np.unique sorts ids ascending, so min index == min
    id for any orderable id dtype)."""
    import numpy as np
    from pyspark.sql import types as T

    spark = base.sparkSession
    id_type = base.schema["s"].dataType
    out_schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("component", id_type),
        ]
    )
    pdf = base.toPandas()
    if pdf.empty:
        return spark.createDataFrame([], out_schema)
    s_vals = pdf["s"].to_numpy()
    d_vals = pdf["d"].to_numpy()
    ids = np.unique(np.concatenate([s_vals, d_vals]))
    se = np.searchsorted(ids, s_vals)
    de = np.searchsorted(ids, d_vals)
    lab = np.arange(ids.size, dtype=np.int64)
    while True:
        new = lab.copy()
        np.minimum.at(new, se, lab[de])
        np.minimum.at(new, de, lab[se])
        new = np.minimum(new, new[new])  # pointer jump: O(log n) passes
        if np.array_equal(new, lab):
            break
        lab = new
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame({"id": ids, "component": ids[lab]}), out_schema
    )


def _components_distributed(base: DataFrame, max_iter: int) -> DataFrame:
    b = base.select(F.col("d").alias("s"), F.col("s").alias("d"))
    edges = base.union(b).distinct().persist()
    labels = (
        edges.select(F.col("s").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .persist()
    )
    for i in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.d == labels.id)
            .groupBy("s")
            .agg(F.min("comp").alias("__m"))
        )
        stepped = labels.join(
            nbr_min, labels.id == nbr_min.s, "left"
        ).select(
            "id",
            F.least(
                F.col("comp"), F.coalesce(F.col("__m"), F.col("comp"))
            ).alias("comp"),
        )
        # pointer jumping (path compression): also adopt the label OF
        # my label — comp values are node ids, so one self-join halves
        # the remaining chain length and the loop converges in
        # O(log diameter) rounds instead of O(diameter).  Rounds are
        # the expensive unit here (each is a full join+agg with fixed
        # scheduling cost at sandbox scale, a full shuffle at 100 TB).
        jump = stepped.select(
            F.col("id").alias("__jid"), F.col("comp").alias("__jcomp")
        )
        new_labels = (
            stepped.join(jump, stepped.comp == jump.__jid, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"),
                    F.coalesce(F.col("__jcomp"), F.col("comp")),
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)  # materialize + cut lineage
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
        )
        done = changed.isEmpty()
        labels.unpersist()
        labels = new_labels
        if done:
            break
    edges.unpersist()
    return labels.select(F.col("id"), F.col("comp").alias("component"))


def dedup_keep_one(
    docs: DataFrame,
    pairs: DataFrame,
    doc_id: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Documents surviving near-dup canonicalization: for every
    connected component of ``pairs`` keep only the minimum id; docs in
    no pair pass through untouched.  Returns ``docs`` filtered (all
    columns kept) — the "write the deduped corpus" step that follows
    any pair-emitting near-dup operator.
    """
    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    drop = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(doc_id)
    )
    return docs.join(drop, doc_id, "left_anti")


def hits(
    vertices: DataFrame,
    edges: DataFrame,
    n_iter: int = 2,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 5,
) -> DataFrame:
    """HITS (Kleinberg's hubs & authorities) after ``n_iter``
    mutual-reinforcement rounds — the query-independent link signal
    classic web ranking pairs with PageRank (a good HUB is not a good
    AUTHORITY; PageRank conflates them).

    Per round: ``a(v) = sum_{u->v} h(u)`` then L2-normalize,
    ``h(u) = sum_{u->v} a(v)`` then L2-normalize; both start at 1.
    Returns (``id_col``, authority, hub).

    Scale shape mirrors :func:`pagerank`: scores join edges on one
    endpoint and aggregate on the other (hash shuffles on graph keys,
    nothing O(V) broadcast); the L2 norms are 1-row aggregates
    cross-joined back; ``checkpoint_every`` bounds lineage."""
    verts = vertices.select(F.col(id_col).alias("id")).distinct()
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    e = (
        e.join(verts.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .persist()
    )
    scores = verts.select(
        "id", F.lit(1.0).alias("auth"), F.lit(1.0).alias("hub")
    )
    for i in range(n_iter):
        # authorities from hubs
        a_raw = (
            e.join(
                scores.select(F.col("id").alias("src"), "hub"), "src"
            )
            .groupBy("dst")
            .agg(F.sum("hub").alias("__a"))
        )
        scores = (
            scores.join(a_raw, scores.id == a_raw.dst, "left")
            .select(
                "id",
                F.coalesce(F.col("__a"), F.lit(0.0)).alias("auth"),
                "hub",
            )
        )
        # each normalize references `scores` TWICE (norm aggregate +
        # crossJoin input); without a lineage cut every half-step
        # doubles the recompute of everything upstream — 2 iterations
        # = 4 doublings = a 16x plan.  localCheckpoint materializes
        # the half-step once.
        scores = scores.localCheckpoint(eager=False)
        an = scores.agg(
            F.sqrt(F.sum(F.col("auth") * F.col("auth"))).alias("__an")
        )
        scores = scores.crossJoin(an).select(
            "id",
            F.when(
                F.col("__an") > 0, F.col("auth") / F.col("__an")
            ).otherwise(F.lit(0.0)).alias("auth"),
            "hub",
        )
        # hubs from authorities
        h_raw = (
            e.join(
                scores.select(F.col("id").alias("dst"), "auth"), "dst"
            )
            .groupBy("src")
            .agg(F.sum("auth").alias("__h"))
        )
        scores = (
            scores.join(h_raw, scores.id == h_raw.src, "left")
            .select(
                "id",
                "auth",
                F.coalesce(F.col("__h"), F.lit(0.0)).alias("hub"),
            )
        )
        scores = scores.localCheckpoint(eager=False)  # same cut as auth
        hn = scores.agg(
            F.sqrt(F.sum(F.col("hub") * F.col("hub"))).alias("__hn")
        )
        scores = scores.crossJoin(hn).select(
            "id",
            "auth",
            F.when(
                F.col("__hn") > 0, F.col("hub") / F.col("__hn")
            ).otherwise(F.lit(0.0)).alias("hub"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and (
            i + 1
        ) < n_iter:
            scores = scores.localCheckpoint(eager=False)
    return scores.withColumnRenamed("id", id_col)


def authority_boost(
    ranked: DataFrame,
    priors: DataFrame,
    n_docs: int,
    k: int = 10,
    weight: float = 1.0,
    id_col: str = "doc_id",
    prior_col: str = "rank",
) -> DataFrame:
    """Query-independent authority fusion — the classic web-ranking
    combine the reference never had (TSE ranks by tf alone; production
    engines multiply in a link prior): rerank a candidate list
    (``id_col``, score) by ``boosted = round(score * (1 + weight * n *
    prior), 4)``, where ``prior`` is a PageRank-style score summing to
    ~1 over the corpus — ``n * prior`` centers the multiplier at 1 so
    an average-authority page keeps its BM25 score and the weight has
    a corpus-size-free meaning.

    Rerank-window design (same shape as textops.recency_boost): fuse
    over the top-N candidates of the base ranking, never the corpus —
    the candidate ids BROADCAST-SEMI-JOIN into the prior table's scan
    (BuildRight, the one probe of the corpus-sized side), and the
    surviving <=N prior rows then broadcast into a left join that
    preserves every candidate.  Rounded-before-ordering with id-asc
    ties for a reproducible cut; candidates missing from the prior
    table keep prior 0 (new pages rank by relevance alone).
    """
    pr = priors.select(
        F.col(id_col).alias("__id"), F.col(prior_col).alias("__prior")
    )
    cand = ranked.select(
        F.col(id_col).alias("__id"), F.col("score").alias("__score")
    )
    pruned = pr.join(F.broadcast(cand.select("__id")), "__id", "left_semi")
    j = cand.join(F.broadcast(pruned), "__id", "left")
    boosted = F.round(
        F.col("__score")
        * (
            F.lit(1.0)
            + F.lit(float(weight) * float(n_docs))
            * F.coalesce(F.col("__prior"), F.lit(0.0))
        ),
        4,
    )
    return (
        j.select(F.col("__id").alias(id_col), boosted.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


INF_DIST = 1 << 30


def click_distance(
    vertices: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 4,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Click distance (min link hops from any seed page) — the classic
    query-independent crawl/ranking feature next to PageRank (early
    web rankers used distance-from-home-pages directly; crawl
    schedulers still prioritize by it).  ``n_iter`` rounds of
    min-plus label propagation:

        dist_{t+1}(v) = min(dist_t(v), 1 + min_{u->v} dist_t(u))

    Per round one join (dist onto edge sources) + one hash-agg (min
    per destination) + one left join back — the same
    edge-partitioned topology as :func:`pagerank`, state O(V), no
    driver collects.  Vertices unreached within n_iter rounds report
    -1 (at 10^12 pages you bound rounds anyway; web click distance
    saturates in ~6).  Integer arithmetic end to end, so the SQL
    oracle unrolls the identical recursion."""
    verts = vertices.select(F.col(id_col).alias("id")).distinct()
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sd = seeds.select(F.col(id_col).alias("id")).distinct()
    dist = verts.join(
        sd.withColumn("__seed", F.lit(1)), "id", "left"
    ).select(
        "id",
        F.when(F.col("__seed").isNotNull(), F.lit(0))
        .otherwise(F.lit(INF_DIST))
        .cast("long")
        .alias("d"),
    )
    for _ in range(n_iter):
        nd = (
            e.join(dist.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg((F.min("d") + 1).alias("nd"))
            .withColumnRenamed("dst", "id")
        )
        dist = (
            dist.join(nd, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("d"), F.coalesce(F.col("nd"), F.lit(INF_DIST))
                ).alias("d"),
            )
        )
    return dist.select(
        F.col("id").alias(id_col),
        F.when(F.col("d") >= INF_DIST, F.lit(-1))
        .otherwise(F.col("d"))
        .cast("long")
        .alias("dist"),
    )


def trustrank(
    vertices: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 5,
) -> DataFrame:
    """TrustRank (Gyongyi, Garcia-Molina, Pedersen 2004): PageRank
    with the teleport vector restricted to a trusted seed set — the
    classic link-spam demotion.  Both the (1-d) reset AND the
    dangling-mass redistribution land on the seeds (uniformly), so
    trust only flows ALONG links out of the seed set and a page
    unreachable from every seed scores exactly 0:

        r'(v) = (1-d)*t(v) + d*(sum_{u->v} r(u)/deg(u) + dangling*t(v))
        t(v)  = 1/|S| if v in S else 0,   r0 = t

    sum(rank) == 1 stays an invariant.  Same edge-partitioned
    topology and declarative 1-row scalar subplans as
    :func:`pagerank` (the teleport column is a corpus-partitioned
    join computed once, never a broadcast of O(V)); the float64 law
    unrolls exactly in the SQL oracle."""
    verts = vertices.select(F.col(id_col).alias("id")).distinct()
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    e = (
        e.join(verts.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(verts.withColumnRenamed("id", "dst"), "dst", "left_semi")
        .persist()
    )
    sd = (
        seeds.select(F.col(id_col).alias("id"))
        .distinct()
        .join(verts, "id", "left_semi")
    )
    ns_df = sd.agg(F.count(F.lit(1)).cast("double").alias("__ns"))
    tele = (
        verts.join(sd.withColumn("__s", F.lit(1)), "id", "left")
        .crossJoin(ns_df)
        .select(
            "id",
            F.when(
                F.col("__s").isNotNull(), F.lit(1.0) / F.col("__ns")
            )
            .otherwise(F.lit(0.0))
            .alias("__t"),
        )
        .persist()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    ranks = tele.select("id", F.col("__t").alias("rank"))
    for i in range(n_iter):
        contrib = (
            e.join(ranks, e.src == ranks.id)
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("__deg")).alias("__c"))
        )
        dangling = ranks.join(
            deg, ranks.id == deg.src, "left_anti"
        ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        ranks = (
            tele.crossJoin(dangling)
            .join(contrib, tele.id == contrib.dst, "left")
            .select(
                "id",
                (
                    F.lit(1.0 - damping) * F.col("__t")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__c"), F.lit(0.0))
                        + F.col("__dm") * F.col("__t")
                    )
                ).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and (
            i + 1
        ) < n_iter:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.withColumnRenamed("id", id_col)


def host_graph(
    edges: DataFrame,
    src: str = "src_url",
    dst: str = "dst_url",
) -> DataFrame:
    """Collapse page-level link edges to the HOST graph: endpoints map
    to their url hosts, intra-host links vanish (the standard host-
    graph construction — a site linking to itself carries no external
    endorsement, and nepotistic on-site nav links are the bulk of all
    web edges), parallel edges dedupe.  Returns distinct (src, dst)
    host rows.

    Scale shape: one projection + one distinct-shuffle; the output is
    orders of magnitude smaller than the page graph (~10^12 page edges
    -> ~10^8 host edges), which is the whole point — see
    :func:`host_pagerank`."""
    h = lambda c: F.parse_url(F.col(c), F.lit("HOST"))
    return (
        edges.select(h(src).alias("src"), h(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def host_pagerank(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    n_iter: int = 3,
    damping: float = 0.85,
    src: str = "src_url",
    dst: str = "dst_url",
) -> DataFrame:
    """PageRank on the host graph (Kamvar et al.'s BlockRank insight,
    and the granularity TrustRank seed selection actually works at):
    collapse the page graph to hosts (:func:`host_graph`), then run
    the same power iteration as :func:`pagerank` over the host nodes.

    Why at 100 TB: the page graph's rank join shuffles O(edges) rows
    per iteration; the host graph is ~10^4x smaller, so host authority
    converges in seconds, and page priors derive as host_rank spread
    over the host's pages — the cheap web-scale authority signal when
    full-page PageRank is too expensive to re-run per crawl.

    ``vertices``: optional one-column (``host``) DataFrame naming the
    full host universe (hosts with no inter-host links still receive
    teleport + dangling mass); defaults to hosts appearing in the
    collapsed edge set.  Returns (host, rank), sum(rank) == 1."""
    he = host_graph(edges, src=src, dst=dst)
    if vertices is None:
        verts = (
            he.select(F.col("src").alias("host"))
            .union(he.select(F.col("dst").alias("host")))
            .distinct()
        )
    else:
        verts = vertices.select("host")
    return pagerank(
        verts, he, n_iter=n_iter, damping=damping, id_col="host"
    )
