"""PageRank + connected-components conformance.

PageRank is pinned to a pure-numpy power iteration implementing the
identical formula (damping, dangling redistribution); components are
pinned to hand-derived groupings plus a long-chain case that forces
multi-round propagation.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tse_spark.operators import linkrank


def ref_pagerank(verts, edges, n_iter, d=0.85):
    """Reference power iteration (same semantics: distinct edges,
    edges outside the vertex set ignored, dangling mass uniform)."""
    vs = sorted(set(verts))
    idx = {v: i for i, v in enumerate(vs)}
    es = {(s, t) for s, t in edges if s in idx and t in idx}
    deg: dict = {}
    for s, _ in es:
        deg[s] = deg.get(s, 0) + 1
    n = len(vs)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dm = sum(r[idx[v]] for v in vs if v not in deg)
        nr = np.full(n, (1.0 - d) / n + d * dm / n)
        for s, t in es:
            nr[idx[t]] += d * r[idx[s]] / deg[s]
        r = nr
    return {v: r[idx[v]] for v in vs}


def _run_pr(spark, verts, edges, n_iter, **kw):
    vdf = spark.createDataFrame([(v,) for v in verts], "id long")
    edf = spark.createDataFrame(list(edges), "src long, dst long")
    got = linkrank.pagerank(vdf, edf, n_iter=n_iter, **kw).collect()
    return {r["id"]: r["rank"] for r in got}


def test_pagerank_matches_reference(spark):
    verts = [0, 1, 2, 3, 4]
    # 3 and 4 are dangling sinks; a 2-cycle between 0 and 1
    edges = [(0, 1), (1, 0), (0, 2), (2, 4), (1, 3), (2, 3)]
    for n_iter in (1, 3, 7):
        got = _run_pr(spark, verts, edges, n_iter)
        want = ref_pagerank(verts, edges, n_iter)
        assert got.keys() == want.keys()
        for v in verts:
            assert got[v] == pytest.approx(want[v], abs=1e-12)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_warm_start_continues_cold_trajectory(spark):
    """Seeding with the k-iteration ranks and running m more gives
    exactly the (k+m)-iteration cold result — the Markov property the
    pagerank_warm driver oracle relies on."""
    verts = [0, 1, 2, 3, 4, 5]
    edges = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 0), (2, 3)]
    vdf = spark.createDataFrame([(v,) for v in verts], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    prior = linkrank.pagerank(vdf, edf, n_iter=2)
    warm = linkrank.pagerank(vdf, edf, n_iter=3, prior=prior)
    cold = _run_pr(spark, verts, edges, 5)
    got = {r["id"]: r["rank"] for r in warm.collect()}
    for v in verts:
        assert got[v] == pytest.approx(cold[v], abs=1e-12)


def test_pagerank_warm_start_fewer_iterations_to_fixpoint(spark):
    """From a converged prior, re-convergence after a small graph
    change takes fewer iterations than a cold start — the live-index
    append loop's payoff.  Iteration counts are measured against the
    numpy reference (same formula) for speed; the Spark operator's
    conformance to that reference is pinned above."""
    rng = np.random.RandomState(7)
    n = 60
    edges = {(int(rng.randint(n)), int(rng.randint(n))) for _ in range(180)}
    verts = list(range(n))

    def iters_to_fixpoint(seed_vec, es):
        vs = sorted(verts)
        idx = {v: i for i, v in enumerate(vs)}
        ess = {(s, t) for s, t in es if s in idx and t in idx}
        deg: dict = {}
        for s, _ in ess:
            deg[s] = deg.get(s, 0) + 1
        r = seed_vec / seed_vec.sum()
        for k in range(1, 200):
            dm = sum(r[idx[v]] for v in vs if v not in deg)
            nr = np.full(n, 0.15 / n + 0.85 * dm / n)
            for s, t in ess:
                nr[idx[t]] += 0.85 * r[idx[s]] / deg[s]
            if np.abs(nr - r).sum() < 1e-10:
                return k
            r = nr
        return 200

    # converge on the base graph, then append a few edges
    base = {v: r for v, r in ref_pagerank(verts, edges, 60).items()}
    changed = edges | {(0, 59), (59, 1), (30, 0)}
    warm_seed = np.array([base[v] for v in sorted(verts)])
    cold_seed = np.full(n, 1.0 / n)
    warm_iters = iters_to_fixpoint(warm_seed, changed)
    cold_iters = iters_to_fixpoint(cold_seed, changed)
    assert warm_iters < cold_iters

    # and the Spark warm path lands on the same fixpoint as cold
    vdf = spark.createDataFrame([(v,) for v in verts], "id long")
    edf = spark.createDataFrame(sorted(changed), "src long, dst long")
    pdf = spark.createDataFrame(
        [(v, float(base[v])) for v in verts], "id long, rank double"
    )
    warm = linkrank.pagerank(vdf, edf, n_iter=warm_iters + 2, prior=pdf)
    got = {r["id"]: r["rank"] for r in warm.collect()}
    want = ref_pagerank(verts, changed, cold_iters + 5)
    for v in verts:
        assert got[v] == pytest.approx(want[v], abs=1e-8)


def test_pagerank_warm_start_absent_vertices_renormalize(spark):
    """A stale prior (missing newly appended vertices, arbitrary total
    mass) still yields sum(rank) == 1 after one iteration."""
    verts = [0, 1, 2, 3]
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    vdf = spark.createDataFrame([(v,) for v in verts], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    # prior covers only vertices 0..1 and is unnormalized
    pdf = spark.createDataFrame(
        [(0, 3.0), (1, 1.0)], "id long, rank double"
    )
    got = {
        r["id"]: r["rank"]
        for r in linkrank.pagerank(vdf, edf, n_iter=1, prior=pdf).collect()
    }
    assert set(got) == set(verts)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_all_dangling_stays_uniform(spark):
    got = _run_pr(spark, [1, 2, 3], [], 4)
    for v in (1, 2, 3):
        assert got[v] == pytest.approx(1.0 / 3, abs=1e-12)


def test_pagerank_ignores_edges_outside_vertices(spark):
    # edge to 99 (not a vertex) must not leak mass
    verts = [0, 1]
    got = _run_pr(spark, verts, [(0, 1), (0, 99), (99, 1)], 3)
    want = ref_pagerank(verts, [(0, 1), (0, 99), (99, 1)], 3)
    assert got[1] == pytest.approx(want[1], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_deep_iteration_with_checkpointing(spark):
    verts = list(range(6))
    edges = [(i, (i + 1) % 6) for i in range(6)] + [(0, 3), (2, 5)]
    got = _run_pr(spark, verts, edges, 12, checkpoint_every=4)
    want = ref_pagerank(verts, edges, 12)
    for v in verts:
        assert got[v] == pytest.approx(want[v], abs=1e-10)


def test_pagerank_over_extracted_links(spark):
    """Integration: rank the graph the C11 extractor produces."""
    from tse_spark.operators import crawl

    rows = [
        (
            "http://a.example.cn/",
            '<a href="http://b.example.cn/">b</a>'
            '<a href="/self">s</a>',
        ),
        ("http://b.example.cn/", '<a href="http://a.example.cn/">a</a>'),
    ]
    pages = spark.createDataFrame(rows, "url string, html string")
    edges = crawl.extract_links(pages)
    verts = (
        pages.select("url")
        .union(edges.select(F.col("out_url").alias("url")))
        .distinct()
    )
    got = {
        r["url"]: r["rank"]
        for r in linkrank.pagerank(
            verts, edges, n_iter=3, id_col="url", src="url", dst="out_url"
        ).collect()
    }
    eset = [(r["url"], r["out_url"]) for r in edges.collect()]
    want = ref_pagerank(list(got.keys()), eset, 3)
    for u, r in want.items():
        assert got[u] == pytest.approx(r, abs=1e-12)


def _comps(spark, pairs, **kw):
    pdf = spark.createDataFrame(list(pairs), "id_a long, id_b long")
    got = linkrank.connected_components(pdf, **kw).collect()
    return {r["id"]: r["component"] for r in got}


# threshold 0 forces the distributed min-label loop; the default takes
# the driver-local numpy fast path — both must label identically
@pytest.mark.parametrize("thresh", [0, 2_000_000])
def test_components_basic_groups(spark, thresh):
    got = _comps(
        spark, [(1, 2), (2, 3), (5, 6), (7, 7)], driver_threshold=thresh
    )
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 7}


@pytest.mark.parametrize("thresh", [0, 2_000_000])
def test_components_long_chain_converges(spark, thresh):
    n = 12  # diameter 11: forces many propagation rounds
    got = _comps(
        spark, [(i, i + 1) for i in range(n)], driver_threshold=thresh
    )
    assert set(got.values()) == {0}
    assert len(got) == n + 1


@pytest.mark.parametrize("thresh", [0, 2_000_000])
def test_components_reversed_pair_order(spark, thresh):
    got = _comps(spark, [(9, 4), (4, 2), (2, 9)], driver_threshold=thresh)
    assert got == {9: 2, 4: 2, 2: 2}


def test_components_string_ids_driver_local(spark):
    pdf = spark.createDataFrame(
        [("u2", "u9"), ("u9", "u1"), ("x", "y")], "id_a string, id_b string"
    )
    got = {
        r["id"]: r["component"]
        for r in linkrank.connected_components(pdf).collect()
    }
    assert got == {"u1": "u1", "u2": "u1", "u9": "u1", "x": "x", "y": "x"}


def test_components_empty_pairs(spark):
    pdf = spark.createDataFrame([], "id_a long, id_b long")
    assert linkrank.connected_components(pdf).collect() == []


def test_dedup_keep_one(spark):
    docs = spark.range(10).withColumnRenamed("id", "doc_id").withColumn(
        "text", F.concat(F.lit("t"), F.col("doc_id"))
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    kept = sorted(
        r["doc_id"]
        for r in linkrank.dedup_keep_one(docs, pairs).collect()
    )
    # components {1,2,3} -> keep 1; {5,6} -> keep 5; others untouched
    assert kept == [0, 1, 4, 5, 7, 8, 9]


def test_hits_invariants_and_known_graph(spark):
    from tse_spark.operators import linkrank as lr

    # hub chain: 0 -> {1, 2}, 3 -> {1}; 1 and 2 are authorities
    verts = spark.createDataFrame(
        [(i,) for i in range(4)], "id long"
    )
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (3, 1)], "src long, dst long"
    )
    out = {
        r["id"]: (r["auth"], r["hub"])
        for r in lr.hits(verts, edges, n_iter=3).collect()
    }
    import math

    # L2 norms are 1 after each round
    assert math.isclose(
        sum(a * a for a, _ in out.values()), 1.0, rel_tol=1e-9
    )
    assert math.isclose(
        sum(h * h for _, h in out.values()), 1.0, rel_tol=1e-9
    )
    # node 1 (two in-links, one from the best hub) beats node 2
    assert out[1][0] > out[2][0] > 0
    # node 0 links to both authorities: the dominant hub
    assert out[0][1] > out[3][1] > 0
    # pure authorities have zero hub score; pure hubs zero authority
    assert out[1][1] == 0.0 and out[0][0] == 0.0


def test_click_distance_known_graph(spark):
    # chain 0 -> 1 -> 2 -> 3 plus a shortcut 0 -> 2; 4 isolated;
    # 5 reaches nothing and is reached by nothing but is a seed
    verts = spark.createDataFrame([(i,) for i in range(6)], "id long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 2)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (5,)], "id long")
    got = {
        r["id"]: r["dist"]
        for r in linkrank.click_distance(
            verts, edges, seeds, n_iter=4
        ).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: -1, 5: 0}


def test_click_distance_round_bound(spark):
    # a 5-hop chain with only 2 rounds: nodes beyond hop 2 report -1
    verts = spark.createDataFrame([(i,) for i in range(6)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {
        r["id"]: r["dist"]
        for r in linkrank.click_distance(
            verts, edges, seeds, n_iter=2
        ).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: -1, 4: -1, 5: -1}


def ref_trustrank(verts, edges, seeds, n_iter, d=0.85):
    """Reference iteration: teleport restricted to seeds, dangling
    mass to seeds, same dedup/out-of-set edge handling."""
    vs = sorted(set(verts))
    idx = {v: i for i, v in enumerate(vs)}
    es = {(s, t) for s, t in edges if s in idx and t in idx}
    deg: dict = {}
    for s, _ in es:
        deg[s] = deg.get(s, 0) + 1
    sset = [v for v in vs if v in set(seeds)]
    t = np.zeros(len(vs))
    for v in sset:
        t[idx[v]] = 1.0 / len(sset)
    r = t.copy()
    for _ in range(n_iter):
        dm = sum(r[idx[v]] for v in vs if v not in deg)
        nr = (1.0 - d) * t + d * dm * t
        for s, tt in es:
            nr[idx[tt]] += d * r[idx[s]] / deg[s]
        r = nr
    return {v: r[idx[v]] for v in vs}


def test_trustrank_matches_reference_and_demotes_spam(spark):
    # seeds {0}; 0 -> 1 -> 2; spam cluster {8, 9} links only to itself
    verts = spark.createDataFrame([(i,) for i in range(10)], "id long")
    edge_list = [(0, 1), (1, 2), (2, 0), (8, 9), (9, 8), (3, 8)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {
        r["id"]: r["rank"]
        for r in linkrank.trustrank(
            verts, edges, seeds, n_iter=4
        ).collect()
    }
    want = ref_trustrank(range(10), edge_list, [0], n_iter=4)
    assert got.keys() == want.keys()
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, v
    # mass conservation
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # pages unreachable from the seed score exactly 0 — including the
    # spam cluster (3 -> 8 exists but 3 itself is unreachable)
    for v in (3, 4, 5, 6, 7, 8, 9):
        assert got[v] == 0.0
    # every page reachable from the seed carries positive trust
    assert got[0] > 0 and got[1] > 0 and got[2] > 0


def test_host_graph_collapse_laws(spark):
    """Intra-host links vanish, parallel page edges dedupe to one host
    edge, direction survives."""
    from tse_spark.operators import linkrank

    edges = spark.createDataFrame(
        [
            ("http://a.example/1", "http://b.example/x"),
            ("http://a.example/2", "http://b.example/y"),  # parallel
            ("http://a.example/1", "http://a.example/2"),  # intra-host
            ("http://b.example/x", "http://a.example/1"),  # reverse
        ],
        "src_url string, dst_url string",
    )
    got = {
        (r.src, r.dst) for r in linkrank.host_graph(edges).collect()
    }
    assert got == {("a.example", "b.example"), ("b.example", "a.example")}


def test_host_pagerank_mass_and_linkless_host(spark):
    """sum(rank) == 1 over the host universe; a host with no inter-host
    edges still gets teleport + dangling mass; an all-intra-host site
    is dangling (its only edges collapse away)."""
    from tse_spark.operators import linkrank

    edges = spark.createDataFrame(
        [
            ("http://a.example/1", "http://b.example/x"),
            ("http://c.example/1", "http://c.example/2"),  # intra only
        ],
        "src_url string, dst_url string",
    )
    hosts = spark.createDataFrame(
        [("a.example",), ("b.example",), ("c.example",), ("d.example",)],
        "host string",
    )
    rows = {
        r.host: r.rank
        for r in linkrank.host_pagerank(
            edges, vertices=hosts, n_iter=3
        ).collect()
    }
    assert set(rows) == {"a.example", "b.example", "c.example", "d.example"}
    assert sum(rows.values()) == pytest.approx(1.0, abs=1e-9)
    # b receives a's full contribution: strictly the largest
    assert rows["b.example"] == max(rows.values())
    # c and d are structurally identical (no in- or out-edges)
    assert rows["c.example"] == pytest.approx(rows["d.example"], abs=1e-12)
    assert all(v > 0 for v in rows.values())
