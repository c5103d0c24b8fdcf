"""Crawler set-algebra operators (SURVEY.md §2.6) vs reference semantics.

Golden cases are hand-derived from the cited reference code
(tse/Page.cpp:799-835 NormalizeUrl, 270-364 IsFilterLink;
tse/Url.cpp:404-423, 502-569 host/type filters); the Spark column
implementations are additionally pinned equal to the pure-python ports
over a mixed url population.
"""

import pytest
from pyspark.sql import functions as F

from tse_spark.operators import crawl


# ---------------------------------------------------------------------------
# pure-python semantics
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "url,expect",
    [
        ("http://e.pku.cn", "http://e.pku.cn/"),          # add trailing /
        ("http://e.pku.cn/", "http://e.pku.cn/"),
        ("http://a.cn/x/./y", "http://a.cn/x/y"),         # /./ removal
        ("http://a.cn/x/./y/./z", "http://a.cn/x/y/z"),
        ("http://a.cn/b/../c", "http://a.cn/c"),          # /../ resolution
        ("http://a.cn/b/c/../../d", "http://a.cn/d"),
        ("http://a.cn/../x", None),                       # prefix < 10 chars
        ("ftp://a.cn/x", None),                           # no http://
        ("HTTP://A.cn/x", "HTTP://A.cn/x"),               # case-insensitive scheme
        ("see http://a.cn/x", None),                      # http:// not at 0
    ],
)
def test_normalize_url_py(url, expect):
    assert crawl.normalize_url_py(url) == expect


@pytest.mark.parametrize(
    "url,expect",
    [
        ("", True),                                       # empty
        ("http://a.example.cn/p/1", False),
        ("http://a.cn/x?b=1&c=2", False),                 # single & / single ?
        ("http://a.cn/x?a=1&b=2&c=3", True),              # & .. &
        ("http://a.cn/x?a=1?b=2", True),                  # ? .. ?
        ("http://a.cn/x-y+z", True),                      # - .. +
        ("http://a.cn//x", True),                         # // .. (overlap w/ scheme)
        ("http://a.cn/http/x", True),                     # http .. http
        ("http://a.cn/cgi-bin/x", True),                  # deny list
        ("http://a.cn/login", True),
        ("x" * 300, True),                                # > URL_LEN
    ],
)
def test_is_filter_link_py(url, expect):
    assert crawl.is_filter_link_py(url) is expect


def test_host_filters_py():
    assert crawl.is_valid_host_py("www.pku.cn")
    assert not crawl.is_valid_host_py("pku")               # < 6 chars
    assert not crawl.is_valid_host_py("a b.example.cn")    # bad char
    assert not crawl.is_foreign_host_py("site.example.cn")
    assert not crawl.is_foreign_host_py("192.168.0.1")     # IP never foreign
    assert crawl.is_foreign_host_py("site.example.de")
    assert crawl.is_foreign_host_py("")
    assert crawl.is_image_url_py("http://a.cn/x.JPG")
    assert not crawl.is_image_url_py("http://a.cn/x.html")
    assert not crawl.is_image_url_py("gif")                # no dot


def test_extract_links_py():
    html = (
        '<a href="http://x.cn/a">one</a>'
        "<img src='/pic.gif'>"
        '<frame src=frame.html>'
        '<a href="#anchor">skip</a>'
        '<a href="javascript:void(0)">skip</a>'
        '<LINK HREF="/style.css">'
    )
    links = crawl.extract_links_py(html, "http://base.cn/dir/page.html")
    assert links == [
        "http://x.cn/a",
        "http://base.cn/pic.gif",
        "http://base.cn/dir/frame.html",
        "http://base.cn/style.css",
    ]


# ---------------------------------------------------------------------------
# Spark columns == python semantics over a mixed population
# ---------------------------------------------------------------------------

URLS = [
    "http://site1.example.cn/p/1",
    "http://site2.example.com/img/pic.jpg",
    "http://site3.example.de/x",
    "http://192.168.0.1/x",
    "http://a.cn/x?b=1&c=2",
    "http://a.cn/x-y+z",
    "http://a.cn/cgi-bin/q",
    "http://short/x",
    "http://ok.example.org/a.png",
    "http://a.example.net/thread.php",
    "http://b.example.tv/deep/path/page.html",
    "x" * 300,
]


@pytest.fixture(scope="module")
def urls_df(spark):
    return spark.createDataFrame([(u,) for u in URLS], "url string")


def test_classify_matches_py(spark, urls_df):
    rows = crawl.classify_urls(urls_df).collect()
    assert len(rows) == len(URLS)
    for r in rows:
        u = r["url"]
        assert r["filtered"] == crawl.is_filter_link_py(u), u
        assert bool(r["is_image"]) == crawl.is_image_url_py(u), u
        host = r["host"]
        if host is not None:
            assert bool(r["is_foreign"]) == crawl.is_foreign_host_py(host), u
            assert bool(r["valid_host"]) == crawl.is_valid_host_py(host), u


def test_normalize_urls_spark(spark):
    raw = [
        "http://e.pku.cn",
        "http://a.cn/x/./y",
        "http://a.cn/b/../c",
        "ftp://nope/x",
    ]
    df = spark.createDataFrame([(u,) for u in raw], "url string")
    got = sorted(r["url"] for r in crawl.normalize_urls(df).collect())
    want = sorted(
        v for v in (crawl.normalize_url_py(u) for u in raw) if v is not None
    )
    assert got == want


def test_frontier_wave(spark):
    frontier = spark.createDataFrame(
        [("http://a.cn/1",), ("http://a.cn/2",), ("http://a.cn/2",)],
        "url string",
    )
    visited = spark.createDataFrame([("http://a.cn/1",)], "url string")
    out = sorted(r["url"] for r in crawl.frontier_wave(frontier, visited).collect())
    assert out == ["http://a.cn/2"]


def test_crawl_wave(spark, pages_df):
    visited = pages_df.select("url")
    out = crawl.crawl_wave(pages_df.limit(50), visited)
    rows = [r["url"] for r in out.collect()]
    # every discovered url is normalized, unseen, and passes the gates
    for u in rows:
        assert crawl.normalize_url_py(u) is not None
        assert not crawl.is_filter_link_py(u)
        assert not crawl.is_image_url_py(u)
    assert len(rows) == len(set(rows))


def test_extract_anchors(spark):
    html = (
        '<a href="http://x.cn/a">First  Link</a>'
        '<a href="/rel">rel\ttext</a>'
        "<a href='http://sq.cn/'>single-quoted skipped</a>"
        '<a href="javascript:alert(1)">js kept-out by scheme</a>'
        '<a href="http://x.cn/e"></a>'  # empty anchor dropped
        '<a class="z" href="http://x.cn/c" id="k">attrs ok</a>'
    )
    df = spark.createDataFrame(
        [("http://host.example.com/p", html)], "url string, html string"
    )
    got = {
        (r["dst_url"], r["anchor"])
        for r in crawl.extract_anchors(df).collect()
    }
    assert got == {
        ("http://x.cn/a", "First Link"),  # whitespace squeezed
        ("http://host.example.com/rel", "rel text"),  # host-resolved
        ("http://x.cn/c", "attrs ok"),
    }


def test_anchor_text_agg(spark):
    rows = [
        ("http://s1/", "http://t/", "home"),
        ("http://s2/", "http://t/", "home"),
        ("http://s3/", "http://t/", "start"),
    ]
    df = spark.createDataFrame(rows, "url string, dst_url string, anchor string")
    got = {
        (r["dst_url"], r["anchor"]): r["n_refs"]
        for r in crawl.anchor_text_agg(df).collect()
    }
    assert got == {
        ("http://t/", "home"): 2,
        ("http://t/", "start"): 1,
    }


def test_canonical_url_law(spark):
    from tse_spark.operators import crawl

    rows = [
        (1, "HTTP://WWW.Ex.COM:80/A/b?utm_source=x&b=2&a=1#frag"),
        (2, "http://www.ex.com/A/b?a=1&b=2"),
        (3, "http://www.ex.com/A/b?b=2&a=1&gclid=zz&ref=home"),
        (4, "http://www.ex.com/other"),
        (5, "http://www.ex.com:8080/A/b?a=1&b=2"),  # non-default port kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {
        r["doc_id"]: (r["canon_url"], r["group_size"], r["keep"])
        for r in crawl.canonical_dedup(df).collect()
    }
    canon = "http://www.ex.com/A/b?a=1&b=2"
    assert out[1][0] == canon and out[2][0] == canon
    assert out[3][0] == canon
    assert out[1][1] == 3 and out[2][1] == 3 and out[3][1] == 3
    # path case preserved; only the authority folds
    assert "/A/b" in out[1][0]
    # survivor = lexicographically smallest raw url (doc 1's uppercase
    # scheme sorts before 'http://...')
    assert out[1][2] == 1 and out[2][2] == 0 and out[3][2] == 0
    assert out[4] == ("http://www.ex.com/other", 1, 1)
    assert out[5][0] == "http://www.ex.com:8080/A/b?a=1&b=2"
    assert out[5][1] == 1


def test_canonical_url_no_query_and_all_tracking(spark):
    from tse_spark.operators import crawl

    df = spark.createDataFrame(
        [(1, "http://ex.com/p?utm_a=1&utm_b=2"), (2, "http://ex.com/p")],
        "doc_id long, url string",
    )
    out = {
        r["doc_id"]: r["canon_url"]
        for r in crawl.with_canonical_url(df).collect()
    }
    # a query that is ALL tracking params canonicalizes to no '?'
    assert out[1] == "http://ex.com/p" and out[2] == "http://ex.com/p"


def test_crawl_schedule_politeness_and_order(spark):
    from tse_spark.operators import crawl

    urls = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "c")],
        "doc_id long, host string",
    )
    dist = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 2), (4, -1), (5, 1)],
        "doc_id long, dist long",
    )
    ranks = spark.createDataFrame(
        [(1, 0.5), (2, 0.1), (3, 0.9), (4, 0.9), (5, 0.5)],
        "doc_id long, rank double",
    )
    out = [
        (r["doc_id"], r["slot"])
        for r in crawl.crawl_schedule(
            urls, dist, ranks, per_host=1, k=10
        ).collect()
    ]
    # doc 4 dropped (unreachable); host a admits only doc 2 this wave
    # (dist 0 outranks doc 1's dist 1 despite the lower pagerank);
    # global order = dist asc, rank desc, doc_id
    assert out == [(2, 1), (5, 1), (3, 1)]


def test_recrawl_priority_cho_estimator(spark):
    """Hand-computed Cho & Garcia-Molina law: 4 obs 10h apart,
    fingerprints a,a,b,b -> n=3 intervals, X=1 change,
    lambda = ln(3.5/2.5)/10 per hour; priority = lambda * staleness."""
    import math

    from tse_spark.operators import crawl

    hist = spark.createDataFrame(
        [("u", i * 36000, fp) for i, fp in enumerate(["a", "a", "b", "b"])],
        "url string, ts_s long, fingerprint string",
    )
    now = 108000 + 72 * 3600
    r = crawl.recrawl_priority(hist, now).collect()[0]
    lam = math.log(3.5 / 2.5) / 10.0
    assert r.n_obs == 4 and r.n_changes == 1
    assert r.change_rate == round(lam, 6)
    assert r.staleness_h == 72.0
    assert r.priority == round(lam * 72.0, 4)


def test_recrawl_priority_single_obs_is_null(spark):
    """One observation = no interval evidence: change_rate / priority
    NULL (cold-start policy belongs to the caller), staleness still
    reported; nulls sort last."""
    from tse_spark.operators import crawl

    hist = spark.createDataFrame(
        [("a", 0, "x"), ("b", 0, "x"), ("b", 3600, "y")],
        "url string, ts_s long, fingerprint string",
    )
    rows = crawl.recrawl_priority(hist, 7200).collect()
    by_url = {r.url: r for r in rows}
    assert by_url["a"].change_rate is None
    assert by_url["a"].priority is None
    assert by_url["a"].staleness_h == 2.0
    assert by_url["b"].priority is not None
    assert [r.url for r in rows] == ["b", "a"]


def test_parse_sitemaps_defaults_and_invalid(spark):
    """Protocol edges: absent <priority> defaults to 0.5, absent
    lastmod/changefreq surface as empty strings, a block without <loc>
    is dropped, changefreq is lowercased, whitespace inside tags is
    trimmed."""
    from tse_spark.operators import crawl

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> http://a/1 </loc><lastmod>2006-02-03</lastmod>"
        "<changefreq>Daily</changefreq><priority>0.8</priority></url>"
        "<url><loc>http://a/2</loc></url>"
        "<url><lastmod>2006-01-01</lastmod></url>"
        "</urlset>"
    )
    sm = spark.createDataFrame(
        [("http://a/sitemap.xml", xml)], "sitemap_url string, xml string"
    )
    rows = {r.url: r for r in crawl.parse_sitemaps(sm).collect()}
    assert set(rows) == {"http://a/1", "http://a/2"}
    r1 = rows["http://a/1"]
    assert (r1.lastmod, r1.changefreq, r1.priority) == (
        "2006-02-03", "daily", 0.8,
    )
    r2 = rows["http://a/2"]
    assert (r2.lastmod, r2.changefreq, r2.priority) == ("", "", 0.5)


def test_sitemap_index_children(spark):
    from tse_spark.operators import crawl

    xml = (
        "<sitemapindex>"
        "<sitemap><loc>http://a/s1.xml</loc></sitemap>"
        "<sitemap><loc>http://a/s2.xml</loc><lastmod>x</lastmod></sitemap>"
        "<sitemap></sitemap>"
        "</sitemapindex>"
    )
    sm = spark.createDataFrame(
        [("http://a/sitemap.xml", xml)], "sitemap_url string, xml string"
    )
    kids = [r.child_url for r in crawl.sitemap_index_children(sm).collect()]
    assert sorted(kids) == ["http://a/s1.xml", "http://a/s2.xml"]


def test_sitemap_recrawl_hints_fallbacks(spark):
    """Unknown/absent changefreq falls back to the daily rate; absent
    lastmod yields NULL age and NULL priority; 'never' pins rate 0."""
    from tse_spark.operators import crawl

    entries = spark.createDataFrame(
        [
            ("u1", "2006-04-30", "hourly", 0.5),
            ("u2", "2006-04-29", "bogus", 0.5),
            ("u3", "", "weekly", 0.5),
            ("u4", "2006-01-01", "never", 0.5),
        ],
        "url string, lastmod string, changefreq string, priority double",
    )
    got = {
        r.url: r
        for r in crawl.sitemap_recrawl_hints(entries, "2006-05-01").collect()
    }
    assert got["u1"].hint_rate == 1.0 and got["u1"].hint_age_h == 24.0
    assert got["u1"].hint_priority == 24.0
    assert got["u2"].hint_rate == round(1 / 24.0, 6)  # daily fallback
    assert got["u2"].hint_age_h == 48.0
    assert got["u3"].hint_age_h is None and got["u3"].hint_priority is None
    assert got["u4"].hint_rate == 0.0 and got["u4"].hint_priority == 0.0


def test_recrawl_priority_with_hints_merges_scales(spark):
    """Observed urls keep the Cho estimate; sitemap-only urls rank by
    the publisher prior on the SAME rate*staleness scale; urls on both
    sides prefer the observation."""
    import math

    from tse_spark.operators import crawl

    hist = spark.createDataFrame(
        [("u", i * 36000, fp) for i, fp in enumerate(["a", "a", "b", "b"])],
        "url string, ts_s long, fingerprint string",
    )
    now = 108000 + 72 * 3600
    hints = spark.createDataFrame(
        [
            ("u", "2006-04-30", "always", 0.5),   # also observed
            ("cold", "2006-04-28", "daily", 0.5), # hint only
        ],
        "url string, lastmod string, changefreq string, priority double",
    )
    out = {
        r.url: r
        for r in crawl.recrawl_priority_with_hints(
            hist, crawl.sitemap_recrawl_hints(hints, "2006-05-01"), now
        ).collect()
    }
    lam = round(math.log(3.5 / 2.5) / 10.0, 6)
    u = out["u"]
    assert u.source == "observed"
    assert u.rate == lam and u.staleness_h == 72.0
    assert u.priority == round(lam * 72.0, 4)
    c = out["cold"]
    assert c.source == "hint"
    assert c.rate == round(1 / 24.0, 6) and c.staleness_h == 72.0
    assert c.priority == round(c.rate * 72.0, 4)
