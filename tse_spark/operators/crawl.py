"""Crawler set-algebra operators (SURVEY.md §2.6, C1-C7, C11).

The BASELINE contract starts from an existing pages table, so the HTTP
fetch loop is out of scope — but the reference's *dedup/filter algebra*
defines which pages exist, and is rebuilt here as DataFrame ops:

- C2 URL normalization      (reference tse/Page.cpp:799-835)
- C3 URL spam filter        (tse/Page.cpp:270-364: 7 doubled-substring
                             rules + 75-entry deny substring list)
- C5 host/type filters      (tse/Url.cpp:404-423 IsValidHost,
                             502-540 IsForeignHost, 544-569 IsImageUrl)
- C6 URL-seen dedup         (tse/Crawl.cpp:1413-1436 md5-set membership
                             -> left_anti join)
- C11 link extraction       (tse/hlink/hlink.l:44-60 A/AREA/BASE/FRAME/
                             IFRAME/IMG/LINK href|src -> regex UDF)
- crawl_wave                one BFS round of the frontier (C12's
                             work-distribution loop as a DataFrame job)

Everything except the iterative ``/../`` resolution and link extraction
is pure JVM column expressions (regex/`contains`); those two are
Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F

URL_LEN = 256  # tse/Url.h:6
HOST_LEN = 256  # tse/Url.h:7

# 75-entry deny substring list, tse/Page.cpp:338-355 (config data — the
# reference's robots-derived blocklist; matched case-insensitively on
# the whole url)
DENY_SUBSTRINGS: tuple[str, ...] = (
    "cgi-bin", "htbin", "linder", "srs5", "uin-cgi",
    "uhtbin", "snapshot", "=+", "=-", "script",
    "gate", "search", "clickfile", "data/scop", "names",
    "staff/", "enter", "user", "mail", "pst?",
    "find?", "ccc?", "fwd?", "tcon?", "&amp",
    "counter?", "forum", "cgisirsi", "{", "}",
    "proxy", "login", "00.pl?", "sciserv.pl", "sign.asp",
    "<", ">", "review.asp?", "result.asp?", "keyword",
    '"', "'", "php?s=", "error", "showdate",
    "niceprot.pl?", "volue.asp?id", ".css", ".asp?month", "prot.pl?",
    "msg.asp", "register.asp", "database", "reg.asp", "qry?u",
    "p?msg", "tj_all.asp?page", ".plot.", "comment.php", "nicezyme.pl?",
    "entr", "compute-map?", "view-pdb?", "list.cgi?", "lists.cgi?",
    "details.pl?", "aligner?", "raw.pl?", "interface.pl?", "memcp.php?",
    "member.php?", "post.php?", "thread.php", "bbs/", "/bbs",
)

# 7 doubled-substring rules, tse/Page.cpp:281-334: filtered when the
# second marker occurs after the first (for "-" the second marker is
# "+"; for "//" the scan restarts one char after the first match, so
# "///" already counts)
_DOUBLED: tuple[tuple[str, str], ...] = (
    ("?", "?"), ("-", "+"), ("&", "&"), ("//", "//"),
    ("http", "http"), ("misc", "misc"), ("ipb", "ipb"),
)

HOME_TLDS: tuple[str, ...] = (
    "cn", "com", "net", "org", "info", "biz", "tv", "cc", "hk", "tw"
)  # tse/Url.cpp:523-527
IMAGE_EXTS: tuple[str, ...] = (
    "gif", "jpg", "jpeg", "png", "bmp", "tif", "psd"
)  # tse/Url.cpp:556-559


# ---------------------------------------------------------------------------
# pure-python semantics (oracle for tests; also the normalize UDF body)
# ---------------------------------------------------------------------------

def normalize_url_py(url: str) -> str | None:
    """C2: reference tse/Page.cpp:799-835, byte-faithful port.
    Returns None where the reference returns false (drop the url)."""
    if "http://" not in url.lower():
        return None
    idx = url.rfind("/")
    if idx < 8:
        return url + "/"
    while "/./" in url:
        i = url.find("/./")
        url = url[:i] + url[i + 2 :]
    while "/../" in url:
        i = url.find("/../")
        pre = url[:i]
        suf = url[i + 4 :] if len(url) > i + 4 else ""
        j = pre.rfind("/")
        if j != -1:
            pre = pre[: j + 1]
        if len(pre) < 10:
            return None
        url = pre + suf
    if not url.lower().startswith("http://"):
        return None
    return url


def is_filter_link_py(url: str) -> bool:
    """C3: true when the url should be dropped (tse/Page.cpp:270-364)."""
    if not url or len(url) > URL_LEN:
        return True
    link = url.lower()
    for first, second in _DOUBLED:
        i = link.find(first)
        if i != -1 and link.find(second, i + 1) != -1:
            return True
    return any(s in link for s in DENY_SUBSTRINGS)


def is_valid_host_py(host: str) -> bool:
    """C5a: tse/Url.cpp:404-423 — >= 6 chars, [A-Za-z0-9.:_-] only."""
    return len(host) >= 6 and bool(re.fullmatch(r"[A-Za-z0-9.:_\-]+", host))


def is_foreign_host_py(host: str) -> bool:
    """C5b: tse/Url.cpp:502-540 — IPs are never foreign; otherwise the
    last dot-label must be in the home-TLD allowlist."""
    if not host or len(host) > HOST_LEN:
        return True
    if re.fullmatch(r"\d{1,3}(\.\d{1,3}){3}", host):
        return False
    tld = host.rsplit(".", 1)[-1].lower() if "." in host else ""
    return tld not in HOME_TLDS


def is_image_url_py(url: str) -> bool:
    """C5c: tse/Url.cpp:544-569 — extension after the last dot."""
    if not url or len(url) > HOST_LEN:
        return False
    ext = url.rsplit(".", 1)[-1].lower() if "." in url else ""
    return ext in IMAGE_EXTS


_LINK_RE = re.compile(
    r"<\s*(?:a|area|base|frame|iframe|img|link)\b[^>]*?"
    r"(?:href|src)\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))",
    re.IGNORECASE | re.DOTALL,
)


def extract_links_py(html: str, base_url: str | None = None) -> list[str]:
    """C11: href/src of A/AREA/BASE/FRAME/IFRAME/IMG/LINK tags
    (tse/hlink/hlink.l:44-60), relative URIs resolved against the page
    url (the lexer's uri_recombine step, tse/uri/)."""
    from urllib.parse import urljoin

    out: list[str] = []
    for m in _LINK_RE.finditer(html):
        href = next(g for g in m.groups() if g is not None).strip()
        if not href or href.startswith(("javascript:", "mailto:", "#")):
            continue
        out.append(urljoin(base_url, href) if base_url else href)
    return out


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

def _deny_regex() -> str:
    return "|".join(re.escape(s) for s in DENY_SUBSTRINGS)


# The doubled rules as one regex.  The reference rescans from i+1, so
# for the "//" rule an overlapping second match counts: "///" is
# filtered — hence the explicit `///` alternative ("http"/"misc"/"ipb"
# cannot self-overlap at shift >= 1, so plain X.*X is exact for them).
_DOUBLED_REGEX = r"\?.*\?|-.*\+|&.*&|///|//.*//|http.*http|misc.*misc|ipb.*ipb"


def is_filter_link_col(url_col):
    """C3 as one JVM expression: length gate + doubled-rule regex + a
    single alternation regex for the 75 deny substrings (all on the
    lowercased url) — no Python in the row path."""
    link = F.lower(url_col)
    return (
        (F.length(url_col) > URL_LEN)
        | (F.length(url_col) == 0)
        | link.rlike(_DOUBLED_REGEX)
        | link.rlike(_deny_regex())
    )


def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """C2: normalized url column (nulls = dropped by the reference);
    iterative /../ resolution needs a (vectorized) UDF."""

    @F.pandas_udf("string")
    def norm(u: pd.Series) -> pd.Series:
        return u.map(normalize_url_py)

    return df.withColumn(url_col, norm(F.col(url_col))).filter(
        F.col(url_col).isNotNull()
    )


def classify_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """C3+C5 verdicts as JVM columns: (.., host, is_image, is_foreign,
    valid_host, filtered)."""
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    ext = F.lower(
        F.element_at(F.split(F.col(url_col), r"\."), -1)
    )
    tld = F.lower(F.element_at(F.split(host, r"\."), -1))
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    return df.withColumns(
        {
            "host": host,
            "is_image": (F.length(F.col(url_col)) <= HOST_LEN)
            & F.col(url_col).contains(".")
            & ext.isin(*IMAGE_EXTS),
            "is_foreign": (~is_ip) & (~tld.isin(*HOME_TLDS)),
            "valid_host": (F.length(host) >= 6)
            & host.rlike(r"^[A-Za-z0-9.:_\-]+$"),
            "filtered": is_filter_link_col(F.col(url_col)),
        }
    )


def _links_udf():
    @F.pandas_udf("array<string>")
    def links(html: pd.Series, base: pd.Series) -> pd.Series:
        return pd.Series(
            [
                extract_links_py(
                    h.decode("gb2312", errors="replace")
                    if isinstance(h, (bytes, bytearray))
                    else (h or ""),
                    b,
                )
                for h, b in zip(html, base)
            ]
        )

    return links


def extract_links(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """C11: (url, out_url) edge list from the html column."""
    links = _links_udf()
    return pages.select(
        F.col(url_col).alias("url"),
        F.explode(links(F.col(html_col), F.col(url_col))).alias("out_url"),
    )


def link_outdegree(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """S5 full: per-page link record ``(url, outdegree, out_urls)`` —
    the reference's Link4SE sink writes each page's url, its out-degree
    and the out-link list as one record (tse/Crawl.cpp:965-1027).
    Computed straight off the extraction UDF's array (size + the array
    itself): NO shuffle — the edge list in :func:`extract_links` is the
    exploded view of the same array."""
    links = _links_udf()
    return pages.select(
        F.col(url_col).alias("url"),
        links(F.col(html_col), F.col(url_col)).alias("out_urls"),
    ).select("url", F.size("out_urls").alias("outdegree"), "out_urls")


def extract_anchors(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(url, dst_url, anchor) rows from ``<a href="...">text</a>`` tags
    — the incoming-anchor-text signal classic web ranking layers on top
    of the page's own terms (the reference's Link4SE sink stores the
    edge list for exactly this kind of downstream use,
    tse/Crawl.cpp:965-1027; anchor TEXT is our extension).

    Stays entirely in whole-stage codegen: one regex matched twice with
    different capture groups (``regexp_extract_all`` returns per-group
    arrays that align because they come from the same match positions),
    ``arrays_zip`` + ``explode`` to rows.  Narrower by design than the
    full C11 lexer: double-quoted hrefs only, absolute http(s) or
    root-relative (resolved against the page host JVM-side); callers
    needing every href form use :func:`extract_links` — which has no
    text to align anyway for IMG/FRAME/LINK tags.

    At 100 TB this is scan -> explode -> (caller's groupBy dst): the
    only shuffle is the caller's aggregation by target, and anchors on
    popular targets pre-aggregate map-side in
    :func:`anchor_text_agg`."""
    pat = r'<a[^>]*href="([^"]*)"[^>]*>([^<]*)</a>'
    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(pat), F.lit(1))
    texts = F.regexp_extract_all(F.col(html_col), F.lit(pat), F.lit(2))
    z = pages.select(
        F.col(url_col).alias("url"),
        F.explode(F.arrays_zip(hrefs.alias("h"), texts.alias("t"))).alias(
            "__a"
        ),
    ).select(
        "url",
        F.col("__a.h").alias("__href"),
        F.trim(F.regexp_replace(F.col("__a.t"), r"\s+", " ")).alias(
            "anchor"
        ),
    )
    href = F.col("__href")
    dst = (
        F.when(href.startswith("http://") | href.startswith("https://"), href)
        .when(
            href.startswith("/"),
            F.concat(
                F.lit("http://"),
                F.parse_url(F.col("url"), F.lit("HOST")),
                href,
            ),
        )
        .otherwise(F.lit(None))
    )
    return (
        z.withColumn("dst_url", dst)
        .filter(F.col("dst_url").isNotNull() & (F.col("anchor") != ""))
        .select("url", "dst_url", "anchor")
    )


def anchor_text_agg(anchors: DataFrame) -> DataFrame:
    """(dst_url, anchor, n_refs): how many pages link to ``dst_url``
    with this exact anchor phrase — the per-target anchor vocabulary a
    ranking layer joins against the index (anchor tf for BM25F-style
    field scoring, or as query-independent evidence).

    One hash aggregation: partial counts combine map-side, so a target
    every page links to ("home") never concentrates rows on one task
    before reduction."""
    return anchors.groupBy("dst_url", "anchor").agg(
        F.count(F.lit(1)).alias("n_refs")
    )


def frontier_wave(frontier: DataFrame, visited: DataFrame) -> DataFrame:
    """C6: urls not yet seen — md5 anti-join (the reference's
    setVisitedUrlMD5 membership gate, tse/Crawl.cpp:1413-1436)."""
    f = frontier.withColumn("__md5", F.md5(F.col("url")))
    v = visited.select(F.md5(F.col("url")).alias("__md5")).distinct()
    return f.join(v, "__md5", "left_anti").drop("__md5").distinct()


def crawl_wave(
    pages: DataFrame, visited: DataFrame, html_col: str = "html"
) -> DataFrame:
    """One BFS round: extract -> normalize -> spam/host/type filters ->
    unseen.  The reference's worker loop (tse/Crawl.cpp:222-631) as a
    single declarative job; iterate = loop this per wave."""
    links = extract_links(pages, html_col).select(
        F.col("out_url").alias("url")
    )
    links = normalize_urls(links)
    cls = classify_urls(links)
    keep = cls.filter(
        (~F.col("filtered"))
        & (~F.col("is_image"))
        & (~F.col("is_foreign"))
        & F.col("valid_host")
    ).select("url")
    return frontier_wave(keep, visited)


def gunzip_content(
    pages: DataFrame,
    content_col: str = "content",
    encoding_col: str = "content_encoding",
    type_col: str = "content_type",
    cap: int = 1024000,
) -> DataFrame:
    """C10 gzip body decode (reference tse/Crawl.cpp:462-493).

    Faithful gate and buffer semantics: only rows with
    ``Content-Encoding: gzip`` AND ``Content-Type: text/html`` are
    decoded (any other encoding/type combination passes through
    untouched — bug-faithful: a gzipped ``text/plain`` body stays
    compressed); the decode is a single ``gzread`` into a
    1,024,000-byte buffer, so longer bodies are silently truncated at
    ``cap`` decompressed bytes.  ``gzread`` is *transparent* for
    non-gzip payloads — when the gated bytes lack the gzip magic, the
    raw bytes are copied through (capped) instead of failing, exactly
    like zlib's gzio layer.

    Divergence (documented): a corrupt gzip stream makes the reference
    ``exit(-1)`` — killing a 1000-executor job over one bad page is not
    an option, so here the row keeps its raw bytes and ``gunzipped``
    stays false.  Multi-member gzip files decode their first member
    only (the reference's single 1 MB gzread has the same practical
    window).

    Adds/overwrites ``content_col`` with the decoded bytes and adds a
    ``gunzipped`` boolean (true only when a real gzip stream was
    inflated).  The UDF is Arrow-batched and receives NULL for ungated
    rows (the gate masks them JVM-side), so only gzip+html blobs cross
    the Python boundary.
    """
    import zlib

    from pyspark.sql import types as T

    gate = (F.col(encoding_col) == "gzip") & (F.col(type_col) == "text/html")

    ret = T.StructType(
        [
            T.StructField("body", T.BinaryType()),
            T.StructField("inflated", T.BooleanType()),
        ]
    )

    @F.pandas_udf(ret)
    def inflate(raw: pd.Series) -> pd.DataFrame:
        bodies: list[bytes | None] = []
        flags: list[bool | None] = []
        for v in raw:
            if v is None:
                bodies.append(None)
                flags.append(None)
                continue
            b = bytes(v)
            if b[:2] == b"\x1f\x8b":
                try:
                    d = zlib.decompressobj(wbits=31)
                    out = d.decompress(b, cap)
                    # corrupt/truncated stream that neither finished nor
                    # filled the cap -> treat as the gzread error path
                    if len(out) < cap and not d.eof:
                        raise zlib.error("incomplete gzip stream")
                    bodies.append(out)
                    flags.append(True)
                except zlib.error:
                    bodies.append(None)
                    flags.append(False)
            else:
                # gzread transparent mode: non-gzip bytes copy through
                bodies.append(b[:cap])
                flags.append(False)
        return pd.DataFrame({"body": bodies, "inflated": flags})

    dec = inflate(F.when(gate, F.col(content_col)))
    return (
        pages.withColumn("__dec", dec)
        .withColumn(
            content_col,
            F.coalesce(F.col("__dec.body"), F.col(content_col)),
        )
        .withColumn(
            "gunzipped", F.coalesce(F.col("__dec.inflated"), F.lit(False))
        )
        .drop("__dec")
    )


def gzip_compress_udf(mtime: int = 0):
    """Deterministic gzip compressor UDF — the fixture-side twin of
    :func:`gunzip_content` for round-trip tests and synth queries
    (mtime pinned so outputs are byte-stable)."""
    import gzip as _gzip

    @F.pandas_udf("binary")
    def gz(raw: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if v is None else _gzip.compress(bytes(v), mtime=mtime)
                for v in raw
            ]
        )

    return gz


def with_canonical_url(
    df: DataFrame, url_col: str = "url", out_col: str = "canon_url"
) -> DataFrame:
    """Canonical-URL law — the web-pipeline URL reconciliation the
    reference's C2 normalization stops short of: drop the fragment,
    lowercase scheme://host, strip the default :80 port, drop
    tracking query params (utm_*, ref, fbclid, gclid), and sort the
    surviving params so param order can't split a group.  Pure
    codegen string expressions (regexp + array ops on the one row),
    zero shuffles; every step is in the Java-regex ∩ RE2 subset so
    the DuckDB twin applies the identical law."""
    d = (
        df.withColumn(
            "__u", F.regexp_replace(F.col(url_col), "#.*$", "")
        )
        .withColumn(
            "__pre", F.regexp_extract("__u", "^([^/]*//[^/]*)", 1)
        )
        .withColumn("__rest", F.expr("substring(__u, length(__pre) + 1)"))
        .withColumn(
            "__base",
            F.concat(
                F.regexp_replace(F.lower("__pre"), ":80$", ""),
                F.regexp_replace("__rest", r"\?.*$", ""),
            ),
        )
        .withColumn("__qs", F.regexp_extract("__rest", r"\?(.*)$", 1))
        .withColumn(
            "__ps",
            F.expr(
                "array_sort(filter(split(__qs, '&'), p -> p <> '' "
                "AND NOT (substr(p, 1, 4) IN ('utm_', 'ref=') "
                "OR substr(p, 1, 7) = 'fbclid=' "
                "OR substr(p, 1, 6) = 'gclid=')))"
            ),
        )
    )
    return d.withColumn(
        out_col,
        F.when(
            F.size("__ps") > 0,
            F.concat(
                F.col("__base"), F.lit("?"), F.concat_ws("&", "__ps")
            ),
        ).otherwise(F.col("__base")),
    ).drop("__u", "__pre", "__rest", "__base", "__qs", "__ps")


def canonical_dedup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Canonical-URL dedup groups: every row gains its canon_url, the
    group's row count, and keep = 1 on the group's lexicographically
    smallest raw url (the survivor a crawl store would retain).  One
    hash-agg shuffle on the canonical key + one equi-join back; the
    group relation is at most one row per distinct canonical url, so
    AQE broadcasts it when the dup rate is high."""
    d = with_canonical_url(df, url_col)
    g = d.groupBy("canon_url").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.min(url_col).alias("__rep"),
    )
    return (
        d.join(g, "canon_url")
        .withColumn(
            "keep",
            (F.col(url_col) == F.col("__rep")).cast("long"),
        )
        .drop("__rep")
    )


def crawl_schedule(
    urls: DataFrame,
    dist: DataFrame,
    ranks: DataFrame,
    per_host: int = 1,
    k: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frontier prioritization — the scheduling decision C12's
    host-keyed multimap made implicitly, composed from the two
    query-independent link signals: fetch reachable pages (click
    distance != -1) in (dist asc, rank desc, id) order, at most
    ``per_host`` urls per host this wave (politeness), global top-k.

    ``urls``: (id, host); ``dist``: (id, dist) from
    :func:`click_distance`; ``ranks``: (id, rank) from
    :func:`pagerank` / :func:`trustrank` — pass ranks PRE-ROUNDED if
    an external twin must reproduce the cut (round-then-order law).
    Two broadcast-sized equi-joins on id, one window per host, one
    TakeOrderedAndProject — the frontier never shuffles more than
    once."""
    from pyspark.sql import Window

    j = (
        urls.join(dist, id_col)
        .join(ranks, id_col)
        .filter(F.col("dist") >= 0)
    )
    w = Window.partitionBy("host").orderBy(
        F.asc("dist"), F.desc("rank"), F.asc(id_col)
    )
    return (
        j.withColumn("slot", F.row_number().over(w))
        .filter(F.col("slot") <= int(per_host))
        .orderBy(F.asc("dist"), F.desc("rank"), F.asc(id_col))
        .limit(int(k))
    )


def recrawl_priority(
    history: DataFrame,
    now_s: int,
    url_col: str = "url",
    ts_col: str = "ts_s",
    fp_col: str = "fingerprint",
    k: int | None = None,
) -> DataFrame:
    """Change-rate recrawl scheduling — the freshness half of the crawl
    loop the reference never had (tse/Crawl.cpp crawls each url once;
    our recrawl upsert X54 INGESTS re-fetches but nothing decides WHEN
    to re-fetch).  From the crawl history (url, epoch-seconds ts,
    content fingerprint) estimate each url's Poisson change rate with
    the Cho & Garcia-Molina estimator (ACM TOIT 3(3) 2003, eq. for
    repeated accesses with unknown change times):

        lambda_hat = -ln((n - X + 0.5) / (n + 0.5)) / avg_interval_h

    where n = observation intervals, X = intervals whose fingerprint
    differed from the previous one (the +0.5 terms are the
    bias-correcting smoothing from the paper, keeping the estimator
    finite at X == n).  The schedule key is

        priority = lambda_hat * staleness_h

    — the expected number of changes missed since the last crawl, so
    a fast-changing page just crawled ranks below a slow page not seen
    for months exactly when their expected misses say so.

    Scale shape: ONE shuffle by url serves both the lag window (change
    flags) and the per-url aggregate; everything downstream is
    arithmetic on the corpus-sized per-url relation, and ``k`` cuts via
    TakeOrderedAndProject.  At 10^12 urls the history table is
    partitioned by url hash, so the window/agg co-partition with it
    and nothing re-shuffles.

    Urls with a single observation have no interval evidence: their
    change_rate / priority are NULL (the caller's cold-start policy —
    e.g. crawl_schedule's wave order — owns them).

    Returns (url, n_obs, n_changes, change_rate, staleness_h,
    priority), priority-desc."""
    from pyspark.sql import Window

    w = Window.partitionBy(url_col).orderBy(ts_col)
    flagged = history.withColumn(
        "__chg",
        F.coalesce(
            (F.col(fp_col) != F.lag(fp_col).over(w)).cast("long"),
            F.lit(0),
        ),
    )
    per_url = flagged.groupBy(url_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("__chg").alias("n_changes"),
        F.min(ts_col).alias("__first"),
        F.max(ts_col).alias("__last"),
    )
    n_int = (F.col("n_obs") - 1).cast("double")
    avg_h = (F.col("__last") - F.col("__first")) / F.lit(3600.0) / n_int
    lam = -F.log(
        (n_int - F.col("n_changes") + F.lit(0.5)) / (n_int + F.lit(0.5))
    ) / avg_h
    stale_h = (F.lit(int(now_s)) - F.col("__last")) / F.lit(3600.0)
    out = per_url.select(
        url_col,
        "n_obs",
        "n_changes",
        F.when(F.col("n_obs") >= 2, F.round(lam, 6)).alias("change_rate"),
        F.round(stale_h, 4).alias("staleness_h"),
        F.when(F.col("n_obs") >= 2, F.round(lam * stale_h, 4)).alias(
            "priority"
        ),
    ).orderBy(F.desc_nulls_last("priority"), F.asc(url_col))
    return out.limit(int(k)) if k is not None else out


# changefreq -> expected changes per HOUR (sitemaps.org vocabulary);
# 'always' is served as hourly (the protocol's "changes on every
# access" has no finite rate), 'never' as zero.  Shared with the
# DuckDB oracle as plain division literals.
SITEMAP_FREQ_PER_H: dict[str, float] = {
    "always": 1.0,
    "hourly": 1.0,
    "daily": 1.0 / 24.0,
    "weekly": 1.0 / 168.0,
    "monthly": 1.0 / 720.0,
    "yearly": 1.0 / 8760.0,
    "never": 0.0,
}


def parse_sitemaps(
    sitemaps: DataFrame,
    xml_col: str = "xml",
    sitemap_col: str = "sitemap_url",
) -> DataFrame:
    """Sitemap ingestion (sitemaps.org XML) — the publisher-declared
    side of crawl scheduling the reference never consumed (tse/
    Crawl.cpp discovers urls only from <a href>; sitemaps hand the
    crawler urls it can't reach by links plus lastmod/changefreq
    hints).

    Parses <urlset> documents: one row per <url> block with loc,
    lastmod (string, as published), changefreq (lowercased), and
    priority (double, protocol default 0.5 when absent); blocks
    without a <loc> are dropped (protocol-invalid).  <sitemapindex>
    child references are NOT expanded here — fetching is the crawl
    loop's job — but surface as rows of :func:`sitemap_index_children`.

    Scale shape: pure JVM regexp over each xml blob (regexp_extract_all
    block split + per-field extract on the exploded block — whole-stage
    codegen, no Python), embarrassingly parallel over the sitemap
    table, no shuffle at all."""
    block = F.explode(
        F.regexp_extract_all(
            F.col(xml_col), F.lit(r"(?s)<url>(.*?)</url>"), 1
        )
    ).alias("block")
    rows = sitemaps.select(sitemap_col, block)
    loc = F.regexp_extract("block", r"(?s)<loc>\s*(.*?)\s*</loc>", 1)
    lastmod = F.regexp_extract(
        "block", r"(?s)<lastmod>\s*(.*?)\s*</lastmod>", 1
    )
    freq = F.lower(
        F.regexp_extract(
            "block", r"(?s)<changefreq>\s*(.*?)\s*</changefreq>", 1
        )
    )
    prio = F.regexp_extract(
        "block", r"(?s)<priority>\s*(.*?)\s*</priority>", 1
    )
    return (
        rows.select(
            sitemap_col,
            loc.alias("url"),
            lastmod.alias("lastmod"),
            freq.alias("changefreq"),
            F.coalesce(
                F.nullif(prio, F.lit("")).cast("double"), F.lit(0.5)
            ).alias("priority"),
        )
        .filter(F.col("url") != "")
    )


def sitemap_index_children(
    sitemaps: DataFrame,
    xml_col: str = "xml",
    sitemap_col: str = "sitemap_url",
) -> DataFrame:
    """<sitemapindex> expansion list: (sitemap_url, child_url) rows to
    feed back into the fetch frontier.  Same zero-shuffle regexp
    shape as :func:`parse_sitemaps`."""
    child = F.explode(
        F.regexp_extract_all(
            F.col(xml_col), F.lit(r"(?s)<sitemap>(.*?)</sitemap>"), 1
        )
    ).alias("block")
    return (
        sitemaps.select(sitemap_col, child)
        .select(
            sitemap_col,
            F.regexp_extract(
                "block", r"(?s)<loc>\s*(.*?)\s*</loc>", 1
            ).alias("child_url"),
        )
        .filter(F.col("child_url") != "")
    )


def sitemap_recrawl_hints(
    entries: DataFrame, now_date: str
) -> DataFrame:
    """Publisher hints -> the recrawl scheduler's cold-start prior:
    changefreq maps to an expected change rate per hour
    (SITEMAP_FREQ_PER_H), age = days since lastmod (date arithmetic —
    timezone-free in every engine), and

        hint_priority = rate * age_h

    the same expected-missed-changes law :func:`recrawl_priority`
    scores observed urls with, so the two rankings merge on one scale
    (:func:`recrawl_priority_with_hints`).  Unknown/absent changefreq
    falls back to 'daily' (the protocol has no default; daily is the
    conservative crawl-scheduler convention); absent lastmod yields
    NULL age and NULL priority (no evidence at all — the caller's
    frontier order owns those).  Zero shuffle: row-local arithmetic."""
    rate = F.coalesce(
        *[
            F.when(F.col("changefreq") == k, F.lit(v))
            for k, v in SITEMAP_FREQ_PER_H.items()
        ],
        F.lit(SITEMAP_FREQ_PER_H["daily"]),
    )
    age_h = (
        F.datediff(
            F.lit(now_date).cast("date"),
            F.col("lastmod").try_cast("date"),
        )
        * F.lit(24.0)
    )
    return entries.select(
        "url",
        F.round(rate, 6).alias("hint_rate"),
        age_h.alias("hint_age_h"),
        F.round(rate * age_h, 4).alias("hint_priority"),
    )


def recrawl_priority_with_hints(
    history: DataFrame,
    hints: DataFrame,
    now_s: int,
    k: int | None = None,
) -> DataFrame:
    """The full recrawl schedule: urls WITH crawl history score by the
    observed Cho & Garcia-Molina rate (:func:`recrawl_priority`), urls
    the sitemap declares but we never crawled (or crawled once — no
    interval evidence) fall back to the publisher-hint prior
    (:func:`sitemap_recrawl_hints`); both sides share the
    rate*staleness scale so ONE ordered list drives the fetcher.
    ``source`` says which law produced each row.

    Scale shape: full outer join on url (both sides corpus-sized,
    co-partitioned by the join), then row-local coalesce; the optional
    k cut is a TakeOrderedAndProject."""
    obs = recrawl_priority(history, now_s)
    j = obs.join(hints, "url", "full_outer")
    rate = F.coalesce(F.col("change_rate"), F.col("hint_rate"))
    stale = F.when(
        F.col("change_rate").isNotNull(), F.col("staleness_h")
    ).otherwise(F.col("hint_age_h"))
    out = j.select(
        "url",
        F.when(F.col("change_rate").isNotNull(), F.lit("observed"))
        .when(F.col("hint_rate").isNotNull(), F.lit("hint"))
        .otherwise(F.lit("none"))
        .alias("source"),
        rate.alias("rate"),
        stale.alias("staleness_h"),
        F.round(rate * stale, 4).alias("priority"),
    ).orderBy(F.desc_nulls_last("priority"), F.asc("url"))
    return out.limit(int(k)) if k is not None else out


def crawl_budget(
    host_ranks: DataFrame,
    total: int,
    min_quota: int,
    cap: int,
    host_col: str = "host",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-host crawl-quota allocation from an authority prior — the
    bandwidth-split decision the reference's flat frontier never made
    (tse/Crawl.cpp crawls whatever the queue yields; at web scale the
    fetch budget is the scarce resource and spam hosts must not eat
    it).  quota(h) = clamp(floor(total * rank(h)), min_quota, cap):
    proportional to host PageRank, floored so every known host keeps a
    discovery trickle, capped so no single host starves the fleet.
    Pure per-row arithmetic over the (host, rank) table — zero
    shuffles beyond what produced the ranks; the ``crawl_budget``
    driver query recomputes the same law in SQL over the unrolled
    host-PageRank oracle."""
    return host_ranks.select(
        F.col(host_col).alias("host"),
        F.greatest(
            F.lit(int(min_quota)),
            F.least(
                F.lit(int(cap)),
                F.floor(F.lit(int(total)) * F.col(rank_col)).cast("long"),
            ),
        ).cast("long").alias("quota"),
    )
