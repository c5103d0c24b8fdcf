"""C13 — robots.txt parsing and frontier filtering, Spark-declarative.

The reference ships ``ParseRobot`` (tse/Res.cpp:16-75) — a line-oriented
state machine collecting the ``Disallow`` prefixes that apply to its
``TSE/1.0`` user agent — but never wires it into the crawl loop (the
``extern`` at Crawl.cpp:12 is the only mention).  This module implements
the parser faithfully as pure DataFrame expressions plus the consumer
the reference never wrote: an allow/deny filter over the crawl frontier.

Faithfulness target is :func:`tse_spark.oracle.parse_robot` (the
pure-Python port, property-tested against this operator in
tests/test_robots.py).  All reference quirks are preserved:

- lines and words are capped at 255 chars, leading spaces/backspaces
  are skipped (Res.cpp:20,24);
- directive matching is ``strncmp`` — any *prefix* of ``User-agent`` /
  ``Disallow`` before the colon matches (Res.cpp:48,59);
- a UA value starting with ``*`` (first char only, Res.cpp:52) or equal
  to ``TSE/1.0`` enables collection; the exact-agent case resets the
  write pointer, discarding earlier prefixes (Res.cpp:55-57);
- values are read up to the first space, so CRLF files keep the ``\\r``
  inside the prefix, and ``Disallow:`` with no value emits ``""``;
- MAXDIR=40 slots; a full array loses slot 39 to the NULL terminator,
  so at most 39 prefixes survive (Res.cpp:70-71).

Scale: parsing is one ``split`` + ``posexplode`` + two host-partitioned
window passes — robots files are tiny (<= a few KB each), so even a
billion-host robots table is a modest shuffle on ``host``.  The frontier
filter never shuffles the frontier at all: rules collapse to one
prefix-array row per host (bounded at 39 entries), broadcast-joined into
the frontier scan, and the per-URL decision is a codegen ``exists`` over
``startswith``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tse_spark.oracle import ROBOTS_MAXDIR, ROBOTS_USER_AGENT

# leading-blank class: space + literal backspace (Res.cpp:20)
_BLANKS = r"^[ \x08]+"


def _strip_cap(col):
    """my_getword's prologue: skip leading blanks, cap at 255 chars."""
    return F.substring(F.regexp_replace(col, _BLANKS, ""), 1, 255)


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """(host, rn, prefix) — the surviving Disallow prefixes per host in
    collection order (rn is 1-based), exactly the array ``ParseRobot``
    returns.  ``prefix`` may be empty or contain a trailing ``\\r``
    (bug-faithful; :func:`robots_frontier_filter` is where pragmatic
    normalization happens)."""
    h, t = F.col(host_col), F.col(txt_col)
    lines = robots.select(
        h.alias("host"),
        F.posexplode(F.split(t, "\n")).alias("pos", "raw_line"),
    ).withColumn("line", _strip_cap(F.col("raw_line")))
    word = F.substring_index(F.col("line"), ":", 1)
    # text after the first ':' ('' when the line has no colon — the C
    # code walks past the terminator there, UB; see oracle.parse_robot)
    rest = F.when(
        F.instr(F.col("line"), ":") > 0,
        F.expr("substring(line, instr(line, ':') + 1)"),
    ).otherwise(F.lit(""))
    value = F.substring(
        F.substring_index(F.regexp_replace(rest, _BLANKS, ""), " ", 1),
        1,
        255,
    )
    parsed = lines.select(
        "host",
        "pos",
        word.startswith("User-agent").alias("is_ua"),
        word.startswith("Disallow").alias("is_dis"),
        value.alias("value"),
    )
    wseq = (
        Window.partitionBy("host")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    whost = Window.partitionBy("host")
    ua_match = F.when(
        F.col("is_ua"),
        F.col("value").startswith("*")
        | (F.col("value") == ROBOTS_USER_AGENT),
    )
    state = parsed.select(
        "host",
        "pos",
        "is_dis",
        "value",
        F.coalesce(
            F.last(ua_match, ignorenulls=True).over(wseq), F.lit(False)
        ).alias("matched"),
        F.max(
            F.when(
                F.col("is_ua") & (F.col("value") == ROBOTS_USER_AGENT),
                F.col("pos"),
            )
        )
        .over(whost)
        .alias("last_reset"),
    )
    kept = state.filter(
        F.col("is_dis")
        & F.col("matched")
        & (
            F.col("last_reset").isNull()
            | (F.col("pos") > F.col("last_reset"))
        )
    )
    worder = Window.partitionBy("host").orderBy("pos")
    out = kept.select(
        "host",
        F.row_number().over(worder).alias("rn"),
        F.count(F.lit(1)).over(whost).alias("n_kept"),
        F.col("value").alias("prefix"),
    )
    # full array loses slot 39 to the NULL terminator (Res.cpp:70-71)
    cap = F.when(
        F.col("n_kept") >= ROBOTS_MAXDIR, F.lit(ROBOTS_MAXDIR - 1)
    ).otherwise(F.col("n_kept"))
    return out.filter(F.col("rn") <= cap).select("host", "rn", "prefix")


def robots_frontier_filter(
    frontier: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Frontier rows whose URL path is not under any Disallow prefix for
    its host — the consumer ``ParseRobot`` was written for.

    Pragmatic deviations from the raw parse output (both documented in
    :func:`parse_robots`): empty prefixes are ignored (real-robots
    semantics — ``Disallow:`` with no value means allow-all, and an
    empty prefix would startswith-match every path), and a trailing
    ``\\r`` is stripped so CRLF robots files still match real paths.

    Plan: rules aggregate to one (host, array<prefix>) row (<= 39
    entries each), broadcast into the frontier scan; the decision is a
    codegen ``exists(prefixes, p -> startswith(path, p))``.  The
    frontier — the big side at crawl scale — is never shuffled.
    Hosts with no robots row are allowed (left join, null array).
    """
    u = F.col(url_col)
    per_host = (
        rules.select(
            "host", F.regexp_replace("prefix", r"\r$", "").alias("p")
        )
        .filter(F.octet_length("p") > 0)
        .groupBy("host")
        .agg(F.collect_list("p").alias("prefixes"))
    )
    fr = frontier.withColumn("__host", F.parse_url(u, F.lit("HOST")))
    joined = fr.join(
        F.broadcast(per_host),
        fr["__host"] == per_host["host"],
        "left",
    )
    path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit(""))
    denied = F.when(
        F.col("prefixes").isNotNull(),
        F.exists("prefixes", lambda p: path.startswith(p)),
    ).otherwise(F.lit(False))
    return joined.filter(~denied).drop("__host", "host", "prefixes")
