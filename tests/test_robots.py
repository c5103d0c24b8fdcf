"""C13 robots.txt — Spark operator vs the faithful ParseRobot port.

Hand cases pin every reference quirk (Res.cpp:16-75); the randomized
corpus (seeded, 300 files drawn from a grammar of quirky line shapes)
checks the declarative window-function parse agrees with the sequential
C state machine on inputs neither was written against.
"""

import random

import pytest

from tse_spark.operators import robots as R
from tse_spark.oracle import parse_robot


def spark_parse(spark, files: dict[str, str]) -> dict[str, list[str]]:
    df = spark.createDataFrame(
        [(h, t) for h, t in files.items()], ["host", "robots_txt"]
    )
    rows = R.parse_robots(df).collect()
    out: dict[str, list[str]] = {h: [] for h in files}
    for r in sorted(rows, key=lambda r: (r["host"], r["rn"])):
        out[r["host"]].append(r["prefix"])
    return out


HAND_CASES = {
    "plain": "User-agent: *\nDisallow: /a\nDisallow: /b\n",
    "other-agent": "User-agent: Google\nDisallow: /x\nUser-agent: *\nDisallow: /y\n",
    "tse-reset": "User-agent: *\nDisallow: /z\nUser-agent: TSE/1.0\nDisallow: /t\n",
    "crlf": "User-agent: *\r\nDisallow: /crlf\r\n",
    "empty-value": "User-agent: *\nDisallow:\n",
    "comment-blank": "# hello\n\nUser-agent: *\nDisallow: /c\n",
    "prefix-directive": "User-agentX: TSE/1.0\nDisallowY: /q\n",
    "value-space-trunc": "User-agent: *\nDisallow: /p more words\n",
    "leading-blanks": "   User-agent: *\n \x08 Disallow: /lb\n",
    "star-prefix-value": "User-agent: *bot\nDisallow: /sp\n",
    "no-colon-ua": "User-agent *\nDisallow: /nc\n",
    "no-trailing-nl": "User-agent: *\nDisallow: /ntn",
    "long-line": "User-agent: *\nDisallow: /" + "a" * 300 + "\n",
    "cap-39": "User-agent: *\n"
    + "".join(f"Disallow: /p{i}\n" for i in range(45)),
    "reset-after-cap": "User-agent: *\n"
    + "".join(f"Disallow: /o{i}\n" for i in range(45))
    + "User-agent: TSE/1.0\nDisallow: /fresh\n",
    "empty": "",
}


def test_python_port_hand_semantics():
    assert parse_robot(HAND_CASES["plain"]) == ["/a", "/b"]
    assert parse_robot(HAND_CASES["other-agent"]) == ["/y"]
    assert parse_robot(HAND_CASES["tse-reset"]) == ["/t"]
    assert parse_robot(HAND_CASES["crlf"]) == ["/crlf\r"]
    assert parse_robot(HAND_CASES["empty-value"]) == [""]
    assert parse_robot(HAND_CASES["prefix-directive"]) == ["/q"]
    assert parse_robot(HAND_CASES["value-space-trunc"]) == ["/p"]
    assert parse_robot(HAND_CASES["leading-blanks"]) == ["/lb"]
    assert parse_robot(HAND_CASES["star-prefix-value"]) == ["/sp"]
    # UA line without a colon: the whole line is the directive word,
    # which still strncmp-matches 'User-agent'; the value read from the
    # (empty) remainder is '' -> match turns OFF
    assert parse_robot(HAND_CASES["no-colon-ua"]) == []
    assert parse_robot(HAND_CASES["no-trailing-nl"]) == ["/ntn"]
    # 255-char line cap: '/'+254 a's survive ('Disallow: ' eats 10)
    assert parse_robot(HAND_CASES["long-line"]) == ["/" + "a" * 244]
    cap = parse_robot(HAND_CASES["cap-39"])
    assert len(cap) == 39 and cap[0] == "/p0" and cap[-1] == "/p38"
    assert parse_robot(HAND_CASES["reset-after-cap"]) == ["/fresh"]
    assert parse_robot(HAND_CASES["empty"]) == []


def test_spark_matches_port_on_hand_cases(spark):
    got = spark_parse(spark, HAND_CASES)
    for name, txt in HAND_CASES.items():
        assert got[name] == parse_robot(txt), name


def _random_robots(rng: random.Random) -> str:
    agents = ["*", "TSE/1.0", "Googlebot", "*bot", "TSE/1.0x", ""]
    words = ["User-agent", "Disallow", "User-agentive", "Disall",
             "Allow", "# note", "Crawl-delay"]
    lines = []
    for _ in range(rng.randrange(0, 14)):
        kind = rng.random()
        if kind < 0.35:
            w = rng.choice(words)
            a = rng.choice(agents)
            lines.append(f"{w}: {a}")
        elif kind < 0.75:
            depth = rng.randrange(0, 3)
            path = "/" + "/".join(
                rng.choice(["a", "b", "cgi", "p q", ""])
                for _ in range(depth)
            )
            sep = rng.choice([": ", ":", ":  ", " : "])
            lines.append(f"Disallow{sep}{path}")
        elif kind < 0.85:
            lines.append("")
        else:
            lines.append(rng.choice(["   \x08junk", "no colon here",
                                     ":leading", "Disallow"]))
    body = "\n".join(lines)
    if rng.random() < 0.8:
        body += "\n"
    if rng.random() < 0.3:
        body = body.replace("\n", "\r\n")
    return body


def test_spark_matches_port_on_random_corpus(spark):
    rng = random.Random(1234)
    files = {f"rnd{i}": _random_robots(rng) for i in range(300)}
    got = spark_parse(spark, files)
    for name, txt in files.items():
        assert got[name] == parse_robot(txt), (name, repr(txt))


def test_frontier_filter(spark):
    rules_src = spark.createDataFrame(
        [
            ("h1.com", "User-agent: *\r\nDisallow: /priv\r\nDisallow:\r\n"),
            ("h2.com", "User-agent: Other\nDisallow: /\n"),
        ],
        ["host", "robots_txt"],
    )
    rules = R.parse_robots(rules_src)
    frontier = spark.createDataFrame(
        [
            ("http://h1.com/pub/a",),      # allowed
            ("http://h1.com/priv/x",),     # denied: /priv prefix
            ("http://h1.com/private",),    # denied: startswith semantics
            ("http://h2.com/priv",),       # allowed: rule not for us
            ("http://h3.com/anything",),   # allowed: no robots row
        ],
        ["url"],
    )
    kept = {r["url"] for r in R.robots_frontier_filter(frontier, rules).collect()}
    assert kept == {
        "http://h1.com/pub/a",
        "http://h2.com/priv",
        "http://h3.com/anything",
    }
    # the CRLF \r was stripped at filter time and the empty prefix
    # (Disallow: with no value) did not deny-all
    assert "http://h1.com/priv/x" not in kept
