"""Pure-Python oracle for the TSE byte semantics and BM25 ranking.

This module is the single source of truth for correctness: every Spark
operator in the engine is tested against these functions on deterministic
fixtures.  It reimplements (from observed behavior, not copied code) the
reference's extraction + tokenization semantics:

- ``remove_tags``       — tag-strip automaton, reference index/Document.cpp:31-71
- ``replace_nbsp``      — entity replace, reference index/DocSegment.cpp:165
- ``squeeze_ws``        — whitespace squeeze, reference index/StrFun.cpp:92-112
- ``ascii_lower``       — byte-wise ASCII lowercase, reference index/StrFun.cpp:13-20
- ``fmm_segment``       — forward-maximum-match, reference index/ChSeg/HzSeg.cpp:20-51
- ``tokenize``          — sentence segmenter (spec mode), reference
                          index/ChSeg/HzSeg.cpp:57-166
- term-length filter    — 2..8 GB bytes, reference index/CrtInvertedIdx.cpp:25

Two tokenizer modes exist:

* **spec mode** (the shipping engine): ASCII runs split on whitespace, GB
  punctuation/symbol region (lead byte 161-175) is a delimiter, hanzi runs
  (lead byte >= 176) go through FMM.  ASCII is lowercased at both index and
  query time.  This is the *intended* semantics of the reference (its
  query path lowercases, HzSeg splits sentences); documented deviations
  from the literal code are listed in ``raw_tse_segment``'s docstring.

* **raw-TSE mode** (fidelity oracle only): the literal reference behavior,
  including the LF/CR-only ASCII split (index/ChSeg/HzSeg.cpp:76-80: space
  does NOT terminate an ASCII run, so post-squeeze ASCII text becomes one
  run), punctuation emitted as 2-byte tokens, the tf-1 scoring bug
  (index/Query.cpp:306-320) and the lexicographic result-set ordering
  (index/TSESearch.cpp:140-143).

All byte functions operate on GB2312/GBK byte strings; the engine
round-trips Spark's UTF-8 strings through ``.encode('gb2312')``.
"""

from __future__ import annotations

import math
import re
from collections import Counter

# BM25 parameters pinned by BASELINE.json north_star.
BM25_K1 = 1.2
BM25_B = 0.75

# Term byte-length filter (reference index/CrtInvertedIdx.cpp:25).
MIN_TERM_BYTES = 2
MAX_TERM_BYTES = 8

# FMM candidate cap in bytes (reference index/ChSeg/HzSeg.cpp:6).
MAX_WORD_LENGTH = 8

_WS_RUN = re.compile(rb"[ \t\r\n]+")


# ---------------------------------------------------------------------------
# extraction (T2 -> T3 -> T4, applied in that order per DocSegment.cpp:157-167)
# ---------------------------------------------------------------------------

def remove_tags(s: bytes) -> bytes:
    """Tag-strip automaton (reference index/Document.cpp:31-71).

    Exact byte semantics: ``<`` always emits one space and enters tag
    state (even when already inside a tag); ``>`` always exits tag state
    and emits nothing (a stray ``>`` outside a tag is dropped); any other
    byte is emitted iff not inside a tag.  There is no quote or comment
    awareness — a ``>`` inside a quoted attribute ends the tag.
    """
    out = bytearray()
    intag = False
    for b in s:
        if b == 0x3C:  # '<'
            intag = True
            out.append(0x20)
        elif b == 0x3E:  # '>'
            intag = False
        elif not intag:
            out.append(b)
    return bytes(out)


def replace_nbsp(s: bytes) -> bytes:
    """``&nbsp;`` -> one space (only that entity; DocSegment.cpp:165)."""
    return s.replace(b"&nbsp;", b" ")


def squeeze_ws(s: bytes) -> bytes:
    """Each maximal run of ``[ \\t\\r\\n]+`` -> single space, no trim
    (reference index/StrFun.cpp:92-112, CStrFun::EmptyStr)."""
    return _WS_RUN.sub(b" ", s)


def extract_text(html: bytes) -> bytes:
    """Full extraction chain: RemoveTags -> &nbsp; -> squeeze.

    Order per reference index/DocSegment.cpp:157-167.  This is the
    byte-identity invariant of BASELINE.json input_hint: the Spark UDF
    must produce exactly these bytes per url.
    """
    return squeeze_ws(replace_nbsp(remove_tags(html)))


# T1: HTTP-header skip (reference index/DocSegment.cpp:133-156,
# HEADER_BUF_SIZE=1024 at :18).
HEADER_BUF_SIZE = 1024


def skip_http_headers(raw: bytes) -> bytes | None:
    """Skip two consecutive-``\\n\\n``-terminated blocks; ``None`` =
    drop the document (reference ``continue``).

    Faithful quirks of the reference loop:

    - ``newlines`` counts CONSECUTIVE ``\\n`` only — any other byte
      (including ``\\r``) resets it, so CRLF headers never match and
      such documents are dropped;
    - the doc is dropped whenever 1023 bytes were read, even if the
      second ``\\n`` arrived exactly at byte 1023 (the reference checks
      ``bytesRead == HEADER_BUF_SIZE-1`` after the loop, unconditionally);
    - running out of input before a pair is found is a drop (the C code
      would read past the buffer; no fixture document does this).
    """
    pos = 0
    for _ in range(2):
        newlines = 0
        bytes_read = 0
        while newlines != 2 and bytes_read != HEADER_BUF_SIZE - 1:
            if pos >= len(raw):
                return None
            if raw[pos : pos + 1] == b"\n":
                newlines += 1
            else:
                newlines = 0
            pos += 1
            bytes_read += 1
        if bytes_read == HEADER_BUF_SIZE - 1:
            return None
    return raw[pos:]


def ascii_lower(s: bytes) -> bytes:
    """Byte-wise ``A-Z`` -> ``a-z``; all other bytes untouched
    (reference index/StrFun.cpp:13-20).  Safe on GB2312: double-byte
    sequences never use bytes < 0xA1."""
    return bytes(b + 32 if 0x41 <= b <= 0x5A else b for b in s)


def cgi_decode(s: bytes) -> bytes:
    """``%xx`` decode, reference ``CHzSeg::Translate``
    (index/ChSeg/HzSeg.cpp:169-201): the two chars after ``%`` are
    hex-valued via ``(c & 0xdf) - 'A' + 10`` when >= ``'A'`` else
    ``c - '0'`` — no validation, any bytes accepted, ``+`` NOT mapped
    to space.  One deviation: a ``%`` within 2 bytes of the end is
    passed through (the C code reads past the buffer there)."""
    out = bytearray()
    j = 0
    n = len(s)
    while j < n:
        c = s[j]
        if c == 0x25 and j + 2 < n:  # '%'

            def hexv(ch: int) -> int:
                if ch >= 0x41:  # 'A'
                    return (ch & 0xDF) - 0x41 + 10
                return ch - 0x30
            out.append((hexv(s[j + 1]) * 16 + hexv(s[j + 2])) & 0xFF)
            j += 3
        else:
            out.append(c)
            j += 1
    return bytes(out)


def segment_url(
    url: bytes, dictionary: frozenset[bytes] = frozenset()
) -> list[bytes]:
    """K3: ImgSE URL segmenter (reference index/ChSeg/HzSeg.cpp:207-263).

    ``Translate`` (%xx decode) -> drop scheme+host (cut through the
    first ``/`` after position 7 when ``http://`` occurs anywhere) ->
    erase from the LAST ``.`` to the end (the reference rfinds over the
    whole remaining path, so a dot in an EARLIER piece chops every
    later piece too — faithful quirk) -> split the remainder on ``/``
    and sentence-segment each piece (FMM for hanzi, whitespace-split
    lowercased ASCII).  Returns the flat token list."""
    u = cgi_decode(url)
    if u.find(b"http://") != -1:
        n = u.find(b"/", 7)
        if n != -1:
            u = u[n + 1:]
    r = u.rfind(b".")
    if r != -1:
        u = u[:r]
    toks: list[bytes] = []
    for piece in u.split(b"/"):
        if piece:
            toks += tokenize(piece, dictionary)
    return toks


# ---------------------------------------------------------------------------
# tokenization (spec mode)
# ---------------------------------------------------------------------------

def fmm_segment(run: bytes, dictionary: frozenset[bytes]) -> list[bytes]:
    """Forward-maximum-match over a hanzi run (even-length GB2312 bytes).

    Reference index/ChSeg/HzSeg.cpp:20-51: candidate = first
    min(len, 8) bytes; while candidate not in dict and len > 2, drop the
    trailing hanzi (2 bytes); emit; advance.  Single hanzi (2 bytes) are
    emitted even when out-of-dictionary.
    """
    out: list[bytes] = []
    pos = 0
    n = len(run)
    while pos < n:
        ln = min(n - pos, MAX_WORD_LENGTH)
        w = run[pos : pos + ln]
        while ln > 2 and w not in dictionary:
            ln -= 2
            w = run[pos : pos + ln]
        out.append(w)
        pos += ln
    return out


def tokenize(
    text: bytes,
    dictionary: frozenset[bytes] = frozenset(),
    lowercase: bool = True,
) -> list[bytes]:
    """Spec-mode sentence segmentation (engine contract).

    Byte walk over GB2312 text (reference index/ChSeg/HzSeg.cpp:57-166
    semantics, with the documented intended-ASCII deviation):

    - ASCII bytes (< 0x80): maximal runs of non-whitespace ASCII form one
      token each; ASCII whitespace (SP/TAB/LF/CR) delimits.  Lowercased
      when ``lowercase`` (the engine lowercases both index and query
      sides; the literal reference lowercases queries only,
      index/Query.cpp:39-43).
    - GB2312 symbol/punctuation region (lead byte 161-175): two-byte
      delimiter, never a token.
    - Hanzi (lead byte >= 176): maximal two-byte-aligned run handed to
      :func:`fmm_segment`.
    """
    out: list[bytes] = []
    n = len(text)
    i = 0
    while i < n:
        b = text[i]
        if b < 0x80:
            if b in (0x20, 0x09, 0x0A, 0x0D):
                i += 1
                continue
            j = i + 1
            while j < n and text[j] < 0x80 and text[j] not in (0x20, 0x09, 0x0A, 0x0D):
                j += 1
            tok = text[i:j]
            out.append(ascii_lower(tok) if lowercase else tok)
            i = j
        elif b < 0xB0:
            i += 2  # symbol/punct region: delimiter
        else:
            j = i + 2
            while j + 1 < n and text[j] >= 0xB0:
                j += 2
            out.extend(fmm_segment(text[i:j], dictionary))
            i = j
    return out


def eligible(term: bytes) -> bool:
    """Index-eligibility filter: 2 <= byte length <= 8
    (reference index/CrtInvertedIdx.cpp:25)."""
    return MIN_TERM_BYTES <= len(term) <= MAX_TERM_BYTES


def index_terms(
    text: bytes, dictionary: frozenset[bytes] = frozenset()
) -> list[bytes]:
    """Tokenize then apply the eligibility filter — the exact multiset of
    terms that enters the index for one document."""
    return [t for t in tokenize(text, dictionary) if eligible(t)]


# ---------------------------------------------------------------------------
# BM25 oracle engine
# ---------------------------------------------------------------------------

def bm25_idf(n_docs: int, df: int) -> float:
    """Lucene-style non-negative idf: ln(1 + (N - df + 0.5)/(df + 0.5))."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_term_score(tf: int, dl: int, avgdl: float, idf: float) -> float:
    return idf * tf * (BM25_K1 + 1.0) / (
        tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
    )


class BM25Oracle:
    """Single-process reference engine: builds tf/df/doclen from
    :func:`index_terms` and scores BM25 (k1=1.2, b=0.75).  The Spark
    engine must be rank-identical (scores atol 1e-6) to this on the
    fixture query set (SURVEY.md §7 contract reconciliation)."""

    def __init__(
        self,
        docs: dict[int, bytes],
        dictionary: frozenset[bytes] = frozenset(),
    ) -> None:
        self.dictionary = dictionary
        self.tf: dict[int, Counter] = {}
        self.doclen: dict[int, int] = {}
        df_counter: Counter = Counter()
        for doc_id, text in docs.items():
            terms = index_terms(text, dictionary)
            c = Counter(terms)
            self.tf[doc_id] = c
            self.doclen[doc_id] = len(terms)
            df_counter.update(c.keys())
        self.df = dict(df_counter)
        self.n_docs = len(docs)
        self.avgdl = (
            sum(self.doclen.values()) / self.n_docs if self.n_docs else 0.0
        )

    def query_terms(self, query: bytes) -> list[bytes]:
        return [
            t
            for t in tokenize(query, self.dictionary, lowercase=True)
            if eligible(t)
        ]

    def search(self, query: bytes, k: int = 10, conjunctive: bool = False):
        """Top-k ``(doc_id, score)``; score desc, doc_id asc tiebreak.

        ``conjunctive=True`` reproduces the reference's AND semantics
        (index/Query.cpp:349-372): a doc must contain every query term.
        """
        terms = sorted(set(self.query_terms(query)))
        if not terms:
            return []
        scores: dict[int, float] = {}
        hits: dict[int, int] = {}
        present = [t for t in terms if t in self.df]
        if conjunctive and len(present) < len(terms):
            return []
        for t in present:
            idf = bm25_idf(self.n_docs, self.df[t])
            for doc_id, c in self.tf.items():
                tf = c.get(t)
                if tf:
                    scores[doc_id] = scores.get(doc_id, 0.0) + bm25_term_score(
                        tf, self.doclen[doc_id], self.avgdl, idf
                    )
                    hits[doc_id] = hits.get(doc_id, 0) + 1
        items = [
            (d, s)
            for d, s in scores.items()
            if not conjunctive or hits[d] == len(terms)
        ]
        items.sort(key=lambda x: (-x[1], x[0]))
        return items[:k]


# ---------------------------------------------------------------------------
# raw-TSE fidelity mode (literal reference behavior; NOT the engine contract)
# ---------------------------------------------------------------------------

# GB punctuation stop-set of the literal segmenter's while-loop
# (index/ChSeg/HzSeg.cpp:120-133), including its operator-precedence quirk:
# second-byte values 168/169/186/187/191 stop the run for ANY lead byte in
# [161,176), not just 163.
def _raw_is_stop(lead: int, second: int) -> bool:
    if lead == 161 and (162 <= second <= 168 or 171 <= second <= 191):
        return True
    if lead == 163 and second in (172, 161):
        return True
    if second in (168, 169, 186, 187, 191):
        return True
    return False


def raw_tse_segment(text: bytes, dictionary: frozenset[bytes]) -> list[bytes]:
    """Literal SegmentSentenceMM behavior (index/ChSeg/HzSeg.cpp:57-166).

    Quirks reproduced: ASCII runs terminate only at LF/CR/non-ASCII (a
    space inside a run stays inside the token, :76-80); a run starting
    with SP/LF/CR is appended WITHOUT a separator (i.e. it fuses with the
    following token boundary, :84-90); symbol-region runs (lead byte
    161-175) are emitted as tokens unless they begin with the fullwidth
    space 0xA1A1 (:135-141), with stop-punctuation emitted as single
    2-byte tokens; hanzi runs go through FMM.
    """
    sep = object()  # boundary marker
    parts: list[object] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch < 128:
            j = i + 1
            while j < n and text[j] < 128 and text[j] not in (10, 13):
                j += 1
            run = text[i:j]
            if ch not in (32, 10, 13):
                parts.append(run)
                parts.append(sep)
            else:
                parts.append(run)  # fused, no separator (:84-90)
            i = j
        elif ch < 176:
            j = i
            while (
                j + 1 < n
                and 161 <= text[j] < 176
                and not _raw_is_stop(text[j], text[j + 1])
            ):
                j += 2
            if j == i:
                j = i + 2
            if not (ch == 161 and i + 1 < n and text[i + 1] == 161):
                parts.append(text[i:j])
                parts.append(sep)
            i = j
        else:
            j = i + 2
            while j + 1 < n and text[j] >= 176:
                j += 2
            for w in fmm_segment(text[i:j], dictionary):
                parts.append(w)
                parts.append(sep)
            i = j
    # join fused fragments between separators, drop empties
    out: list[bytes] = []
    cur = b""
    for p in parts:
        if p is sep:
            if cur:
                out.append(cur)
            cur = b""
        else:
            cur += p  # type: ignore[operator]
    if cur:
        out.append(cur)
    return out


def raw_tse_search(
    docs_terms: dict[int, list[bytes]], query_terms: list[bytes]
) -> list[str]:
    """Literal result semantics: per-term tf-1 scoring (init-to-0 bug,
    index/Query.cpp:306-320), conjunctive AND across terms
    (index/Query.cpp:349-372), and the final ``set<string>`` lexicographic
    docid-string ordering that discards tf order
    (index/TSESearch.cpp:107,140-143).  Returns docids as strings in that
    order."""
    result: set[str] | None = None
    for t in query_terms:
        if not eligible(t):
            continue
        matched = {str(d) for d, terms in docs_terms.items() if t in terms}
        result = matched if result is None else (result & matched)
    return sorted(result) if result else []


# ---------------------------------------------------------------------------
# C13 — robots.txt parser (reference tse/Res.cpp:16-75, ParseRobot)
# ---------------------------------------------------------------------------

ROBOTS_USER_AGENT = "TSE/1.0"  # Res.cpp:13 USER_AGENT
ROBOTS_MAXDIR = 40             # Res.cpp:12 MAXDIR


def _robots_getword(line: str, stop: str) -> tuple[str, str]:
    """Res.cpp:16-33 ``my_getword``: skip leading blanks (space and the
    literal backspace ``\\b`` — Res.cpp:20, almost certainly a typo for
    ``\\t`` but faithful here), then copy chars until the stop char or
    end, keeping at most 255 (Res.cpp:24 ``i < 255``; the rest of the
    word is consumed but dropped).  Returns (word, text after the stop
    char)."""
    i = 0
    while i < len(line) and line[i] in " \b":
        i += 1
    word = []
    n = 0
    while i < len(line) and line[i] != stop:
        if n < 255:
            word.append(line[i])
        i += 1
        n += 1
    return "".join(word), line[i + 1 :]


def parse_robot(data: str) -> list[str]:
    """Faithful port of ``ParseRobot`` (Res.cpp:36-75): returns the
    Disallow prefixes collected for this engine's user agent.

    Semantics preserved exactly:
    - line = chars up to ``\\n`` after skipping leading blanks, capped at
      255 chars (my_getline = my_getword with stop ``\\n``);
    - word before the first ``:`` selects the directive; the match is
      ``strncmp`` so any *prefix* ``User-agent``/``Disallow`` matches
      (``User-agentX:`` counts, Res.cpp:48,59);
    - a ``User-agent`` value starting with ``*`` (only the first char is
      tested, Res.cpp:52) or exactly equal to ``TSE/1.0`` turns matching
      on; any other agent turns it off; the exact-agent case also RESETS
      the write pointer to 0 (Res.cpp:55-57), discarding everything
      collected so far;
    - ``Disallow`` values are read up to the first space, so a trailing
      ``\\r`` from CRLF files stays *inside the prefix* (bug-faithful) and
      an empty value yields an empty-string prefix;
    - at most MAXDIR=40 entries are stored, and the NULL terminator
      overwrites slot 39 when the array is full (Res.cpp:70-71), so a
      full array yields only 39 usable prefixes.

    Divergence (documented): the C loop's ``continue`` on an empty word
    skips the end-of-data check and, for inputs ending in a blank line or
    without a trailing newline, walks past the NUL terminator (undefined
    behavior).  This port treats exhausted input as end-of-file instead.
    """
    arr: list[str | None] = [None] * ROBOTS_MAXDIR
    num = 0
    match = 0
    while True:
        line, data = _robots_getword(data, "\n")
        word, line = _robots_getword(line, ":")
        if word != "":
            if word.startswith("User-agent"):
                value, line = _robots_getword(line, " ")
                match = 1 if value.startswith("*") else 0
                if value == ROBOTS_USER_AGENT:
                    match = 1
                    num = 0
            elif word.startswith("Disallow"):
                if match == 1:
                    value, line = _robots_getword(line, " ")
                    if num < ROBOTS_MAXDIR:
                        arr[num] = value
                        num += 1
        if len(data) == 0:
            break
    if num >= ROBOTS_MAXDIR:
        num = ROBOTS_MAXDIR - 1  # dir[num-1] = NULL (Res.cpp:71)
    return [w for w in arr[:num]]  # type: ignore[misc]


# ---------------------------------------------------------------------------
# BPE merge learning — the pure-Python truth the Spark operator
# (tse_spark/operators/bpe.py) is conformance-pinned to, and the source
# of the fixture parquet its driver oracle scores from (the pages_bm25
# fixture pattern: the law is iterative, so no direct SQL twin exists).
# Laws:
#   words    lowercase whitespace tokens (empties dropped), corpus counts
#   symbols  unicode characters of the word
#   pairs    adjacent symbol pairs, weighted by word count, overlapping
#            occurrences all counted ("aaa" -> (a,a) twice)
#   pick     max count, ties by (left, right) ascending
#   merge    replace occurrences LEFT-TO-RIGHT, non-overlapping
#            ("aaa" + (a,a) -> [aa, a])
#   stop     when the best pair's count < 2 (merging singletons is noise)
# ---------------------------------------------------------------------------


def bpe_word_counts(texts: "list[str]") -> "dict[str, int]":
    counts: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            if w:
                counts[w] = counts.get(w, 0) + 1
    return counts


def bpe_pair_counts(
    words: "dict[tuple[str, ...], int]",
) -> "dict[tuple[str, str], int]":
    pc: dict[tuple[str, str], int] = {}
    for syms, c in words.items():
        for i in range(len(syms) - 1):
            pc[(syms[i], syms[i + 1])] = pc.get(
                (syms[i], syms[i + 1]), 0
            ) + c
    return pc


def bpe_merge_word(
    syms: "tuple[str, ...]", a: str, b: str
) -> "tuple[str, ...]":
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_learn(
    word_counts: "dict[str, int]", n_merges: int
) -> "list[tuple[str, str, int]]":
    """The learned merge list [(left, right, pair_count), ...] in merge
    order, at most ``n_merges`` long."""
    words = {tuple(w): c for w, c in word_counts.items() if w}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pc = bpe_pair_counts(words)
        if not pc:
            break
        (a, b), n = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < 2:
            break
        merges.append((a, b, n))
        words = {
            bpe_merge_word(s, a, b): c for s, c in words.items()
        }
    return merges


def bpe_segment_word(
    word: str, merges: "list[tuple[str, str, int]]"
) -> "tuple[str, ...]":
    syms = tuple(word)
    for a, b, _ in merges:
        syms = bpe_merge_word(syms, a, b)
    return syms
