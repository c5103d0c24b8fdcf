"""Vectorized extraction + tokenization for the Spark engine.

The byte semantics are pinned by :mod:`tse_spark.oracle`; the functions
here are performance implementations of the same contract, used inside
Arrow-batched pandas UDFs (BASELINE.json input_hint: "no per-row Python"
— i.e. no row-at-a-time ``F.udf``; Arrow batches with C-speed inner
loops are the sanctioned slow path per SURVEY.md §2.3).

- ``remove_tags_fast``  — numpy re-expression of the tag automaton
  (reference index/Document.cpp:31-71; tested equal to oracle.remove_tags)
- ``extract_text_fast`` — full T2->T3->T4 chain
- ``tokenize_fast``     — regex-segmented spec tokenizer, equal to
  oracle.tokenize on valid GB2312 input
- pandas-UDF factories for the extraction and (term, tf) pipelines
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd

from tse_spark import oracle

ENCODING = "gb2312"

_LT = 0x3C  # '<'
_GT = 0x3E  # '>'

# Segment alternation over one whitespace-free GB2312 chunk:
#   g1: ASCII run (no SP/TAB/LF/CR — pre-split removes them anyway)
#   g2: hanzi run (lead byte >= 0xB0, two-byte aligned)
#   g3: symbol/punct two-byte char (lead 0x80-0xAF) — delimiter
_SEG = re.compile(
    rb"((?:(?![ \t\r\n])[\x00-\x7f])+)"
    rb"|((?:[\xb0-\xff][\x00-\xff])+)"
    rb"|([\x80-\xaf][\x00-\xff])"
)
_WS_SPLIT = re.compile(rb"[ \t\r\n]+")


def remove_tags_fast(s: bytes) -> bytes:
    """Numpy port of the tag automaton (oracle.remove_tags).

    State = "was the most recent marker byte a '<'": computed with a
    forward-fill (maximum.accumulate over marker positions) instead of a
    per-byte Python loop.
    """
    if not s:
        return b""
    a = np.frombuffer(s, dtype=np.uint8)
    is_lt = a == _LT
    is_gt = a == _GT
    marker = np.where(is_lt, 1, np.where(is_gt, -1, 0)).astype(np.int8)
    idx = np.arange(a.size, dtype=np.int64)
    last_marker = np.maximum.accumulate(np.where(marker != 0, idx, -1))
    # state BEFORE each byte: shift the fill right by one
    prev_last = np.empty_like(last_marker)
    prev_last[0] = -1
    prev_last[1:] = last_marker[:-1]
    intag = (prev_last >= 0) & (marker[np.clip(prev_last, 0, None)] == 1)
    keep = is_lt | (~is_gt & ~intag)
    out = np.where(is_lt, np.uint8(0x20), a)[keep]
    return out.tobytes()


def extract_text_fast(html: bytes) -> bytes:
    """RemoveTags -> &nbsp; -> whitespace squeeze (order per reference
    index/DocSegment.cpp:157-167); byte-identical to oracle.extract_text."""
    return oracle.squeeze_ws(remove_tags_fast(html).replace(b"&nbsp;", b" "))


def tokenize_fast(
    text: bytes, dictionary: frozenset[bytes], lowercase: bool = True
) -> list[bytes]:
    """Spec-mode tokenizer, equal to oracle.tokenize on valid GB2312.

    Splits on ASCII whitespace first (C-speed; safe because GB2312 trail
    bytes are >= 0xA1), then segments each chunk with one regex pass;
    only FMM back-off runs in Python, over short hanzi runs.
    """
    out: list[bytes] = []
    fmm = oracle.fmm_segment
    for chunk in _WS_SPLIT.split(text):
        if not chunk:
            continue
        if chunk.isascii():
            out.append(chunk.lower() if lowercase else chunk)
            continue
        for m in _SEG.finditer(chunk):
            a, h, _ = m.groups()
            if a is not None:
                out.append(a.lower() if lowercase else a)
            elif h is not None:
                out.extend(fmm(h, dictionary))
    return out


def index_terms_fast(text: bytes, dictionary: frozenset[bytes]) -> list[bytes]:
    lo, hi = oracle.MIN_TERM_BYTES, oracle.MAX_TERM_BYTES
    return [t for t in tokenize_fast(text, dictionary) if lo <= len(t) <= hi]


def term_freqs(text: str, dictionary: frozenset[bytes]) -> list[tuple[str, int]]:
    """Per-document (term, tf) pairs after the eligibility filter —
    map-side tf aggregation so the explode emits one row per (doc, term)
    instead of one per occurrence."""
    counts = Counter(index_terms_fast(text.encode(ENCODING), dictionary))
    return [(t.decode(ENCODING), c) for t, c in counts.items()]


# ---------------------------------------------------------------------------
# T1: HTTP-header skip (reference index/DocSegment.cpp:133-156)
# ---------------------------------------------------------------------------

def http_body_expr(raw_col: str) -> str:
    """SQL expression (Spark dialect; ``strpos``-swap gives the DuckDB
    twin) implementing the reference's two-block header skip as a pure
    JVM expression — no Python in the row path.

    Keep-condition per block: the first CONSECUTIVE ``\\n\\n`` pair must
    start at position <= 1021, because the reference loop drops the doc
    the moment 1023 bytes are read — even when the pair's second byte
    lands exactly there (oracle.skip_http_headers documents the quirk;
    ``\\r`` resets the pair counter, so CRLF headers always drop).
    Returns NULL for dropped documents.
    """
    nn = "chr(10) || chr(10)"
    p1 = f"locate({nn}, {raw_col})"
    rest1 = f"substring({raw_col}, {p1} + 2)"
    p2 = f"locate({nn}, {rest1})"
    body = f"substring({rest1}, {p2} + 2)"
    keep = f"({p1} BETWEEN 1 AND 1021) AND ({p2} BETWEEN 1 AND 1021)"
    return f"CASE WHEN {keep} THEN {body} ELSE NULL END"


# ---------------------------------------------------------------------------
# pandas UDF factories (bind the broadcast dictionary at call time)
# ---------------------------------------------------------------------------

def make_extract_text_udf():
    """pandas UDF: html binary -> extracted text string (gb2312 decode)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def extract_udf(html: pd.Series) -> pd.Series:
        return html.map(
            lambda b: extract_text_fast(bytes(b)).decode(ENCODING)
        )

    return extract_udf


def make_term_freqs_udf(dict_broadcast):
    """pandas UDF: text string -> array<struct<term string, tf int>>.

    ``dict_broadcast`` is a ``sc.broadcast(frozenset[bytes])`` (the S9
    dictionary); referencing the broadcast inside the UDF avoids
    re-pickling the set per task.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.ArrayType(
        T.StructType(
            [
                T.StructField("term", T.StringType(), False),
                T.StructField("tf", T.IntegerType(), False),
            ]
        )
    )

    @F.pandas_udf(schema)
    def term_freqs_udf(text: pd.Series) -> pd.Series:
        d = dict_broadcast.value
        return text.map(lambda s: term_freqs(s, d))

    return term_freqs_udf


def make_term_freqs_dl_udf(dict_broadcast):
    """pandas UDF: text -> struct<dl int, pairs array<struct<term, tf>>>.

    Emits the document length alongside the per-doc (term, tf) pairs so
    the posting build needs NO doclen join/window — dl rides the explode
    (dl = sum of tfs = count of index-eligible tokens).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("dl", T.IntegerType(), False),
            T.StructField(
                "pairs",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("term", T.StringType(), False),
                            T.StructField("tf", T.IntegerType(), False),
                        ]
                    )
                ),
                False,
            ),
        ]
    )

    @F.pandas_udf(schema)
    def term_freqs_dl_udf(text: pd.Series) -> pd.DataFrame:
        d = dict_broadcast.value
        pairs = text.map(lambda s: term_freqs(s, d))
        dl = pairs.map(lambda ps: sum(tf for _, tf in ps))
        return pd.DataFrame({"dl": dl, "pairs": pairs})

    return term_freqs_dl_udf


def make_tokenize_udf(dict_broadcast, lowercase: bool = True):
    """pandas UDF: text string -> array<string> of ALL tokens (pre-filter),
    for doclen-style diagnostics and tests."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def tokenize_udf(text: pd.Series) -> pd.Series:
        d = dict_broadcast.value
        return text.map(
            lambda s: [
                t.decode(ENCODING)
                for t in tokenize_fast(s.encode(ENCODING), d, lowercase)
            ]
        )

    return tokenize_udf


def make_segment_url_udf(dict_broadcast):
    """pandas UDF: url string -> array<string> of K3 segment tokens
    (oracle.segment_url; FMM only touches hanzi path pieces)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def segment_url_udf(url: pd.Series) -> pd.Series:
        d = dict_broadcast.value
        return url.map(
            lambda s: [
                t.decode(ENCODING)
                for t in oracle.segment_url(s.encode(ENCODING), d)
            ]
        )

    return segment_url_udf


def make_doc_terms_udf(dict_broadcast):
    """pandas UDF: text -> struct<dl int, terms array<string>,
    tfs array<int>> — the DOCUMENT-MAJOR tf representation.

    Parallel string/int arrays (not array<struct>) so Arrow moves plain
    columnar list buffers; a corpus stores one row per doc instead of
    one per (doc, term), which shrinks the tf checkpoint and makes the
    posting build's Arrow transfer ~100x fewer rows.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("dl", T.IntegerType(), False),
            T.StructField("terms", T.ArrayType(T.StringType()), False),
            T.StructField("tfs", T.ArrayType(T.IntegerType()), False),
        ]
    )

    @F.pandas_udf(schema)
    def doc_terms_udf(text: pd.Series) -> pd.DataFrame:
        d = dict_broadcast.value
        pairs = text.map(lambda s: term_freqs(s, d))
        return pd.DataFrame(
            {
                "dl": pairs.map(lambda ps: sum(tf for _, tf in ps)),
                "terms": pairs.map(lambda ps: [t for t, _ in ps]),
                "tfs": pairs.map(lambda ps: [c for _, c in ps]),
            }
        )

    return doc_terms_udf
