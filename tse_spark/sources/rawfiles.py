"""Raw crawl-file ingest: Tianwang record files and WARC/1.0.

The reference's raw page store is the "Tianwang format" — an
append-only record file each crawler thread writes without locking
(tse/TianwangFile.cpp:36-58) and the indexer re-scans by marker +
``length:`` framing (index/DocIndex.cpp:45-85).  Common Crawl — the
corpus the north_star targets — ships the same idea as WARC/1.0 with
per-record gzip members.  This module parses BOTH containers from
opaque binary blobs into the canonical pages schema
``(url, warc_ts, html, ...)`` so a user can point the engine at raw
crawler output instead of a pre-built pages table.

Record framing (byte-exact twin of the reference writer):

    version: 1.0\\n
    url: <final url>\\n
    [origin: <pre-redirect url>\\n]
    date: <RFC1123 GMT>\\n
    ip: <ip or host>\\n
    length: <len(header) + len(body) + 1>\\n
    \\n
    <http header>\\n<body>\\n

The scanner consumes exactly ``length`` bytes after the blank line —
header, the separating newline, body (DocIndex.cpp:76-79 reads
``m_nLength`` bytes and md5s them; :func:`parse_tianwang` reproduces
that checksum definition).  WARC framing is ``Content-Length`` octets
after the header block, then ``\\r\\n\\r\\n``; gzip-member
concatenation is detected by the 1F8B magic and unwrapped with
``zlib(wbits=31)`` + ``unused_data`` chaining.

Scale design: the split unit is the FILE.  ``spark.read.format
("binaryFile")`` lists paths distributively and hands each blob to one
task — exactly how Common Crawl is processed in practice (gzip members
are not block-splittable; the corpus compensates with ~1 GiB files x
hundreds of thousands of files, so a 1000-executor cluster saturates
on file-level parallelism).  Parsing streams per blob inside
``mapInPandas`` (iterator form), no driver involvement; downstream the
records enter the normal pages pipeline (url dedup, extraction, index
build).  Keep individual raw files under a few hundred MB so one
record blob fits a python worker — the crawler's file-rotation knob,
not the engine's.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

_DAYS = ("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
_MONTHS = (
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
)


def rfc1123(dt: datetime) -> str:
    """Locale-independent RFC-1123 GMT stamp (the reference uses C
    strftime '%a, %d %b %Y %H:%M:%S GMT', TianwangFile.cpp:34)."""
    return (
        f"{_DAYS[dt.weekday()]}, {dt.day:02d} {_MONTHS[dt.month - 1]} "
        f"{dt.year:04d} {dt.hour:02d}:{dt.minute:02d}:{dt.second:02d} GMT"
    )


def iso8601(dt: datetime) -> str:
    """WARC-Date form (ISO-8601 Zulu, second precision)."""
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


# ------------------------------------------------------------- tianwang


def format_tianwang_record(
    url: str,
    date: str,
    ip: str,
    header: bytes,
    body: bytes,
    origin: str | None = None,
) -> bytes:
    """One record, byte-identical to the reference writer's layout."""
    out = bytearray()
    out += b"version: 1.0\n"
    out += b"url: " + url.encode("utf-8") + b"\n"
    if origin:
        out += b"origin: " + origin.encode("utf-8") + b"\n"
    out += b"date: " + date.encode("ascii") + b"\n"
    out += b"ip: " + ip.encode("ascii") + b"\n"
    out += b"length: " + str(len(header) + len(body) + 1).encode() + b"\n"
    out += b"\n"
    out += header + b"\n" + body + b"\n"
    return bytes(out)


def _split_http(payload: bytes, sep_nl: bool = False) -> tuple[bytes, bytes]:
    """(http_header, body) from a stored HTTP payload; the header/body
    boundary is the HTTP head terminator (same convention as the T1
    http_header_skip operator).  ``sep_nl`` additionally strips the
    single separating newline the TIANWANG writer inserts between
    header and content — WARC stores header+body with no separator, so
    a WARC body that legitimately begins with a newline keeps it."""
    i = payload.find(b"\r\n\r\n")
    if i < 0:
        return b"", payload
    body = payload[i + 4:]
    if sep_nl and body[:1] == b"\n":
        body = body[1:]
    return payload[: i + 4], body


def parse_tianwang(blob: bytes) -> list[dict]:
    """All records in one Tianwang file blob.

    Framing follows the reference scanner: find a ``version: 1.0``
    line, read ``url:`` / optional ``origin:`` / ``date:`` / ``ip:``
    until the ``length:`` line, skip the blank line, then consume
    exactly ``length`` bytes (DocIndex.cpp:53-79).  ``checksum`` is
    md5 over those length bytes — the reference's content checksum
    definition.  Malformed regions are skipped by rescanning for the
    next version marker (the reference tolerates junk between records
    the same way)."""
    out: list[dict] = []
    pos = 0
    n = len(blob)
    marker = b"version: 1.0\n"
    while pos < n:
        at = blob.find(marker, pos)
        if at < 0:
            break
        p = at + len(marker)
        rec: dict = {"url": None, "origin": None, "date": None, "ip": None}
        length = -1
        ok = True
        while p < n:
            eol = blob.find(b"\n", p)
            if eol < 0:
                ok = False
                break
            line = blob[p:eol]
            p = eol + 1
            if line == b"":
                break  # blank line: payload follows
            try:
                key, _, val = line.partition(b": ")
                k = key.decode("ascii")
            except UnicodeDecodeError:
                ok = False
                break
            if k == "length":
                try:
                    length = int(val)
                except ValueError:
                    ok = False
                break
            if k in rec:
                rec[k] = val.decode("utf-8", "replace")
        if not ok or length < 0 or rec["url"] is None:
            pos = at + len(marker)
            continue
        # skip the blank line if the length line ended before it
        if blob[p:p + 1] == b"\n":
            p += 1
        payload = blob[p:p + length]
        if len(payload) < length:
            break  # truncated tail
        header, body = _split_http(payload, sep_nl=True)
        out.append(
            {
                "url": rec["url"],
                "origin": rec["origin"],
                "date": rec["date"],
                "ip": rec["ip"],
                "length": length,
                "header": header,
                "body": body,
                "checksum": hashlib.md5(payload).hexdigest(),
            }
        )
        pos = p + length
    return out


# ----------------------------------------------------------------- warc


def format_warc_record(
    url: str,
    date: str,
    header: bytes,
    body: bytes,
    record_id: str,
    gzip_member: bool = True,
) -> bytes:
    """One WARC/1.0 response record; per-record gzip member by default
    (the Common-Crawl layout)."""
    http = header + body
    out = bytearray()
    out += b"WARC/1.0\r\n"
    out += b"WARC-Type: response\r\n"
    out += b"WARC-Target-URI: " + url.encode("utf-8") + b"\r\n"
    out += b"WARC-Date: " + date.encode("ascii") + b"\r\n"
    out += b"WARC-Record-ID: <" + record_id.encode("ascii") + b">\r\n"
    out += b"Content-Type: application/http; msgtype=response\r\n"
    out += b"Content-Length: " + str(len(http)).encode() + b"\r\n"
    out += b"\r\n"
    out += http
    out += b"\r\n\r\n"
    raw = bytes(out)
    if not gzip_member:
        return raw
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(raw)
    return buf.getvalue()


def _gunzip_members(blob: bytes) -> bytes:
    """Concatenated gzip members -> concatenated plain bytes."""
    out = bytearray()
    data = blob
    while data[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(data)
        out += d.flush()
        data = d.unused_data
    return bytes(out)


def parse_warc(blob: bytes) -> list[dict]:
    """All response records in a WARC blob (plain or gzip members).
    Non-response records (warcinfo, request, metadata) are skipped;
    framing is Content-Length octets after the header block."""
    if blob[:2] == b"\x1f\x8b":
        blob = _gunzip_members(blob)
    out: list[dict] = []
    pos = 0
    n = len(blob)
    while pos < n:
        at = blob.find(b"WARC/1.0\r\n", pos)
        if at < 0:
            break
        hdr_end = blob.find(b"\r\n\r\n", at)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in blob[at + 10:hdr_end].split(b"\r\n"):
            key, _, val = line.partition(b": ")
            headers[key.decode("ascii", "replace").lower()] = val.decode(
                "utf-8", "replace"
            )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + 4
            continue
        payload = blob[hdr_end + 4:hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if len(payload) < clen:
            break
        if headers.get("warc-type") != "response":
            continue
        http_header, body = _split_http(payload)
        out.append(
            {
                "url": headers.get("warc-target-uri"),
                "date": headers.get("warc-date"),
                "record_id": headers.get("warc-record-id", "").strip("<>"),
                "content_length": clen,
                "header": http_header,
                "body": body,
            }
        )
    return out


# -------------------------------------------------------------- readers


_TIANWANG_SCHEMA = (
    "url string, origin string, date string, ip string, length long, "
    "html binary, checksum string, src_file string"
)

_WARC_SCHEMA = (
    "url string, date string, record_id string, content_length long, "
    "html binary, src_file string"
)


def read_tianwang(spark: SparkSession, path_glob: str) -> DataFrame:
    """Tianwang raw files -> one row per record.  ``binaryFile`` lists
    and partitions by FILE (the split unit — see module docstring);
    parsing streams batch-by-batch in the task.  ``warc_ts`` is the
    parsed RFC-1123 date as a timestamp; ``html`` is the body bytes."""
    files = spark.read.format("binaryFile").load(path_glob)

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                for rec in parse_tianwang(bytes(r.content)):
                    rows.append(
                        (
                            rec["url"], rec["origin"], rec["date"],
                            rec["ip"], rec["length"], rec["body"],
                            rec["checksum"], r.path,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "origin", "date", "ip", "length", "html",
                    "checksum", "src_file",
                ],
            )

    parsed = files.select("path", "content").mapInPandas(
        run, schema=_TIANWANG_SCHEMA
    )
    # Spark >= 3 rejects day-of-week (EEE) in PARSE patterns
    # (DATETIME_PATTERN_RECOGNITION); the weekday is redundant, so
    # parse the tail after "Www, "
    return parsed.withColumn(
        "warc_ts",
        F.to_timestamp(
            F.substring_index("date", ", ", -1),
            "dd MMM yyyy HH:mm:ss 'GMT'",
        ),
    )


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC files (plain or gzip-member) -> one row per response
    record, same file-granular parallelism as :func:`read_tianwang`."""
    files = spark.read.format("binaryFile").load(path_glob)

    def run(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                for rec in parse_warc(bytes(r.content)):
                    rows.append(
                        (
                            rec["url"], rec["date"], rec["record_id"],
                            rec["content_length"], rec["body"], r.path,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "date", "record_id", "content_length",
                    "html", "src_file",
                ],
            )

    parsed = files.select("path", "content").mapInPandas(
        run, schema=_WARC_SCHEMA
    )
    return parsed.withColumn(
        "warc_ts",
        F.to_timestamp("date", "yyyy-MM-dd'T'HH:mm:ss'Z'"),
    )


# -------------------------------------------------- deterministic laws

EPOCH = datetime(2004, 6, 1, tzinfo=timezone.utc)
HEADER = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"


def synth_date(doc_id: int) -> datetime:
    """Deterministic per-doc fetch time: EPOCH + 7s * doc_id."""
    return EPOCH + timedelta(seconds=7 * int(doc_id))


def synth_ip(doc_id: int) -> str:
    return f"10.0.{int(doc_id) % 250}.1"
