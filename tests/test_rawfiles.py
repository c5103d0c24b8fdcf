"""Raw crawl-file ingest conformance (sources/rawfiles.py): Tianwang
record framing (the reference's native raw-page store,
tse/TianwangFile.cpp:36-58 + index/DocIndex.cpp:53-79) and WARC/1.0
with gzip members (the Common-Crawl layout), both as pure parsers and
through the binaryFile-backed Spark readers."""

import gzip
import hashlib
from datetime import datetime, timezone

import pytest

from tse_spark.sources import rawfiles as rf


BODY = "hello <b>world</b> 中文".encode("utf-8")


def _rec(url="http://a.example.com/p/1", origin=None, body=BODY):
    return rf.format_tianwang_record(
        url,
        rf.rfc1123(datetime(2004, 6, 1, 12, 0, 7, tzinfo=timezone.utc)),
        "10.0.0.1",
        rf.HEADER,
        body,
        origin=origin,
    )


# ---------------------------------------------------------- tianwang


def test_tianwang_roundtrip_single():
    blob = _rec()
    recs = rf.parse_tianwang(blob)
    assert len(recs) == 1
    r = recs[0]
    assert r["url"] == "http://a.example.com/p/1"
    assert r["origin"] is None
    assert r["date"] == "Tue, 01 Jun 2004 12:00:07 GMT"
    assert r["ip"] == "10.0.0.1"
    assert r["length"] == len(rf.HEADER) + len(BODY) + 1
    assert r["header"] == rf.HEADER
    assert r["body"] == BODY
    # the reference checksum: md5 over exactly `length` payload bytes
    assert r["checksum"] == hashlib.md5(
        rf.HEADER + b"\n" + BODY
    ).hexdigest()


def test_tianwang_origin_line():
    blob = _rec(origin="http://pre.example.com/redir")
    (r,) = rf.parse_tianwang(blob)
    assert r["origin"] == "http://pre.example.com/redir"
    assert r["url"] == "http://a.example.com/p/1"


def test_tianwang_multi_record_and_junk_between():
    blob = _rec() + b"#garbage\nnoise\n" + _rec(
        url="http://b.example.org/x", body=b"second"
    )
    recs = rf.parse_tianwang(blob)
    assert [r["url"] for r in recs] == [
        "http://a.example.com/p/1", "http://b.example.org/x",
    ]
    assert recs[1]["body"] == b"second"


def test_tianwang_body_containing_marker_not_resplit():
    # length framing must win over marker scanning: a body embedding
    # the version marker line stays one record
    evil = b"x\nversion: 1.0\nurl: http://fake/\n\ny"
    blob = _rec(body=evil) + _rec(url="http://b.example.org/x")
    recs = rf.parse_tianwang(blob)
    assert len(recs) == 2
    assert recs[0]["body"] == evil
    assert recs[1]["url"] == "http://b.example.org/x"


def test_tianwang_truncated_tail_dropped():
    blob = _rec() + _rec(url="http://b.example.org/x")
    recs = rf.parse_tianwang(blob[:-10])
    assert len(recs) == 1  # complete record kept, truncated one dropped


def test_tianwang_empty_and_garbage():
    assert rf.parse_tianwang(b"") == []
    assert rf.parse_tianwang(b"random bytes \xff\x00") == []


# -------------------------------------------------------------- warc


def _warc(url="http://a.example.com/p/1", body=BODY, gz=True):
    return rf.format_warc_record(
        url,
        "2004-06-01T12:00:07Z",
        rf.HEADER,
        body,
        "urn:uuid:0000-1",
        gzip_member=gz,
    )


def test_warc_roundtrip_plain_and_gzip():
    for gz in (False, True):
        blob = _warc(gz=gz)
        recs = rf.parse_warc(blob)
        assert len(recs) == 1
        r = recs[0]
        assert r["url"] == "http://a.example.com/p/1"
        assert r["date"] == "2004-06-01T12:00:07Z"
        assert r["record_id"] == "urn:uuid:0000-1"
        assert r["content_length"] == len(rf.HEADER) + len(BODY)
        assert r["body"] == BODY


def test_warc_concatenated_gzip_members():
    blob = _warc() + _warc(url="http://b.example.org/x", body=b"two")
    recs = rf.parse_warc(blob)
    assert [r["url"] for r in recs] == [
        "http://a.example.com/p/1", "http://b.example.org/x",
    ]
    assert recs[1]["body"] == b"two"


def test_warc_non_response_records_skipped():
    req = _warc(gz=False).replace(
        b"WARC-Type: response", b"WARC-Type: request"
    )
    blob = req + _warc(gz=False)
    recs = rf.parse_warc(blob)
    assert len(recs) == 1
    assert recs[0]["url"] == "http://a.example.com/p/1"


def test_warc_body_leading_newline_preserved():
    body = b"\nleading newline body"
    (r,) = rf.parse_warc(_warc(body=body))
    assert r["body"] == body  # no tianwang separator strip on WARC


def test_warc_gzip_member_is_standard():
    # each member must be independently gunzippable (CC range-request
    # compatibility)
    blob = _warc()
    assert gzip.decompress(blob[: len(blob)]).startswith(b"WARC/1.0\r\n")


# ------------------------------------------------------ spark readers


def test_read_tianwang_binaryfile(spark, tmp_path):
    f1 = tmp_path / "crawl.raw.0"
    f2 = tmp_path / "crawl.raw.1"
    f1.write_bytes(_rec() + _rec(url="http://b.example.org/x",
                                 body=b"second"))
    f2.write_bytes(_rec(url="http://c.example.de/y", body=b"third"))
    df = rf.read_tianwang(spark, str(tmp_path) + "/crawl.raw.*")
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {
        "http://a.example.com/p/1", "http://b.example.org/x",
        "http://c.example.de/y",
    }
    r = rows["http://a.example.com/p/1"]
    assert bytes(r["html"]) == BODY
    assert r["warc_ts"] == datetime(2004, 6, 1, 12, 0, 7)
    assert r["src_file"].endswith("crawl.raw.0")


def test_read_warc_binaryfile(spark, tmp_path):
    (tmp_path / "seg.warc.gz").write_bytes(
        _warc() + _warc(url="http://b.example.org/x", body=b"two")
    )
    df = rf.read_warc(spark, str(tmp_path) + "/*.warc.gz")
    rows = sorted(df.collect(), key=lambda r: r["url"])
    assert [r["url"] for r in rows] == [
        "http://a.example.com/p/1", "http://b.example.org/x",
    ]
    assert bytes(rows[1]["html"]) == b"two"
    assert rows[0]["warc_ts"] == datetime(2004, 6, 1, 12, 0, 7)


def test_rfc1123_locale_independent():
    # every weekday/month abbreviation the law can emit
    assert rf.rfc1123(
        datetime(2026, 1, 4, 0, 0, 0, tzinfo=timezone.utc)
    ) == "Sun, 04 Jan 2026 00:00:00 GMT"
    assert rf.rfc1123(
        datetime(2004, 12, 31, 23, 59, 59, tzinfo=timezone.utc)
    ) == "Fri, 31 Dec 2004 23:59:59 GMT"
