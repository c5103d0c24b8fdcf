"""C10 gzip decode — gate, transparency, truncation, corrupt-stream
fallback (reference tse/Crawl.cpp:462-493 semantics)."""

import gzip

from pyspark.sql import types as T

from tse_spark.operators.crawl import gunzip_content

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("content_encoding", T.StringType()),
        T.StructField("content_type", T.StringType()),
    ]
)


def run(spark, rows, cap=1024000):
    df = spark.createDataFrame(rows, SCHEMA)
    out = gunzip_content(df, cap=cap).collect()
    return {
        r["doc_id"]: (
            None if r["content"] is None else bytes(r["content"]),
            r["gunzipped"],
        )
        for r in out
    }


def test_gate_and_paths(spark):
    body = b"<html>hello tse</html>"
    gz = gzip.compress(body, mtime=0)
    corrupt = gz[:8] + b"\x00" * 4  # valid magic, broken stream
    rows = [
        (1, gz, "gzip", "text/html"),        # inflate
        (2, gz, "gzip", "text/plain"),       # gate: stays compressed
        (3, gz, "identity", "text/html"),    # gate: stays compressed
        (4, body, "gzip", "text/html"),      # transparent copy
        (5, corrupt, "gzip", "text/html"),   # corrupt: raw kept, no exit
        (6, None, "gzip", "text/html"),      # null body stays null-ish
    ]
    got = run(spark, rows)
    assert got[1] == (body, True)
    assert got[2] == (gz, False)
    assert got[3] == (gz, False)
    assert got[4] == (body, False)
    assert got[5] == (corrupt, False)
    # doc 6: content stays NULL, flag false
    assert got[6][1] is False


def test_truncation_both_paths(spark):
    long_body = b"x" * 5000
    rows = [
        (1, gzip.compress(long_body, mtime=0), "gzip", "text/html"),
        (2, long_body, "gzip", "text/html"),  # transparent, also capped
        (3, long_body, "identity", "text/html"),  # ungated: NOT capped
    ]
    got = run(spark, rows, cap=1000)
    assert got[1] == (b"x" * 1000, True)
    assert got[2] == (b"x" * 1000, False)
    assert got[3] == (long_body, False)
