"""Streaming variants equal the batch operators on the same input.

The stream runs with trigger(availableNow=True) over a copy of the
events fixture and a long watermark; in append mode only windows closed
by the final watermark are emitted, so the batch comparison is
restricted to sessions/windows that closed before the max event time
minus the watermark delay.
"""

import shutil

import pytest
from pyspark.sql import functions as F

from tse_spark.operators import events as ev
from tse_spark.streaming import (
    hourly_window_agg_stream,
    read_events_stream,
    sessionize_stream,
)

SRC = "/root/testdata/sf0.001/events.parquet"
WATERMARK_S = 2 * 3600


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(SRC, d / "events.parquet")
    return str(d)


def _run_stream(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _max_ts(spark):
    row = spark.read.parquet(SRC).agg(
        F.max(F.col("ts").cast("timestamp").cast("long")).alias("m")
    ).collect()[0]
    return row["m"]


def test_sessionize_stream_matches_batch(spark, stream_dir):
    got = _run_stream(
        spark,
        sessionize_stream(read_events_stream(spark, stream_dir)),
        "sess_stream",
    ).collect()
    horizon = _max_ts(spark) - WATERMARK_S
    batch = (
        ev.sessionize(spark.read.parquet(SRC))
        .filter(
            # streaming append mode only emits sessions closed by the
            # final watermark: session end + gap <= watermark horizon
            (F.col("t_end") + 30 * 60) <= horizon
        )
        .collect()
    )
    want = {(r["user_id"], r["n_events"], r["t_start"], r["t_end"]) for r in batch}
    emitted = {
        (r["user_id"], r["n_events"], r["t_start"], r["t_end"]) for r in got
    }
    # every batch-closed session must be emitted with identical bounds
    assert want <= emitted
    assert len(want) > 0
    # and nothing emitted may contradict the batch sessionization
    all_batch = {
        (r["user_id"], r["n_events"], r["t_start"], r["t_end"])
        for r in ev.sessionize(spark.read.parquet(SRC)).collect()
    }
    assert emitted <= all_batch


def test_hourly_stream_matches_batch(spark, stream_dir):
    got = _run_stream(
        spark,
        hourly_window_agg_stream(read_events_stream(spark, stream_dir)),
        "hourly_stream",
    ).collect()
    horizon = _max_ts(spark) - WATERMARK_S
    batch = (
        ev.hourly_window_agg(spark.read.parquet(SRC))
        .filter((F.col("hour_start") + 3600) <= horizon)
        .collect()
    )
    want = {
        (r["hour_start"], r["event_type"], r["n"], r["total"]) for r in batch
    }
    emitted = {
        (r["hour_start"], r["event_type"], r["n"], r["total"]) for r in got
    }
    assert want <= emitted
    assert len(want) > 0
    all_batch = {
        (r["hour_start"], r["event_type"], r["n"], r["total"])
        for r in ev.hourly_window_agg(spark.read.parquet(SRC)).collect()
    }
    assert emitted <= all_batch


def test_host_budget_stream_matches_batch_oracle(spark, tmp_path):
    """applyInPandasWithState politeness budget == batch row_number
    oracle under a single ordered pass (availableNow)."""
    from pyspark.sql.window import Window

    from tse_spark.streaming import host_budget_stream

    # synth frontier: 6 hosts x 40 urls spread over 3 event-hours
    rows = []
    import datetime as dt

    base = dt.datetime(2004, 5, 1, 0, 0, 0)
    for i in range(240):
        host = f"site{i % 6}.example.cn"
        ts = base + dt.timedelta(minutes=(i * 7) % 180, seconds=i % 60)
        rows.append((host, f"http://{host}/p/{i}", ts))
    src = str(tmp_path / "frontier")
    spark.createDataFrame(
        rows, "host string, url string, ts timestamp"
    ).repartition(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "host string, url string, ts timestamp"
    ).parquet(src)
    out_dir = str(tmp_path / "out")
    q = (
        host_budget_stream(stream, per_hour=4)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)

    batch = spark.createDataFrame(
        rows, "host string, url string, ts timestamp"
    ).withColumn(
        "hour", (F.col("ts").cast("long") / 3600).cast("long")
    )
    w = Window.partitionBy("host", "hour").orderBy("ts", "url")
    expect = batch.withColumn(
        "admitted", F.row_number().over(w) <= 4
    ).select("host", "url", "admitted")

    assert got.count() == 240
    diff = (
        got.select("host", "url", "admitted")
        .exceptAll(expect)
        .count()
    )
    assert diff == 0, f"{diff} decisions differ from the batch oracle"
    # budget actually binds: some rejections exist
    assert got.filter(~F.col("admitted")).count() > 0


def test_host_budget_stream_multi_chunk_group(spark, tmp_path):
    """Groups larger than one Arrow batch arrive as several chunks in
    arbitrary relative order — the (ts, url) processing order must hold
    across the WHOLE group (regression: per-chunk sorting diverged from
    the batch oracle once a host exceeded maxRecordsPerBatch)."""
    import datetime as dt

    from pyspark.sql.window import Window

    from tse_spark.streaming import host_budget_stream

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        base = dt.datetime(2004, 5, 1)
        rows = [
            (
                "h.cn",
                f"http://h.cn/{i:04d}",
                base + dt.timedelta(seconds=i * 37 % 7200),
            )
            for i in range(200)
        ]
        src = str(tmp_path / "src")
        spark.createDataFrame(
            rows, "host string, url string, ts timestamp"
        ).repartition(1).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(
            "host string, url string, ts timestamp"
        ).parquet(src)
        q = (
            host_budget_stream(stream, per_hour=4)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.read.parquet(str(tmp_path / "out"))
        batch = spark.createDataFrame(
            rows, "host string, url string, ts timestamp"
        ).withColumn("hour", (F.col("ts").cast("long") / 3600).cast("long"))
        w = Window.partitionBy("host", "hour").orderBy("ts", "url")
        expect = batch.withColumn(
            "admitted", F.row_number().over(w) <= 4
        ).select("host", "url", "admitted")
        assert out.count() == 200
        assert (
            out.select("host", "url", "admitted").exceptAll(expect).count()
            == 0
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def _admit_reference_loop(pdf, hour0, used0, per_hour):
    """The pre-vectorization sequential form (pandas iterrows), kept as
    the conformance + speed reference for admit_batch."""
    hours = (pdf["ts"].astype("int64") // 1_000_000_000 // 3600).tolist()
    out = []
    for (_, _r), h in zip(pdf.iterrows(), hours):
        if h > hour0:
            hour0, used0 = int(h), 0
        admitted = h == hour0 and used0 < per_hour
        if admitted:
            used0 += 1
        out.append(admitted)
    return out, hour0, used0


def test_admit_batch_matches_sequential_reference():
    import numpy as np
    import pandas as pd

    from tse_spark.streaming.frontier import admit_batch

    rng = np.random.RandomState(13)
    for trial in range(50):
        n = int(rng.randint(0, 60))
        hours = np.sort(rng.randint(0, 6, size=n)).astype(np.int64)
        hour0 = int(rng.randint(-1, 7))
        per_hour = int(rng.randint(1, 5))
        used0 = int(rng.randint(0, per_hour + 1))
        pdf = pd.DataFrame({"ts": pd.to_datetime(hours * 3600, unit="s")})
        want, wh, wu = _admit_reference_loop(pdf, hour0, used0, per_hour)
        got, gh, gu = admit_batch(hours, hour0, used0, per_hour)
        assert list(got) == want, (trial, hours, hour0, used0, per_hour)
        assert (gh, gu) == (wh, wu), (trial, hours, hour0, used0, per_hour)


def test_admit_batch_speedup_over_loop():
    """The round-2 perf nit: the vectorized admit must beat the
    iterrows loop by >= 10x rows/s on a 100k-row host group."""
    import time

    import numpy as np
    import pandas as pd

    from tse_spark.streaming.frontier import admit_batch

    rng = np.random.RandomState(17)
    hours = np.sort(rng.randint(0, 48, size=100_000)).astype(np.int64)
    pdf = pd.DataFrame({"ts": pd.to_datetime(hours * 3600, unit="s")})

    t0 = time.time()
    want, _, _ = _admit_reference_loop(pdf, -1, 0, 4)
    t_loop = time.time() - t0

    t0 = time.time()
    got, _, _ = admit_batch(hours, -1, 0, 4)
    t_vec = max(time.time() - t0, 1e-9)

    assert list(got) == want
    assert t_loop / t_vec >= 10, f"only {t_loop / t_vec:.1f}x"
