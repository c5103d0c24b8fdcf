"""TableIO round-trips: parquet (always) and Iceberg (skip-if-no-jar).

The sandbox ships no iceberg-spark-runtime jar, so the Iceberg test is
expected to SKIP here — it exists so an environment that does have the
jar exercises IcebergTableIO end to end (write/read/exists), which is
otherwise untested-by-construction (VERDICT r02 §missing 5).
"""

import pytest

from tse_spark.sources import tables


def test_parquet_tableio_roundtrip(spark, tmp_path):
    io = tables.ParquetTableIO(str(tmp_path))
    df = spark.range(10).withColumnRenamed("id", "x")
    assert not io.exists("t1")
    io.write(df, "t1")
    assert io.exists("t1")
    got = io.read(spark, "t1")
    assert sorted(r["x"] for r in got.collect()) == list(range(10))


def test_get_table_io_falls_back_to_parquet(spark, tmp_path):
    io = tables.get_table_io(spark, str(tmp_path))
    if tables.IcebergTableIO.available(spark):  # pragma: no cover
        assert isinstance(io, tables.IcebergTableIO)
    else:
        assert isinstance(io, tables.ParquetTableIO)


def test_iceberg_tableio_roundtrip(spark):
    if not tables.IcebergTableIO.available(spark):
        pytest.skip("iceberg-spark-runtime jar not on the classpath")
    io = tables.IcebergTableIO()  # pragma: no cover - needs jars
    df = spark.range(5).withColumnRenamed("id", "x")
    io.write(df, "t_roundtrip")
    assert io.exists("t_roundtrip")
    got = io.read(spark, "t_roundtrip")
    assert sorted(r["x"] for r in got.collect()) == list(range(5))
    io.write(df, "t_roundtrip", mode="append")
    assert io.read(spark, "t_roundtrip").count() == 10
