import pandas as pd
import pytest

from tse_spark import fixtures
from tse_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cpus=4, app="tse_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_pdf() -> pd.DataFrame:
    return fixtures.gen_pages(500)


@pytest.fixture(scope="session")
def pages_df(spark, pages_pdf):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(pages_pdf, schema=schema)


@pytest.fixture(scope="session")
def dict_broadcast(spark):
    return spark.sparkContext.broadcast(fixtures.mini_dict_bytes())
