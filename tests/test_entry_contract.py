"""Driver-contract harness: runs every queries() entry at sf0.01 and
compares against oracle_sql() via DuckDB — the same check the grading
driver performs (row count + columns + order-insensitive values)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = pd.DataFrame()
    for c in sorted(df.columns):
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = np.round(s.astype("float64"), 6)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        else:
            out[c] = s.astype("object").where(s.notna(), None).map(
                lambda x: "<null>" if x is None else str(x)
            )
    out = out.sort_values(by=list(out.columns), kind="mergesort")
    return out.reset_index(drop=True)


SQL_CHECKED = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    raw_got = fn(spark, SF_DIR).toPandas()
    raw_want = duck.execute(entrymod.oracle_sql()[name]).df()
    # the driver's value hash distinguishes int64 3 from float64 3.0
    # (the round-1 events_sessionize failure mode): require matching
    # numeric KIND per column, not just equal values
    for c in raw_got.columns:
        if c in raw_want.columns:
            g_int = pd.api.types.is_integer_dtype(raw_got[c])
            w_int = pd.api.types.is_integer_dtype(raw_want[c])
            assert g_int == w_int, (
                f"{name}.{c}: dtype kind mismatch "
                f"(spark {raw_got[c].dtype} vs oracle {raw_want[c].dtype})"
            )
    got = normalize(raw_got)
    want = normalize(raw_want)
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, atol=1e-6
    )


ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert [f.name for f in df.schema.fields] == ["doc_id", "score"]
