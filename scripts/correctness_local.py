"""Driver-equivalent correctness run over registry entries, committed
as a LOCAL artifact (CORRECTNESS_LOCAL_r{N}.json) so rounds that add
queries after the driver's sample carry a recorded oracle result
instead of an unverified claim (round-4 ADVICE item 5).

Mirrors the grading driver's compare: run the Spark query and the
DuckDB oracle at sf0.01, check row count, sorted column names, and
order-insensitive value frame (float atol 1e-6, integer kind must
match).  Usage::

    python scripts/correctness_local.py --head 50 --out CORRECTNESS_LOCAL_r05.json
    python scripts/correctness_local.py --names wand_merged,spam_mass
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df):
    import numpy as np
    import pandas as pd

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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--head", type=int, default=0,
                    help="check the first N registry entries")
    ap.add_argument("--names", default="",
                    help="comma-separated explicit entries")
    ap.add_argument("--out", default=None, help="write JSON here")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    import duckdb
    import pandas as pd

    import __spark_entry__ as entrymod
    from tse_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    names = (
        [n for n in args.names.split(",") if n]
        if args.names
        else list(qs)[: args.head or len(qs)]
    )
    results: dict[str, dict] = {}
    for name in names:
        rec: dict = {
            "rows_match": False, "schema_match": False,
            "hash_match": False, "err": None,
        }
        t0 = time.time()
        try:
            got_raw = qs[name](spark, SF_DIR).toPandas()
            rec["spark_rows"] = len(got_raw)
            if name not in osql:
                rec["err"] = "no_oracle"
                rec["rows_match"] = rec["spark_rows"] >= 0
            else:
                want_raw = con.execute(osql[name]).df()
                rec["oracle_rows"] = len(want_raw)
                for c in got_raw.columns:
                    if c in want_raw.columns:
                        gi = pd.api.types.is_integer_dtype(got_raw[c])
                        wi = pd.api.types.is_integer_dtype(want_raw[c])
                        if gi != wi:
                            raise AssertionError(
                                f"{c}: dtype kind mismatch "
                                f"({got_raw[c].dtype} vs {want_raw[c].dtype})"
                            )
                got, want = normalize(got_raw), normalize(want_raw)
                rec["rows_match"] = len(got) == len(want)
                rec["schema_match"] = list(got.columns) == list(want.columns)
                if rec["rows_match"] and rec["schema_match"]:
                    pd.testing.assert_frame_equal(
                        got, want, check_dtype=False, check_exact=False,
                        atol=1e-6,
                    )
                    rec["hash_match"] = True
        except Exception as e:  # noqa: BLE001 — record, keep going
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
        rec["seconds"] = round(time.time() - t0, 2)
        results[name] = rec
        ok = "OK " if rec["hash_match"] else "ERR"
        print(f"{ok} {name} ({rec['seconds']}s)"
              + (f" -- {rec['err']}" if rec["err"] else ""), flush=True)
    n_ok = sum(1 for r in results.values() if r["hash_match"])
    print(f"== {n_ok}/{len(results)} hash-match", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
