"""Standalone-cluster launch test: a REAL multi-executor master (not
local[N]) — master + 2 workers as separate JVMs, the build+serving job
submitted via ``spark-submit --py-files`` (scripts/cluster_bench.py),
shuffles crossing actual executor process boundaries.

Gated behind ``SPARK_GRAFT_CLUSTER_TEST=1`` because it spawns four
JVMs (~2 min): the per-round evidence lives in CLUSTER_SCALING.json /
BASELINE.md (scripts/run_cluster_scaling.py); this test keeps the path
from rotting in between.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_CLUSTER_TEST") != "1"
    or not os.path.exists("/opt/spark/bin/spark-submit"),
    reason="set SPARK_GRAFT_CLUSTER_TEST=1 (needs /opt/spark, ~2 min)",
)


def test_standalone_cluster_build_and_serve(tmp_path):
    out_json = str(tmp_path / "scaling.json")
    res = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_cluster_scaling.py"),
            "--docs", "3000",
            "--workers", "2",
            "--worker-cores", "2",
            "--executor-mem", "2g",
            "--n-cores", "2",
            "--scale", "2",
            "--partitions", "8",
            "--out-json", out_json,
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    with open(out_json) as f:
        result = json.load(f)
    n_leg = result["legs"]["N"]
    big = result["legs"]["4N"]
    assert "error" not in n_leg, n_leg
    assert "error" not in big, big
    # the N leg really ran multi-executor (1 executor x 2 cores at
    # cores.max=2... at least one NON-driver executor), the 2N leg on two
    assert n_leg["executors"] >= 1 and big["executors"] == 2
    assert n_leg["master"].startswith("spark://")
    assert n_leg["n_docs"] == big["n_docs"] > 0
    # scaling must not change a single ranked result
    assert result["rank_identical"] is True
    assert n_leg["query_p50_ms"] > 0 and big["docs_per_sec"] > 0
