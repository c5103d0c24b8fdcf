"""N-vs-4N-EXECUTOR scaling run on a real standalone cluster — the
north rule's two-cluster-size criterion, evidenced with actual
multi-executor topology instead of ``local[N]`` thread counts.

What it does:

1. (unless ``--no-cluster``) starts a standalone master plus 8 workers
   of 4 cores each on this host (separate JVMs; shuffles/broadcasts
   cross real executor process boundaries over localhost RPC),
2. packages ``tse_spark`` into a zip and ``spark-submit
   --py-files``-launches ``scripts/cluster_bench.py`` twice against
   the same pages fixture:
   - N leg:  ``--total-executor-cores  8`` -> 2 executors x 4 cores
   - 4N leg: ``--total-executor-cores 32`` -> 8 executors x 4 cores
3. prints one JSON line with both legs, the throughput scaling
   efficiency ``docs_per_sec(4N) / (4 * docs_per_sec(N))``, and
   whether the two legs' top-k fingerprints are rank-identical.

Single-host caveat (recorded in the output): all executors share one
machine's memory bandwidth and page cache, so the 4N leg sees the same
hardware ceiling the local[8]->local[32] bench documents in
BASELINE.md; the per-leg ``stages`` breakdown and the rank-identity
fingerprint are the cluster-specific evidence this adds.

Usage::

    python scripts/run_cluster_scaling.py --docs 100000
    python scripts/run_cluster_scaling.py --no-cluster \
        --master spark://127.0.0.1:7077   # cluster already running
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = (
    os.environ.get("SPARK_HOME")
    if os.environ.get("SPARK_HOME") and os.path.exists(
        os.path.join(os.environ.get("SPARK_HOME", ""), "bin", "spark-submit")
    )
    else "/opt/spark"
)
SCRATCH = (
    "/dev/shm/tse_cluster" if os.path.isdir("/dev/shm") else "/tmp/tse_cluster"
)


def _package(zip_path: str) -> None:
    with zipfile.ZipFile(zip_path, "w") as z:
        pkg = os.path.join(REPO, "tse_spark")
        for r, _, fs in os.walk(pkg):
            for f in fs:
                if f.endswith(".py"):
                    p = os.path.join(r, f)
                    z.write(p, os.path.relpath(p, REPO))


class Cluster:
    """Standalone master + workers on this host, torn down on exit."""

    def __init__(self, n_workers: int, cores_each: int, mem_each: str):
        self.procs: list[subprocess.Popen] = []
        self.master_url = "spark://127.0.0.1:7077"
        self.n_workers = n_workers
        self.cores_each = cores_each
        self.mem_each = mem_each

    def _spawn(self, cls: str, *extra: str) -> subprocess.Popen:
        env = dict(os.environ)
        env.update(
            SPARK_HOME=SPARK_HOME,
            SPARK_LOCAL_IP="127.0.0.1",
            SPARK_NO_DAEMONIZE="1",
        )
        log = os.path.join(SCRATCH, f"{cls.rsplit('.', 1)[-1]}_{len(self.procs)}.log")
        return subprocess.Popen(
            [os.path.join(SPARK_HOME, "bin", "spark-class"), cls, *extra],
            stdout=open(log, "w"),
            stderr=subprocess.STDOUT,
            env=env,
        )

    def start(self) -> None:
        os.makedirs(SCRATCH, exist_ok=True)
        self.procs.append(
            self._spawn(
                "org.apache.spark.deploy.master.Master",
                "-h", "127.0.0.1", "-p", "7077", "--webui-port", "8091",
            )
        )
        time.sleep(5)
        for i in range(self.n_workers):
            self.procs.append(
                self._spawn(
                    "org.apache.spark.deploy.worker.Worker",
                    self.master_url,
                    "-c", str(self.cores_each), "-m", self.mem_each,
                    "-h", "127.0.0.1", "-p", str(7101 + i),
                    "--webui-port", str(8101 + i),
                    "--work-dir", os.path.join(SCRATCH, f"work{i}"),
                )
            )
        time.sleep(8)

    def stop(self) -> None:
        for p in self.procs:
            p.terminate()
        for p in self.procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()


def submit_leg(
    master: str, zip_path: str, pages: str, out_dir: str,
    total_cores: int, executor_cores: int, executor_mem: str,
    partitions: int, timeout_s: float, shuffle_partitions: int = 64,
) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    env["SPARK_HOME"] = SPARK_HOME
    env["SPARK_LOCAL_IP"] = "127.0.0.1"
    n_exec = total_cores // executor_cores
    cmd = [
        os.path.join(SPARK_HOME, "bin", "spark-submit"),
        "--master", master,
        "--deploy-mode", "client",
        "--py-files", zip_path,
        "--conf", f"spark.pyspark.python={sys.executable}",
        "--conf", f"spark.cores.max={total_cores}",
        "--conf", f"spark.executor.cores={executor_cores}",
        "--conf", f"spark.executor.memory={executor_mem}",
        "--conf", f"spark.sql.shuffle.partitions={shuffle_partitions}",
        "--conf", "spark.sql.adaptive.enabled=true",
        # AQE coalesce floor lowered as in bench_build.build_session:
        # the sandbox corpus shuffles only MBs, and the default 1 MB
        # floor collapses post-shuffle stages to ~6 partitions
        # regardless of executor count.  (The local bench's 4 MB scan
        # splits are NOT ported: on a real cluster each extra task
        # costs ~10-30 ms of RPC launch, and 500 tiny scan tasks cost
        # more than they balance — measured: docs stage 8.2 s -> 11.4 s
        # at 8 executors.)
        "--conf", "spark.sql.adaptive.coalescePartitions.minPartitionSize=64k",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.local.dir=" + (
            "/dev/shm/tse-spark-local"
            if os.path.isdir("/dev/shm") else "/tmp"
        ),
        "--conf", "spark.driver.memory=4g",
        os.path.join(REPO, "scripts", "cluster_bench.py"),
        "--pages", pages,
        "--out", out_dir,
        "--partitions", str(partitions),
        "--expect-executors", str(n_exec),
    ]
    res = subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout_s, env=env,
        cwd=REPO,
    )
    lines = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
    if res.returncode != 0 or not lines:
        return {"error": (res.stderr or res.stdout)[-2000:]}
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200000)
    ap.add_argument(
        "--length-scale", type=int, default=8,
        help="per-doc text length multiplier; 8 matches the corpus "
        "law BASELINE.md's local[2]->local[8] series measures, so "
        "cluster and local legs are comparable",
    )
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--worker-cores", type=int, default=4)
    ap.add_argument(
        "--executor-cores", type=int, default=None,
        help="cores per executor (default worker-cores); 1 gives the "
        "most executors per leg: N=2 -> 2 executors vs 4N=8 -> 8",
    )
    ap.add_argument("--executor-mem", default="6g")
    ap.add_argument("--n-cores", type=int, default=2, help="N leg cores")
    ap.add_argument("--scale", type=int, default=4, help="4N multiplier")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--shuffle-partitions", type=int, default=64)
    ap.add_argument("--reps", type=int, default=1,
                    help="repeat each leg, keep the per-leg MIN build_s")
    ap.add_argument("--no-cluster", action="store_true",
                    help="use an already-running master (--master)")
    ap.add_argument("--master", default="spark://127.0.0.1:7077")
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from tse_spark import fixtures

    os.makedirs(SCRATCH, exist_ok=True)
    zip_path = os.path.join(SCRATCH, "tse_spark.zip")
    _package(zip_path)
    pages = os.path.join(SCRATCH, f"pages_{args.docs}_x{args.length_scale}")
    fixtures.write_pages_parquet_sharded(
        pages, args.docs, n_files=64, length_scale=args.length_scale
    )

    cluster = None
    if not args.no_cluster:
        cluster = Cluster(args.workers, args.worker_cores, args.executor_mem)
        cluster.start()
    try:
        legs: dict[str, dict] = {}
        for label, cores in (
            ("N", args.n_cores),
            ("4N", args.n_cores * args.scale),
        ):
            best: dict = {}
            for _ in range(args.reps):
                out = submit_leg(
                    args.master, zip_path, pages,
                    os.path.join(SCRATCH, f"idx_{label}"),
                    cores, args.executor_cores or args.worker_cores,
                    args.executor_mem, args.partitions,
                    timeout_s=1800.0,
                    shuffle_partitions=args.shuffle_partitions,
                )
                if "error" in out:
                    best = best or out
                    continue
                if not best or out["build_s"] < best.get("build_s", 1e18):
                    best = out
            legs[label] = best
        result = {"legs": legs, "docs": args.docs,
                  "single_host_note": "all executors share one host's "
                  "memory bandwidth; see BASELINE.md hw ceiling"}
        n_leg, big = legs.get("N", {}), legs.get("4N", {})
        if "docs_per_sec" in n_leg and "docs_per_sec" in big:
            result["scaling_efficiency"] = round(
                big["docs_per_sec"]
                / (args.scale * n_leg["docs_per_sec"]), 3
            )
            result["rank_identical"] = (
                n_leg.get("topk_fingerprint") == big.get("topk_fingerprint")
            )
        print(json.dumps(result), flush=True)
        if args.out_json:
            with open(args.out_json, "w") as f:
                json.dump(result, f, indent=1)
    finally:
        if cluster is not None:
            cluster.stop()
        shutil.rmtree(os.path.join(SCRATCH, "idx_N"), ignore_errors=True)
        shutil.rmtree(os.path.join(SCRATCH, "idx_4N"), ignore_errors=True)


if __name__ == "__main__":
    main()
