"""Interpreter-startup THP opt-out for every Python process in the job.

Why this file exists: pyarrow's bundled jemalloc madvise(MADV_HUGEPAGE)s
its arenas, and on kernels with ``transparent_hugepage/defrag=madvise``
(this sandbox) page faults on those regions enter direct memory
compaction.  Many concurrent pyspark workers then serialize on the
compaction locks — measured here as a 16x collapse of the posting-encode
stage (2.5 s tasks turning into 58 s tasks, bimodally, depending on
which workers were protected).

Calling ``prctl(PR_SET_THP_DISABLE)`` from ``tse_spark/__init__`` covers
only workers that import the package; UDFs that cloudpickle serializes
BY VALUE run in workers that never do.  A ``sitecustomize`` on
PYTHONPATH runs at interpreter startup in the pyspark *daemon*, before
jemalloc exists, and the flag is inherited across fork by every worker
— no per-UDF cooperation needed.  ``tse_spark.session`` and
``tse_spark.bench_build`` prepend this directory to PYTHONPATH before
the JVM (hence the daemon) starts.

On a real cluster, ship it via ``spark-submit --py-files`` /
``spark.executorEnv.PYTHONPATH``, or simply configure THP sanely on the
fleet and set ``TSE_SPARK_KEEP_THP=1``.
"""

import os

if os.environ.get("TSE_SPARK_KEEP_THP") != "1":
    try:
        import ctypes

        _libc = ctypes.CDLL("libc.so.6", use_errno=True)
        _libc.prctl(41, 1, 0, 0, 0)  # PR_SET_THP_DISABLE
    except Exception:
        pass
