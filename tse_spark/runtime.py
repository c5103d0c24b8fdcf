"""Process-local runtime tuning applied in every Python process that
imports tse_spark — driver AND Spark python workers (a worker imports
the package when it unpickles any of our UDFs).
"""

from __future__ import annotations

import os

_PR_SET_THP_DISABLE = 41
_thp_disabled = False


def disable_thp() -> bool:
    """Opt this process (and its forks) out of transparent huge pages
    via ``prctl(PR_SET_THP_DISABLE)``.

    Why: pyarrow's bundled jemalloc ``madvise(MADV_HUGEPAGE)``s its
    arenas.  On kernels configured ``transparent_hugepage/defrag =
    madvise`` (this sandbox), page faults on those regions enter DIRECT
    memory compaction, and many concurrent Python workers serialize on
    the compaction locks.  Measured here on the posting-encode stage at
    16 worker processes: wall 69 s with THP vs 2.2 s without — a 15-30x
    collapse that looks exactly like "the job stops scaling past ~4
    cores" (it is the machine, not the dataflow: the same work scales
    near-linearly once THP faults are off).

    Per-process and inherited across fork, so calling it at import time
    covers every pyspark worker that runs our UDFs.  No-op (returns
    False) where prctl/THP is unavailable; set ``TSE_SPARK_KEEP_THP=1``
    to skip, e.g. on clusters where THP is known healthy and the few
    percent of TLB win matters.
    """
    global _thp_disabled
    if _thp_disabled or os.environ.get("TSE_SPARK_KEEP_THP") == "1":
        return _thp_disabled
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        if libc.prctl(_PR_SET_THP_DISABLE, 1, 0, 0, 0) == 0:
            _thp_disabled = True
    except Exception:
        pass
    return _thp_disabled
