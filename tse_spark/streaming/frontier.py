"""Custom stateful streaming operator: per-host crawl politeness budget.

The reference crawler throttles per-site fetches (tse/Tse.h:27-29 — a
4-per-site limit, present but disabled, over a mutex-guarded frontier).
At web scale the frontier is an unbounded stream and the throttle is a
KEYED STATEFUL operator: admit at most ``per_hour`` urls per host per
event-hour, carrying the (hour, used) counter across micro-batches.

This is not expressible with native streaming aggregations (the output
is a per-ROW admit/reject decision that depends on a running per-key
counter), so it uses ``applyInPandasWithState`` — Spark's escape hatch
for custom stateful logic, with Arrow-batched pandas on the hot path.

State is strictly bounded: ONE (hour, used) pair per host, independent
of stream length.  Hours advance monotonically per host; a late url
from an hour older than the host's current hour is rejected (a frontier
crawl only moves forward), which is also what keeps the state a single
pair instead of an unbounded per-hour map.

Determinism: within a micro-batch, urls are processed in (ts, url)
order.  Cross-batch arrival order is a property of the source; the
conformance test runs ``trigger(availableNow=True)`` (single ordered
pass) and checks the decision stream against a batch window-function
oracle on the same input.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def admit_batch(
    hours: np.ndarray, hour0: int, used0: int, per_hour: int
) -> tuple[np.ndarray, int, int]:
    """Vectorized admit decisions for ONE host's micro-batch.

    ``hours`` must be nondecreasing (rows sorted by ts).  Semantics of
    the sequential counter, in closed form (this is the frontier hot
    path — the loop form was the round-2 perf nit; the conformance
    test pins both against each other and the batch-window oracle):

    - rows from an hour older than the host's current hour are
      rejected (the crawl only moves forward);
    - within each hour-run, position-in-run + carry-in (``used0`` when
      the run IS the state's current hour) must stay below
      ``per_hour``.

    Returns (admitted bool array, new_hour, new_used).
    """
    n = int(hours.shape[0])
    if n == 0:
        return np.zeros(0, dtype=bool), hour0, used0
    # first index of each equal-hour run (hours nondecreasing -> each
    # distinct hour is one contiguous run)
    new_run = np.concatenate(([True], hours[1:] != hours[:-1]))
    starts = np.flatnonzero(new_run)
    run_id = np.cumsum(new_run) - 1
    pos_in_run = np.arange(n, dtype=np.int64) - starts[run_id]
    carry = np.where(hours == hour0, int(used0), 0)
    admitted = (hours >= hour0) & (pos_in_run + carry < per_hour)
    last = int(hours[-1])
    if last >= hour0:
        in_last = slice(int(starts[-1]), n)
        new_used = int(admitted[in_last].sum()) + (
            int(used0) if last == hour0 else 0
        )
        return admitted, last, new_used
    return admitted, hour0, used0


def host_budget_stream(urls: DataFrame, per_hour: int = 4) -> DataFrame:
    """(host, url, ts, admitted) — admit the first ``per_hour`` urls per
    host per event-hour; reject the rest and anything from a past hour.

    Input: a streaming DataFrame with columns (host string, url string,
    ts timestamp).  Output mode: append (decisions are final).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdf_iter, state: GroupState):
        (host,) = key
        hour0, used0 = state.get if state.exists else (-1, 0)
        # a group larger than one Arrow batch arrives as several chunks
        # in arbitrary relative order: the (ts, url) processing order
        # must hold across the WHOLE group, so materialize and sort once
        # (bounded by one host's rows in one micro-batch — politeness
        # keys are hosts, not the whole frontier)
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        pdf = pdf.sort_values(["ts", "url"])
        hours = (
            pdf["ts"].astype("int64").to_numpy() // 1_000_000_000 // 3600
        )
        admitted, hour1, used1 = admit_batch(
            hours, int(hour0), int(used0), per_hour
        )
        state.update((int(hour1), int(used1)))
        yield pd.DataFrame(
            {
                "host": host,
                "url": pdf["url"].to_numpy(),
                "ts": pdf["ts"].to_numpy(),
                "admitted": admitted,
            }
        )

    return urls.groupBy("host").applyInPandasWithState(
        fn,
        outputStructType="host string, url string, ts timestamp, "
        "admitted boolean",
        stateStructType="hour long, used long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
