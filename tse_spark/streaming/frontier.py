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

import pandas as pd
from pyspark.sql import DataFrame


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
            pdf["ts"].astype("int64") // 1_000_000_000 // 3600
        ).tolist()
        out_rows = []
        for (_, r), h in zip(pdf.iterrows(), hours):
            if h > hour0:
                hour0, used0 = int(h), 0
            admitted = h == hour0 and used0 < per_hour
            if admitted:
                used0 += 1
            out_rows.append((host, r["url"], r["ts"], admitted))
        state.update((hour0, used0))
        yield pd.DataFrame(
            out_rows, columns=["host", "url", "ts", "admitted"]
        )

    return urls.groupBy("host").applyInPandasWithState(
        fn,
        outputStructType="host string, url string, ts timestamp, "
        "admitted boolean",
        stateStructType="hour long, used long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
