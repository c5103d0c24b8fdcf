"""Structured Streaming variants of the batch event operators.

See :mod:`tse_spark.streaming.events`.
"""

from tse_spark.streaming.events import (  # noqa: F401
    hourly_window_agg_stream,
    read_events_stream,
    sessionize_stream,
)
from tse_spark.streaming.frontier import host_budget_stream  # noqa: F401
