"""Streaming surface (SURVEY.md §2.10 [EXT]).

The reference's "incrementality" is micro-batch-by-rerun (bookmark +
job.commit ≈ ``Trigger.AvailableNow`` + checkpoint).  This package
provides both:

- batch-mode window aggregations (``F.window`` / ``F.session_window``
  over a static frame) — oracle-checkable, same expressions a real
  stream would run;
- true Structured Streaming pipelines (file source → watermark →
  windowed agg → sink) for continuous operation.
"""

from .windows import (
    session_window_agg,
    sessionize,
    sliding_window_agg,
    tumbling_window_agg,
)
from .stream import incremental_file_stream, stream_tumbling_counts
from .stateful import running_user_totals

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "sessionize",
    "incremental_file_stream",
    "stream_tumbling_counts",
    "running_user_totals",
]
