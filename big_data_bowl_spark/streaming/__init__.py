"""Structured Streaming extensions (SURVEY.md §2.11).

The reference has no streaming; the driver's `events` table
(event-time `ts`) motivates these north-star operators. Batch
equivalents (t01-t05) carry the DuckDB oracles; these streaming
variants reuse the same column logic so batch == stream by
construction, verified in tests/test_streaming.py.
"""

from .stateful import sessionize  # noqa: F401
from .windows import (  # noqa: F401
    read_events_stream,
    streaming_dedup,
    tumbling_counts,
)
