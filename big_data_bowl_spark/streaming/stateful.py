"""Custom stateful streaming operator: per-key sessionization via
``applyInPandasWithState``.

Spark's built-in streaming ``session_window`` covers the common case;
this operator is the EXTENSIBILITY surface for session logic the
built-in can't express (per-key dynamic gaps, session-scoped
aggregates, early emission rules). Semantics exactly mirror the batch
t03 query (queries/temporal.py): a new session starts when the gap
since the previous event is >= `gap`; session_end = last_ts + gap
(exclusive).

State design for an unbounded stream:
- State per key is ONE open session tuple (start, last, n, sum) —
  O(1) per key regardless of history length.
- Closed sessions emit as soon as the closing event arrives (append
  mode); the open session emits on processing-time timeout, so state
  for idle keys is evicted instead of accumulating forever.
- Shuffle is on the group key only; event payloads stream through
  Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)

US_PER_MIN = 60_000_000


def sessionize(
    events: DataFrame,
    gap_minutes: int = 10,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Stateful sessionization of a (streaming) events DataFrame with
    columns (user_id, ts). Emits closed sessions as their closing
    event arrives; each key's open session stays in state.

    ``timeout_ms`` enables processing-time timeouts that flush and
    evict idle keys' open sessions — use it on LIVE streams. Leave it
    None for bounded availableNow backfills: with timeouts armed, the
    microbatch loop keeps scheduling state-cleanup batches and an
    availableNow drain never terminates (observed on Spark 4.1)."""
    gap_us = gap_minutes * US_PER_MIN
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (user_id,) = key
        closed: list[tuple[int, int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                closed.append((user_id, start, last + gap_us, n))
                state.remove()
            # consume the (empty) iterator per the API contract
            for _ in pdfs:
                pass
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(
                    int(v) // 1000
                    for v in pdf["ts"].astype("int64").tolist()
                )
            ts_us.sort()
            if state.exists:
                start, last, n = state.get
            else:
                start = last = -1
                n = 0
            for t_us in ts_us:
                if n == 0:
                    start = last = t_us
                    n = 1
                elif t_us - last >= gap_us:  # >= : t03's boundary rule
                    closed.append((user_id, start, last + gap_us, n))
                    start = last = t_us
                    n = 1
                else:
                    last = t_us
                    n += 1
            if n > 0:
                state.update((start, last, n))
                if timeout_ms is not None:
                    state.setTimeoutDuration(timeout_ms)

        # yield only when sessions closed: an empty frame has object
        # dtypes that pandas' serializer-side concat warns about (and
        # does useless work on) — zero yields is the supported "no
        # output for this group" shape
        if closed:
            yield pd.DataFrame(
                [
                    {
                        "user_id": u,
                        "session_start": pd.Timestamp(s, unit="us"),
                        "session_end": pd.Timestamp(e, unit="us"),
                        "n_events": k,
                    }
                    for u, s, e, k in closed
                ],
                columns=[
                    "user_id", "session_start", "session_end", "n_events",
                ],
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
