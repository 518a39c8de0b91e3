"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (beyond-reference — the Spark-native
answer to operators the built-in window functions can't express
incrementally).

Semantics match the batch twin ``plans/events.events_sessionize``
(10-minute inactivity gap): per user, events sorted by (sec,
event_id) split into sessions wherever the gap exceeds
SESSION_GAP_SECONDS. Each micro-batch:

- merges the user's open session (carried in GroupState) with the
  batch's events,
- EMITS every session that is now provably closed (a newer event
  exists past its gap),
- keeps the still-open tail session in state, with an event-time
  timeout so idle users eventually flush.

Scale design: state is keyed by user_id — one small tuple per user,
hash-partitioned across executors; per-batch work is Arrow-batched
pandas over only that batch's users. The watermark bounds both late
data and state lifetime.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 600

OUTPUT_SCHEMA = (
    "user_id long, session_start long, session_end long, "
    "n_events long, sum_value double"
)
# open-session accumulator carried between batches
STATE_SCHEMA = "start long, last long, n long, total double"


def _split_sessions(secs: list[int], vals: list[float]) -> list[tuple[int, int, int, float]]:
    """Fold sorted (sec, value) pairs into [start, end, n, total] runs."""
    out: list[tuple[int, int, int, float]] = []
    start = last = secs[0]
    n, total = 0, 0.0
    for s, v in zip(secs, vals):
        if s - last > SESSION_GAP_SECONDS:
            out.append((start, last, n, total))
            start, n, total = s, 0, 0.0
        last = s
        n += 1
        total += v
    out.append((start, last, n, total))
    return out


def sessionize_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # idle user: flush the open session and clear
        start, last, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            [{"user_id": user_id, "session_start": start, "session_end": last,
              "n_events": n, "sum_value": total}]
        )
        return

    batch = pd.concat(list(pdfs), ignore_index=True).sort_values(["sec", "event_id"])
    secs = batch["sec"].tolist()
    vals = batch["value"].tolist()
    if state.exists:
        start, last, n, total = state.get
        # late-event clamp: an in-watermark event BELOW the state
        # cursor would otherwise move `last` backward through the
        # fold and a later in-order event could then read as a >gap
        # jump, splitting the open session. Clamping to the cursor
        # absorbs late events into the open session (their values
        # count; the session span never reopens backward) — the
        # standard accumulator trade: exact batch parity holds for
        # event-time-ordered input, late data degrades gracefully
        # instead of corrupting session boundaries.
        secs = [max(s, last) for s in secs]
        # prepend the open session as a zero-valued pseudo-event at its
        # last timestamp, then fold; re-attach the accumulator to the
        # first run (subtracting the pseudo-event's count)
        runs = _split_sessions([last] + secs, [0.0] + vals)
        s0, e0, n0, t0 = runs[0]
        runs[0] = (start, e0, n0 - 1 + n, t0 + total)
    else:
        runs = _split_sessions(secs, vals)

    *closed, open_run = runs
    state.update(tuple(open_run))
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + (SESSION_GAP_SECONDS + 1) * 1000)
    if closed:
        yield pd.DataFrame(
            [
                {"user_id": user_id, "session_start": s, "session_end": e,
                 "n_events": n, "sum_value": t}
                for s, e, n, t in closed
            ]
        )


def sessionize_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """events must carry (user_id, event_id, ts timestamp, value)."""
    from pyspark.sql import functions as F

    prepared = events.withWatermark("ts", watermark).select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("sec"),
        "value",
        "ts",
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        sessionize_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
