"""Gap-based sessionization on Spark 4's ``transformWithStateInPandas``
— the new arbitrary-stateful-processing API (SPARK-49564) that
replaces ``applyInPandasWithState``'s single-tuple GroupState with a
typed state store (value/list/map states + explicit timers).

Semantics are IDENTICAL to ``streaming/stateful.py`` (the
applyInPandasWithState twin, including its late-event clamp):
per-user 10-minute-gap sessions, closed sessions emitted as soon as
a newer event proves them closed, the open tail carried in a
ValueState, and an event-time timer flushing idle users. The
equality of the two APIs' outputs on the same input is pinned in
``tests/test_events_streaming.py`` — so the repo documents, with a
test, that migrating its stateful operators to the new API is a
mechanical swap.

Scale posture is unchanged: state is one small row per user in the
state store, hash-partitioned; per-batch work is Arrow-batched
pandas over that batch's users only.

SANDBOX BLOCKER (same class as delta-spark, documented in README's
capability matrix): the transformWithState protocol speaks protobuf
between the JVM state server and the Python driver worker, and
``google.protobuf`` is not installed in this environment (no
network). ``tws_available()`` gates the test; the processor code is
complete and the equality test runs wherever protobuf exists.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from global_superstore_data_warehouse_spark.streaming.stateful import (
    OUTPUT_SCHEMA,
    SESSION_GAP_SECONDS,
    STATE_SCHEMA,
    _split_sessions,
)


def tws_available() -> bool:
    """True when the protobuf dependency of the transformWithState
    Python protocol is importable."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


class SessionProcessor(StatefulProcessor):
    """Open-session accumulator in a ValueState + an event-time timer
    per user (re-registered on every batch; fires once the watermark
    passes last + gap)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._open = handle.getValueState("open_session", STATE_SCHEMA)

    def _emit(self, user_id: Any, runs: list) -> pd.DataFrame:
        return pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "session_start": s,
                    "session_end": e,
                    "n_events": n,
                    "sum_value": t,
                }
                for s, e, n, t in runs
            ]
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        batch = pd.concat(list(rows), ignore_index=True).sort_values(
            ["sec", "event_id"]
        )
        secs = batch["sec"].tolist()
        vals = batch["value"].tolist()
        if self._open.exists():
            start, last, n, total = self._open.get()
            # same late-event clamp as the applyInPandasWithState twin
            secs = [max(s, last) for s in secs]
            runs = _split_sessions([last] + secs, [0.0] + vals)
            s0, e0, n0, t0 = runs[0]
            runs[0] = (start, e0, n0 - 1 + n, t0 + total)
        else:
            runs = _split_sessions(secs, vals)
        *closed, open_run = runs
        self._open.update(tuple(open_run))
        # Re-registering every batch would LEAK the previous batches'
        # timers (registerTimer adds, it does not replace the way
        # GroupState.setTimeoutTimestamp does) — and a stale timer
        # firing after later events extended the session would flush
        # the still-open tail early, splitting sessions the
        # applyInPandasWithState twin keeps whole. Delete the old
        # timers before arming the new one; handleExpiredTimer also
        # re-checks expiry against state so a racing stale timer is a
        # no-op rather than an early flush.
        for ts in list(self._handle.listTimers()):
            self._handle.deleteTimer(ts)
        self._handle.registerTimer(
            timerValues.getCurrentWatermarkInMs()
            + (SESSION_GAP_SECONDS + 1) * 1000
        )
        if closed:
            yield self._emit(user_id, closed)

    def handleExpiredTimer(
        self, key: Any, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self._open.exists():
            run = tuple(self._open.get())
            # Guard against stale timers: only flush when the session
            # has ACTUALLY gone idle — watermark past last + gap. A
            # timer armed before later events extended the session
            # must not emit the open tail early.
            last = run[1]
            if (
                timerValues.getCurrentWatermarkInMs()
                < (last + SESSION_GAP_SECONDS) * 1000
            ):
                # The runtime CONSUMES the fired timer, so rejecting a
                # stale fire without re-arming would leave the open
                # session timer-less forever — an idle user's tail
                # would never flush (silent loss). Re-register at the
                # true idle point (last + gap, +1s slack); dedupe
                # against any still-pending timer so repeated stale
                # fires cannot accumulate.
                rearm = (last + SESSION_GAP_SECONDS) * 1000 + 1000
                if rearm not in set(self._handle.listTimers()):
                    self._handle.registerTimer(rearm)
                return
            self._open.clear()
            yield self._emit(user_id, [run])

    def close(self) -> None:
        pass


def sessionize_stream_tws(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """events must carry (user_id, event_id, ts timestamp, value) —
    same contract as ``stateful.sessionize_stream``."""
    from pyspark.sql import functions as F

    prepared = events.withWatermark("ts", watermark).select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("sec"),
        "value",
        "ts",
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )
