"""Stateful streaming conversion funnel — the streaming twin of the batch
face ``queries/events.py::events_funnel_conversion``.

Spark mapping: ``applyInPandasWithState`` keyed by ``user_id``; state is the
funnel frontier — three event-time micros (signup, first later click, first
later purchase), 0 = not reached. Each micro-batch folds its (sorted)
events into the frontier and emits the user's current funnel row, so the
sink always holds the latest depth per user (``update`` semantics).

Ordering contract: within a micro-batch events are folded in event-time
order, so a single batch (or in-order arrival across batches) reproduces
the batch face exactly — asserted in tests/test_streaming_lakehouse_twins.py.
Across micro-batches a LATE stage-1 event (signup arriving after clicks
already streamed past) cannot resurrect the clicks it would have unlocked;
that is the standard streaming-funnel approximation, and the watermark the
caller attaches bounds how long such late data is accepted at all. State
per user is three longs regardless of event volume — the same
state-is-frontier property the batch plan gets from its window chaining.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_SCHEMA = (
    "user_id bigint, signup_ts timestamp, click_ts timestamp, "
    "purchase_ts timestamp, level int"
)
_STATE_SCHEMA = "t1 long, t2 long, t3 long"

_STAGES = ("signup", "click", "purchase")


def _fold(t1: int, t2: int, t3: int, ts_us: int, etype: str) -> tuple[int, int, int]:
    """Advance the funnel frontier by one event (event-time order)."""
    if etype == "signup" and t1 == 0:
        t1 = ts_us
    elif etype == "click" and t1 != 0 and t2 == 0 and ts_us > t1:
        t2 = ts_us
    elif etype == "purchase" and t2 != 0 and t3 == 0 and ts_us > t2:
        t3 = ts_us
    return t1, t2, t3


def funnel_update(
    key: tuple[Any], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    t1, t2, t3 = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for ts, etype in zip(pdf["ts"], pdf["event_type"]):
            t1, t2, t3 = _fold(t1, t2, t3, int(pd.Timestamp(ts).value // 1_000), etype)
    state.update((t1, t2, t3))

    def _ts(us: int):
        return pd.to_datetime(us, unit="us") if us else pd.NaT

    level = 3 if t3 else 2 if t2 else 1 if t1 else 0
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "signup_ts": [_ts(t1)],
            "click_ts": [_ts(t2)],
            "purchase_ts": [_ts(t3)],
            "level": pd.array([level], dtype="int32"),
        }
    )


def funnel_stream(events: DataFrame) -> DataFrame:
    """events (batch or stream with user_id/ts/event_type) → one funnel row
    per user per micro-batch (current frontier)."""
    return events.groupBy("user_id").applyInPandasWithState(
        funnel_update,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
