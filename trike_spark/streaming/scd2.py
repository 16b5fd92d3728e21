"""Incremental SCD2 dimension maintenance — the streaming twin of the
batch build ``queries/events.py::events_scd2_intervals``.

Spark mapping: ``applyInPandasWithState`` keyed by ``user_id``; state is
the user's OPEN interval — (state_type, valid_from_us, last_event_id) —
three scalars regardless of event volume. Each micro-batch folds its
events in (ts, event_id) order: an event with a new type CLOSES the open
interval (emits it with valid_to = the new event's ts) and opens a new
one; same-type events extend silently. Emitted rows are immutable closed
intervals — append semantics, which is exactly what makes the result a
versioned-table append target (`versioned.foreach_batch_committer`): the
streaming leg continuously materializes the same dimension the batch face
derives, and the point-in-time join (`point_in_time_enrich`) consumes
either.

Ordering contract: in-order arrival (or single-batch) reproduces the
batch face's closed intervals exactly — parity-asserted in
tests/test_streaming_scd2.py. A late event older than the open interval's
start cannot rewrite already-emitted history (standard streaming SCD2
approximation; the watermark bounds acceptance). The batch face's final
open interval (valid_to NULL) lives in state, not in the emitted stream,
until a later change closes it.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SCD2_SCHEMA = (
    "user_id bigint, event_type string, valid_from timestamp, "
    "valid_to timestamp, n_events bigint"
)
_STATE_SCHEMA = "open_type string, open_from long, open_n long"


def scd2_update(
    key: tuple[Any], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    if state.exists:
        open_type, open_from, open_n = state.get
    else:
        open_type, open_from, open_n = None, 0, 0

    closed: list[tuple[str, int, int, int]] = []  # (type, from, to, n)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, etype in zip(pdf["ts"], pdf["event_type"]):
            ts_us = int(pd.Timestamp(ts).value // 1_000)
            if open_type is None:
                open_type, open_from, open_n = etype, ts_us, 1
            elif etype == open_type:
                open_n += 1
            else:
                closed.append((open_type, open_from, ts_us, open_n))
                open_type, open_from, open_n = etype, ts_us, 1
    state.update((open_type, open_from, open_n))

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "event_type": [c[0] for c in closed],
                "valid_from": [pd.to_datetime(c[1], unit="us") for c in closed],
                "valid_to": [pd.to_datetime(c[2], unit="us") for c in closed],
                "n_events": pd.array([c[3] for c in closed], dtype="int64"),
            }
        )


def scd2_stream(events: DataFrame) -> DataFrame:
    """events (a STREAM with user_id/ts/event_id/event_type —
    applyInPandasWithState has no batch mode) → closed SCD2 intervals as
    they materialize (append mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        scd2_update,
        outputStructType=SCD2_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
