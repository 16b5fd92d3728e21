"""Per-key token-bucket admission control (rate limiting) for streams.

The reference proxy bounds ingest with transport backpressure — one
in-flight packet per connection (``{:active, :once}`` re-armed only after
the Kinesis put returns, proxy.ex:146-152 / O1) — which works because one
Erlang process owns one connection. A distributed ingest pipeline cannot
push back on a socket it does not own, so the equivalent control point is
ADMISSION: per key, a token bucket decides which arriving records proceed
downstream and which are shed, making overload behavior explicit and
observable instead of queue-collapse-shaped.

Semantics (deterministic, replay-stable):
  * state per key = integer credit; a new key starts with ``burst``.
  * each micro-batch the bucket refills by ``refill`` tokens, capped at
    ``burst`` — refill is per-BATCH, not per-second, so a replay of the
    same batch sequence admits exactly the same rows (wall-clock refill
    would make recovery nondeterministic; production can map refill to
    trigger interval × rate).
  * within a batch, rows are admitted in ``arrival_seq`` order until
    credit runs out; every row is EMITTED with an ``admitted`` flag —
    shedding is visible to the downstream DLQ/metrics leg, never silent.

Scale: ``applyInPandasWithState`` keyed on the throttle key — state is one
integer per key, batches stream through Arrow; hot keys cost their row
count, not their history.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DEFAULT_BURST = 3
DEFAULT_REFILL = 2

THROTTLED_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("event_id", LongType()),
        StructField("arrival_seq", LongType()),
        StructField("admitted", BooleanType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("credit", LongType())])


def admit(
    key: tuple[str],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    burst: int = DEFAULT_BURST,
    refill: int = DEFAULT_REFILL,
) -> Iterator[pd.DataFrame]:
    """Per-key stateful admission: first ``credit`` rows (by arrival_seq)
    pass, the rest are flagged; credit carries across micro-batches."""
    k = key[0]
    if state.exists:
        (credit,) = state.get
        credit = min(burst, credit + refill)
    else:
        credit = burst
    rows: dict[str, list[Any]] = {
        "key": [],
        "event_id": [],
        "arrival_seq": [],
        "admitted": [],
    }
    for pdf in pdfs:
        pdf = pdf.sort_values("arrival_seq")
        for eid, seq in zip(pdf["event_id"], pdf["arrival_seq"]):
            ok = credit > 0
            if ok:
                credit -= 1
            rows["key"].append(k)
            rows["event_id"].append(int(eid))
            rows["arrival_seq"].append(int(seq))
            rows["admitted"].append(ok)
    state.update((credit,))
    if rows["key"]:
        yield pd.DataFrame(rows)


def throttled_stream(
    events: DataFrame,
    burst: int = DEFAULT_BURST,
    refill: int = DEFAULT_REFILL,
) -> DataFrame:
    """events (key, event_id, arrival_seq; batch or stream) → every row
    with its admission verdict (THROTTLED_SCHEMA)."""

    def fn(key, pdfs, state):
        yield from admit(key, pdfs, state, burst, refill)

    return events.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=THROTTLED_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
