"""EOT framing + stale-session timeout on the Spark 4 ``transformWithState``
API — the modern twin of ``framing.framed_stream``.

Same semantics as the ``applyInPandasWithState`` operator
(streaming/framing.py, reference lib/trike/proxy.ex:212-217 extract/2,
:230-240 stale timer): per-connection byte buffer carried across
micro-batches, frames split on EOT, one shared timestamp per packet, a
monotonic per-connection ``seq``, and a processing-time stale timer that
re-arms on ANY inbound traffic and emits a ``session_closed`` control row
on expiry.

Why a twin exists: ``transformWithStateInPandas`` (Spark 4.0+) is the
successor API — typed state cells (ValueState) instead of one packed
tuple, first-class timers (register/delete/list) instead of the single
implicit GroupStateTimeout, initial-state bootstrap, and state TTL. New
pipelines should start here; the applyInPandasWithState operator remains
the compatibility path (its checkpoints are NOT interchangeable with this
operator's — different state encoding; pick one per checkpointLocation).

Scale posture is identical: state partitions by conn_id, per-key state is
one small buffer row, timers are per-key entries in the state store.

Runtime dependency note: the transformWithState Python worker talks to the
JVM state store over protobuf, so executing this operator requires
``google.protobuf`` (bundled with standard PySpark distributions;
ABSENT in this test container, so the e2e tests are gated on its
availability and the processor's framing logic is unit-tested against the
applyInPandasWithState implementation through a fake handle instead —
tests/test_framing_tws.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from trike_spark.streaming.framing import (
    DEFAULT_STALE_TIMEOUT_MS,
    FRAMED_SCHEMA,
    frame_batch,
    sorted_key_batch,
)

_BUF_SCHEMA = "buffer STRING, nseq BIGINT"


def _closed_row(conn_id: str) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conn_id": [conn_id],
            "raw": [None],
            "time": [None],
            "kind": ["session_closed"],
            "seq": [None],
        }
    )


class FramingProcessor(StatefulProcessor):
    """Per-connection framing with typed state + explicit timers."""

    def __init__(self, stale_timeout_ms: int | None = DEFAULT_STALE_TIMEOUT_MS) -> None:
        self.stale_timeout_ms = stale_timeout_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.buf = handle.getValueState("framebuf", _BUF_SCHEMA)

    def _rearm(self, timer_values: TimerValues) -> None:
        """ANY traffic re-arms the stale timer (framing runs BEFORE the
        heartbeat filter — proxy.ex:104 vs :242-244): drop every pending
        timer, register one at now + timeout."""
        if self.stale_timeout_ms is None:
            return
        for t in list(self.handle.listTimers()):
            self.handle.deleteTimer(t)
        now = timer_values.getCurrentProcessingTimeInMs()
        self.handle.registerTimer(now + self.stale_timeout_ms)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        conn_id = key[0]
        got = self.buf.get()
        buffer, nseq = got if got is not None else ("", 0)
        # concat-then-sort + duplicate-arrival_seq fail-loud, then the
        # vectorized kernel — both SHARED with framing.frame_and_session
        # so the twins cannot drift
        batch = sorted_key_batch(conn_id, rows)
        out, buffer, nseq = frame_batch(conn_id, batch, buffer, nseq)
        self.buf.update((buffer, nseq))
        self._rearm(timerValues)
        if out is not None:
            yield out

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        self.buf.clear()
        for t in list(self.handle.listTimers()):
            self.handle.deleteTimer(t)
        yield _closed_row(key[0])

    def close(self) -> None:
        pass


def framed_stream_tws(
    chunks: DataFrame, stale_timeout_ms: int | None = DEFAULT_STALE_TIMEOUT_MS
) -> DataFrame:
    """chunks (CHUNK_SCHEMA stream) → framed messages + control rows
    (FRAMED_SCHEMA) via ``transformWithStateInPandas``.

    ``stale_timeout_ms=None`` uses timeMode="none" — the bounded
    replay/backfill configuration (no pending timers, so
    ``Trigger.AvailableNow`` terminates)."""
    return chunks.groupBy("conn_id").transformWithStateInPandas(
        statefulProcessor=FramingProcessor(stale_timeout_ms),
        outputStructType=FRAMED_SCHEMA,
        outputMode="append",
        timeMode="none" if stale_timeout_ms is None else "processingTime",
    )
