"""Sink failure contract: a failed put raises out of foreachBatch so Spark
retries the micro-batch (at-least-once) — the analog of the reference
crashing the connection on a sink error (proxy.ex:203) and letting
upstream resend."""

from __future__ import annotations

from datetime import datetime

import pytest

from trike_spark.streaming.framing import FRAMED_SCHEMA
from trike_spark.streaming.pipeline import messages_to_cloud_events
from trike_spark.streaming.sinks import FakeKinesisClient, KinesisSink

T = datetime(2021, 8, 13, 12, 0, 0)


class FlakyClient(FakeKinesisClient):
    def __init__(self, fail_first: int):
        super().__init__()
        self.fail_remaining = fail_first

    def put_record(self, *a, **kw):
        if self.fail_remaining > 0:
            self.fail_remaining -= 1
            raise RuntimeError("kinesis unavailable")
        return super().put_record(*a, **kw)


def test_sink_error_propagates_and_retry_keeps_order(spark):
    client = FlakyClient(fail_first=1)
    sink = KinesisSink(stream="s", client=client)
    events = messages_to_cloud_events(
        spark.createDataFrame([("conn-1", "m1", T, "message", 0)], FRAMED_SCHEMA)
    )
    with pytest.raises(RuntimeError):
        sink(events, 0)
    # no sequence recorded for the failed put → the retry starts unchained,
    # exactly like a restarted reference connection
    assert sink._last_seq == {}
    sink(events, 0)  # Spark's micro-batch retry
    assert len(client.calls) == 1
    assert client.calls[0]["sequence_number_for_ordering"] is None
    # and the chain continues on the next batch
    sink(events, 1)
    assert client.calls[1]["sequence_number_for_ordering"] == "0"
