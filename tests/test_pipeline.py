"""End-to-end ingest pipeline + ordered sink semantics (reference
test/proxy_test.exs:113-145: sequence chaining, heartbeat behavior)."""

from __future__ import annotations

from datetime import datetime

from trike_spark.functions.cloud_event import HEARTBEAT
from trike_spark.streaming.framing import FRAMED_SCHEMA
from trike_spark.streaming.pipeline import messages_to_cloud_events
from trike_spark.streaming.sinks import FakeKinesisClient, KinesisSink

T = datetime(2021, 8, 13, 12, 0, 0)
MSG1 = "4994,TSCH,02:00:06,R,RLD,W"
MSG2 = "4995,TSCH,03:00:06,R,RLD,W"


def _framed(spark, rows):
    return spark.createDataFrame(rows, FRAMED_SCHEMA)


def test_heartbeats_filtered_but_not_forwarded(spark):
    # proxy_test.exs:136-145 — heartbeat never reaches the sink
    framed = _framed(
        spark,
        [
            ("conn-1", MSG1, T, "message", 0),
            ("conn-1", HEARTBEAT, T, "message", 1),
            ("conn-1", None, None, "session_closed", None),
        ],
    )
    out = messages_to_cloud_events(framed).collect()
    assert len(out) == 1
    assert out[0]["event"]["data"]["raw"] == MSG1
    assert out[0]["partitionkey"] == "conn-1"


def test_sink_sequence_chaining(spark):
    """First put has no ordering opt; second carries the sequence number
    returned by the first (proxy_test.exs:113-126)."""
    client = FakeKinesisClient()
    sink = KinesisSink(stream="test-stream", client=client)
    framed1 = _framed(spark, [("conn-1", MSG1, T, "message", 0)])
    framed2 = _framed(spark, [("conn-1", MSG2, T, "message", 1)])
    sink(messages_to_cloud_events(framed1), 0)
    sink(messages_to_cloud_events(framed2), 1)
    assert len(client.calls) == 2
    assert client.calls[0]["sequence_number_for_ordering"] is None
    assert client.calls[1]["sequence_number_for_ordering"] == "0"
    assert client.calls[0]["partition_key"] == "conn-1"
    # record is a JSON array (F4 batching)
    assert client.calls[0]["data"].startswith("[{")


def test_sink_preserves_arrival_order_not_content_order(spark):
    """K1 regression (ADVICE r1): a batch whose arrival order is
    lexicographically DESCENDING must still encode in arrival order — the
    sink sorts on the framing seq, never on event content."""
    client = FakeKinesisClient()
    sink = KinesisSink(stream="test-stream", client=client)
    late_alpha = "0001,AAAA,first-alphabetically-but-arrived-last"
    framed = _framed(
        spark,
        [
            ("conn-1", MSG2, T, "message", 0),  # content sorts AFTER late_alpha
            ("conn-1", late_alpha, T, "message", 1),
        ],
    )
    sink(messages_to_cloud_events(framed), 0)
    record = client.calls[0]["data"]
    assert record.index(MSG2.split(",")[0]) < record.index("0001,AAAA")


def test_sink_batches_per_key(spark):
    """All events of one key in one micro-batch → ONE record; keys are
    independent records (proxy.ex:164-175)."""
    client = FakeKinesisClient()
    sink = KinesisSink(stream="test-stream", client=client)
    framed = _framed(
        spark,
        [
            ("conn-1", MSG1, T, "message", 0),
            ("conn-1", MSG2, T, "message", 1),
            ("conn-2", MSG1, T, "message", 0),
        ],
    )
    sink(messages_to_cloud_events(framed), 0)
    by_key = {c["partition_key"]: c["data"] for c in client.calls}
    assert set(by_key) == {"conn-1", "conn-2"}
    assert by_key["conn-1"].count('"raw"') == 2
    assert by_key["conn-2"].count('"raw"') == 1
