"""Sink ↔ source round-trip: records produced by the ordered Kinesis sink
parse back into exactly the original messages (entry point A composed with
entry point C, SURVEY.md §3)."""

from __future__ import annotations

from datetime import datetime

from trike_spark.streaming.framing import FRAMED_SCHEMA
from trike_spark.streaming.pipeline import messages_to_cloud_events
from trike_spark.streaming.sinks import FakeKinesisClient, KinesisSink
from trike_spark.streaming.sources import parse_kinesis_records, replay_scaled

T = datetime(2021, 8, 13, 12, 0, 0)
MSGS = ["4994,TSCH,02:00:06,R,RLD,W", "4995,TSCH,03:00:06,R,RLD,W"]


def test_sink_records_parse_back(spark):
    client = FakeKinesisClient()
    sink = KinesisSink(stream="s", client=client)
    framed = spark.createDataFrame(
        [("conn-1", m, T, "message", i) for i, m in enumerate(MSGS)] + [("conn-2", MSGS[0], T, "message", 0)],
        FRAMED_SCHEMA,
    )
    sink(messages_to_cloud_events(framed), 0)

    records = spark.createDataFrame(
        [(c["partition_key"], c["data"]) for c in client.calls],
        ["partition_key", "record"],
    )
    parsed = parse_kinesis_records(records)
    got = sorted((r["conn_id"], r["raw"]) for r in parsed.collect())
    assert got == [("conn-1", MSGS[0]), ("conn-1", MSGS[1]), ("conn-2", MSGS[0])]
    # ids survive the trip (deterministic sha1 — dedup keys for replays)
    assert all(r["id"] for r in parsed.collect())
    # ×3 replay scale duplicates payloads (kinesis_source.ex:129-147)
    assert replay_scaled(parsed, raw_col="raw", scale=3).count() == 9
