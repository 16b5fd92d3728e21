"""Mocked Kinesis round-trip (VERDICT r1 #7): sink put → shard iterate →
parse_kinesis_records → replay_scaled, proving the production leg's ordered
at-least-once delivery semantics against a service with real sequencing —
not just the logging fake (reference kinesis_source.ex:123-169 consume leg
+ proxy.ex:177-204 ordered produce leg)."""

from __future__ import annotations

from datetime import datetime

import pytest

from trike_spark.streaming.framing import FRAMED_SCHEMA
from trike_spark.streaming.kinesis_stub import StubKinesisService, read_shard_records
from trike_spark.streaming.pipeline import messages_to_cloud_events
from trike_spark.streaming.sinks import KinesisSink
from trike_spark.streaming.sources import parse_kinesis_records, replay_scaled

T = datetime(2021, 8, 13, 12, 0, 0)
MSGS = [
    "4994,TSCH,02:00:06,R,RLD,W",
    "4995,TSCH,03:00:06,R,RLD,W",
    "4996,TSCH,04:00:06,B,RLD,E",
]


def _framed(spark, rows):
    return spark.createDataFrame(rows, FRAMED_SCHEMA)


def _drain_all(service, stream="s"):
    records = []
    for shard in service.list_shards(stream):
        recs, _ = read_shard_records(service, stream, shard)
        records += recs
    return sorted(records, key=lambda r: r["SequenceNumber"])


def test_put_shard_iterate_parse_replay_roundtrip(spark):
    """Two micro-batches, two connections → every record lands on a shard
    with an intact ordering chain; shard iteration + parse returns the
    original messages in arrival order; replay_scaled multiplies them."""
    service = StubKinesisService(n_shards=2)
    sink = KinesisSink(stream="s", client=service)

    sink(
        messages_to_cloud_events(
            _framed(
                spark,
                [
                    ("conn-1", MSGS[0], T, "message", 0),
                    ("conn-1", MSGS[1], T, "message", 1),
                    ("conn-2", MSGS[2], T, "message", 0),
                ],
            )
        ),
        0,
    )
    sink(
        messages_to_cloud_events(_framed(spark, [("conn-1", MSGS[2], T, "message", 2)])),
        1,
    )

    records = _drain_all(service)
    assert len(records) == 3  # (conn-1 batch0), (conn-2 batch0), (conn-1 batch1)

    df = spark.createDataFrame(
        [(r["PartitionKey"], r["Data"]) for r in records], ["partition_key", "record"]
    )
    parsed = parse_kinesis_records(df)
    rows = parsed.collect()
    by_conn: dict[str, list[str]] = {}
    for r in rows:
        by_conn.setdefault(r["conn_id"], []).append(r["raw"])
    assert by_conn["conn-1"] == [MSGS[0], MSGS[1], MSGS[2]]  # arrival order
    assert by_conn["conn-2"] == [MSGS[2]]
    assert all(r["id"] for r in rows)  # deterministic ids survive the trip
    assert replay_scaled(parsed, raw_col="raw", scale=3).count() == 12


def test_failed_poll_redelivers_at_least_once(spark):
    """Iterator position derives from the last COMMITTED sequence: a
    consumer that fails mid-processing re-polls from the old position and
    receives the same records again (at-least-once, iterator not advanced
    on failure — kinesis_source.ex:150-169)."""
    service = StubKinesisService(n_shards=1)
    sink = KinesisSink(stream="s", client=service)
    sink(
        messages_to_cloud_events(
            _framed(spark, [("conn-1", m, T, "message", i) for i, m in enumerate(MSGS)])
        ),
        0,
    )
    shard = service.list_shards("s")[0]

    committed = None
    first, last = read_shard_records(service, "s", shard, after_seq=committed)
    assert len(first) == 1  # one key → one batched record
    # processing fails → committed stays None → redelivery of the same data
    redelivered, last2 = read_shard_records(service, "s", shard, after_seq=committed)
    assert [r["SequenceNumber"] for r in redelivered] == [r["SequenceNumber"] for r in first]
    assert redelivered[0]["Data"] == first[0]["Data"]

    # processing succeeds → commit → next poll is empty
    committed = last2
    again, _ = read_shard_records(service, "s", shard, after_seq=committed)
    assert again == []


def test_broken_ordering_chain_is_rejected(spark):
    """The stub enforces SequenceNumberForOrdering: chaining from a stale
    sequence raises — a sink whose ledger drifts fails loudly in tests."""
    service = StubKinesisService(n_shards=1)
    r1 = service.put_record("s", "conn-1", "a")
    service.put_record("s", "conn-1", "b", sequence_number_for_ordering=r1["SequenceNumber"])
    with pytest.raises(ValueError, match="broken ordering chain"):
        # chains from r1 again, but the key's latest is r2
        service.put_record("s", "conn-1", "c", sequence_number_for_ordering=r1["SequenceNumber"])


def test_sink_ledger_survives_batches_against_strict_service(spark):
    """The driver-side sink's cross-batch ledger maintains a valid chain
    against the STRICT service — the chaining regression test the logging
    fake couldn't express."""
    service = StubKinesisService(n_shards=2)
    sink = KinesisSink(stream="s", client=service)
    for batch_id in range(3):
        sink(
            messages_to_cloud_events(
                _framed(spark, [("conn-1", MSGS[batch_id], T, "message", batch_id)])
            ),
            batch_id,
        )  # a broken chain would raise inside put_record
    records = _drain_all(service)
    assert len(records) == 3
