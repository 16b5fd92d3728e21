"""Arg-shape contract for the production Kinesis client
(streaming/sinks.py::boto3_client_factory): even without AWS or boto3 in
the container, assert the EXACT kwargs the adapter would put on the wire —
recorded against the public PutRecord API schema (StreamName /
PartitionKey / Data:bytes / SequenceNumberForOrdering) — so silent
arg-drift in the adapter is caught by CI instead of the first production
deploy. A stub `boto3` module is injected into sys.modules; the factory's
deferred import picks it up.
"""

from __future__ import annotations

import sys
import types

import pytest

from trike_spark.streaming.sinks import boto3_client_factory

# The public PutRecord request schema (required + the one optional key the
# sink uses). Values: required Python types on the wire.
PUT_RECORD_SCHEMA = {
    "StreamName": str,
    "PartitionKey": str,
    "Data": bytes,
}
OPTIONAL_KEYS = {"SequenceNumberForOrdering": str}


class _RecordingKinesis:
    def __init__(self) -> None:
        self.calls: list[dict] = []

    def put_record(self, **kwargs):
        self.calls.append(kwargs)
        return {"SequenceNumber": str(100 + len(self.calls)), "ShardId": "shardId-0"}


@pytest.fixture()
def stub_boto3(monkeypatch):
    recorder = _RecordingKinesis()
    mod = types.ModuleType("boto3")
    created = {}

    def client(service, region_name=None):
        created["service"] = service
        created["region_name"] = region_name
        return recorder

    mod.client = client
    monkeypatch.setitem(sys.modules, "boto3", mod)
    return recorder, created


def _assert_schema(kwargs: dict, expect_ordering: bool) -> None:
    required = set(PUT_RECORD_SCHEMA)
    allowed = required | set(OPTIONAL_KEYS)
    assert required <= set(kwargs) <= allowed, kwargs
    for k, t in PUT_RECORD_SCHEMA.items():
        assert isinstance(kwargs[k], t), (k, type(kwargs[k]))
    if expect_ordering:
        assert isinstance(kwargs["SequenceNumberForOrdering"], str)
    else:
        assert "SequenceNumberForOrdering" not in kwargs


def test_put_record_kwargs_match_recorded_schema(stub_boto3):
    recorder, created = stub_boto3
    client = boto3_client_factory(region="us-east-1")()
    assert created == {"service": "kinesis", "region_name": "us-east-1"}

    # first put of a key: no ordering token
    resp = client.put_record("raw-stream", "conn-1", '[{"a":1}]')
    _assert_schema(recorder.calls[0], expect_ordering=False)
    assert recorder.calls[0]["StreamName"] == "raw-stream"
    assert recorder.calls[0]["PartitionKey"] == "conn-1"
    assert recorder.calls[0]["Data"] == b'[{"a":1}]'
    assert resp["SequenceNumber"] == "101"  # passthrough for the ledger

    # chained put: the ledger's token rides SequenceNumberForOrdering
    client.put_record("raw-stream", "conn-1", '[{"a":2}]', sequence_number_for_ordering="101")
    _assert_schema(recorder.calls[1], expect_ordering=True)
    assert recorder.calls[1]["SequenceNumberForOrdering"] == "101"


def test_kinesis_sink_chains_through_boto3_adapter(spark, stub_boto3):
    """End-to-end: KinesisSink → adapter → recorded boto3 kwargs; the
    second batch's put must carry the first response's SequenceNumber."""
    from trike_spark.streaming.sinks import KinesisSink

    recorder, _ = stub_boto3
    sink = KinesisSink(stream="raw-stream", client=boto3_client_factory()())
    b1 = spark.createDataFrame(
        [("conn-1", 0, '{"n":1}')], "partitionkey string, seq long, event string"
    )
    b2 = spark.createDataFrame(
        [("conn-1", 1, '{"n":2}')], "partitionkey string, seq long, event string"
    )
    sink(b1, 0)
    sink(b2, 1)
    assert len(recorder.calls) == 2
    _assert_schema(recorder.calls[0], expect_ordering=False)
    _assert_schema(recorder.calls[1], expect_ordering=True)
    assert recorder.calls[1]["SequenceNumberForOrdering"] == "101"
