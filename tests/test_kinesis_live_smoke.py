"""Env-gated LIVE Kinesis smoke (r5 verdict "What's missing" #3): the
production leg of K1 is verified in this container down to the
arg-shape boundary (tests/test_boto3_arg_shape.py) because boto3 and
AWS credentials are absent. This test closes the remaining seam the
moment an environment provides them: set

    SPARK_GRAFT_LIVE_KINESIS_STREAM=<existing stream name>
    (and standard AWS credentials/region in the environment)

and the ordered-sink contract runs against the real service — two
records on one partition key, the second chained on the first's real
SequenceNumber. Skipped (with the precise reason) otherwise, so the
suite documents exactly what unlocks it instead of silently lacking
live coverage forever."""

from __future__ import annotations

import importlib.util
import os

import pytest

STREAM = os.environ.get("SPARK_GRAFT_LIVE_KINESIS_STREAM")
HAVE_BOTO3 = importlib.util.find_spec("boto3") is not None


@pytest.mark.skipif(
    not HAVE_BOTO3,
    reason="boto3 not installed in this container (arg-shape contract "
    "covers the adapter; see tests/test_boto3_arg_shape.py)",
)
@pytest.mark.skipif(
    HAVE_BOTO3 and not STREAM,
    reason="SPARK_GRAFT_LIVE_KINESIS_STREAM not set — no live stream to "
    "write to",
)
def test_live_put_record_ordered_chain():
    from trike_spark.streaming.sinks import boto3_client_factory

    client = boto3_client_factory()()
    r1 = client.put_record(
        stream=STREAM, partition_key="live-smoke", data='[{"n":1}]'
    )
    assert r1["SequenceNumber"]
    r2 = client.put_record(
        stream=STREAM,
        partition_key="live-smoke",
        data='[{"n":2}]',
        sequence_number_for_ordering=r1["SequenceNumber"],
    )
    # Kinesis guarantees per-key ordering under SequenceNumberForOrdering:
    # the chained record's sequence number is strictly greater
    assert int(r2["SequenceNumber"]) > int(r1["SequenceNumber"])
