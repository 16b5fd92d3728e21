"""Executor-side sink path: records repartition by key and each partition
puts its own keys (the horizontal-scale configuration)."""

from __future__ import annotations

import glob
import json
import os
from datetime import datetime

from trike_spark.streaming.framing import FRAMED_SCHEMA
from trike_spark.streaming.pipeline import messages_to_cloud_events
from trike_spark.streaming.sinks import DistributedKinesisSink, FakeKinesisClient

T = datetime(2021, 8, 13, 12, 0, 0)
MSG = "4994,TSCH,02:00:06,R,RLD,W"


def test_distributed_sink_puts_every_key(spark, tmp_path):
    spool = str(tmp_path / "spool")

    def factory(spool=spool):
        return FakeKinesisClient(spool_dir=spool)

    sink = DistributedKinesisSink(stream="test-stream", client_factory=factory)
    framed = spark.createDataFrame(
        [(f"conn-{i}", MSG, T, "message", 0) for i in range(5)], FRAMED_SCHEMA
    )
    sink(messages_to_cloud_events(framed), 0)
    records = []
    for path in glob.glob(os.path.join(spool, "records.jsonl")):
        with open(path) as f:
            records += [json.loads(line) for line in f]
    assert {r["partition_key"] for r in records} == {f"conn-{i}" for i in range(5)}
    assert all(r["data"].startswith("[{") for r in records)
