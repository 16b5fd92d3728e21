"""Trigger.AvailableNow: drain-everything-then-stop — the batch-over-stream
mode used for backfills of the archive (replaces trike's run-forever loop
for bounded replays)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from trike_spark.streaming.framing import CHUNK_SCHEMA, EOT, framed_stream
from trike_spark.streaming.pipeline import messages_to_cloud_events

MSGS = ["4994,TSCH,02:00:06,R,RLD,W", "4995,TSCH,03:00:06,R,RLD,W", "HEARTBEAT"]


def test_available_now_drains_and_stops(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    with open(src / "chunks.json", "w") as f:
        for i, m in enumerate(MSGS):
            f.write(
                json.dumps(
                    {
                        "conn_id": "conn-1",
                        "chunk": m + EOT,
                        "arrival_ts": "2021-08-13T12:00:00.000Z",
                        "arrival_seq": i,
                    }
                )
                + "\n"
            )
    chunks = (
        spark.readStream.schema(CHUNK_SCHEMA)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
        .json(str(src))
    )
    # backfill configuration: no stale timers → availableNow can terminate
    events = messages_to_cloud_events(framed_stream(chunks, stale_timeout_ms=None))
    q = (
        events.writeStream.format("memory")
        .queryName("an_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)  # availableNow terminates by itself when drained
    assert not q.isActive
    rows = spark.table("an_out").collect()
    raws = sorted(r["event"]["data"]["raw"] for r in rows)
    assert raws == sorted(MSGS[:2])  # both messages, heartbeat dropped


def test_duplicate_events_dedup_on_deterministic_id(spark):
    """Replays deliver at-least-once; the sha1 id makes downstream dedup
    exact — same (time, raw) → same id → one survivor."""
    from trike_spark.streaming.framing import FRAMED_SCHEMA
    from datetime import datetime

    T = datetime(2021, 8, 13, 12, 0, 0)
    framed = spark.createDataFrame(
        [("conn-1", MSGS[0], T, "message", i) for i in range(3)] + [("conn-1", MSGS[1], T, "message", 3)],
        FRAMED_SCHEMA,
    )
    events = messages_to_cloud_events(framed)
    deduped = events.select(
        "partitionkey", F.col("event.id").alias("id"), "event"
    ).dropDuplicates(["id"])
    assert events.count() == 4
    assert deduped.count() == 2
