"""Spool-directory source e2e: JSON-lines files dropped into a directory
flow through the full ingest pipeline (framing → heartbeat filter →
CloudEvent → ordered sink), INCLUDING a frame that spans two spool files —
the cross-file analogue of the socket source's cross-packet stitching."""

from __future__ import annotations

import json
import time

from trike_spark.functions.cloud_event import EOT, HEARTBEAT
from trike_spark.streaming.pipeline import build_ingest_pipeline
from trike_spark.streaming.sinks import FakeKinesisClient, KinesisSink
from trike_spark.streaming.sources import spool_chunk_stream


def _write_spool(path, rows):
    # Atomic publish: write outside the watched dir, then rename in — the
    # file source lists a file ONCE; a partially-written file it catches
    # mid-write would be recorded as processed and never re-read.
    import os

    tmp = path.parent.parent / (path.name + ".tmp")
    tmp.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    os.rename(tmp, path)


def test_spool_source_end_to_end_with_cross_file_frame(spark, tmp_path):
    spool = tmp_path / "spool"
    spool.mkdir()
    # file 1: one complete frame, a heartbeat frame, and a PARTIAL frame
    # ("900,TSCH" — no EOT yet) on conn-b
    _write_spool(
        spool / "archive-000.jsonl",
        [
            {"conn_id": "conn-a", "chunk": f"4994,TSCH,02:00:06,R,RLD,W{EOT}", "arrival_seq": 1},
            {"conn_id": "conn-a", "chunk": f"{HEARTBEAT}{EOT}", "arrival_seq": 2},
            {"conn_id": "conn-b", "chunk": "900,TSCH", "arrival_seq": 1},
        ],
    )

    client = FakeKinesisClient()
    sink = KinesisSink(stream="console", client=client)
    chunks = spool_chunk_stream(spark, str(spool), max_files_per_trigger=1)
    events = build_ingest_pipeline(chunks, stale_timeout_ms=600_000)
    q = (
        events.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink)
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not client.calls:
            if q.exception():
                raise AssertionError(str(q.exception()))
            time.sleep(0.5)
        assert client.calls, "file-1 frame never reached the sink"
        assert any("4994,TSCH" in c["data"] for c in client.calls)
        # the partial conn-b frame must NOT have been emitted
        assert not any("900,TSCH" in c["data"] for c in client.calls)

        # file 2 arrives later and COMPLETES the conn-b frame
        _write_spool(
            spool / "archive-001.jsonl",
            [{"conn_id": "conn-b", "chunk": f",03:10:00,B,RLD,E{EOT}", "arrival_seq": 2}],
        )
        deadline = time.time() + 60
        while time.time() < deadline and not any(
            "900,TSCH,03:10:00" in c["data"] for c in client.calls
        ):
            if q.exception():
                raise AssertionError(str(q.exception()))
            time.sleep(0.5)
    finally:
        q.stop()

    stitched = [c for c in client.calls if "900,TSCH,03:10:00,B,RLD,E" in c["data"]]
    assert stitched, "cross-file frame was not stitched"
    assert stitched[0]["partition_key"] == "conn-b"
    # heartbeats were framed but never forwarded
    assert not any(HEARTBEAT in c["data"] for c in client.calls)
