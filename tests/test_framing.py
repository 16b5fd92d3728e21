"""Framing semantics — the reference's extract/2 and buffering behavior
(proxy_test.exs:61-111) plus the stateful streaming operator end-to-end."""

from __future__ import annotations

import json
import time

from trike_spark.streaming.framing import (
    CHUNK_SCHEMA,
    EOT,
    extract,
    framed_stream,
)

MSG1 = "4994,TSCH,02:00:06,R,RLD,W"
MSG2 = "4995,TSCH,03:00:06,R,RLD,W"


class TestExtract:
    def test_single_complete_frame(self):
        msgs, buf = extract(MSG1 + EOT)
        assert msgs == [MSG1] and buf == ""

    def test_multiple_messages_one_packet(self):
        # proxy_test.exs:73-83
        msgs, buf = extract(MSG1 + EOT + MSG2 + EOT)
        assert msgs == [MSG1, MSG2] and buf == ""

    def test_partial_frame_buffers(self):
        # proxy_test.exs:85-96
        msgs, buf = extract(MSG1)
        assert msgs == [] and buf == MSG1

    def test_stitch_across_packets(self):
        # proxy_test.exs:98-111
        half1, half2 = MSG1[:10], MSG1[10:]
        msgs, buf = extract(half1)
        assert msgs == []
        msgs, buf = extract(buf + half2 + EOT)
        assert msgs == [MSG1] and buf == ""


def _chunk_rows(*chunks: tuple[str, str]) -> list[tuple]:
    from datetime import datetime

    t = datetime(2021, 8, 13, 12, 0, 0)
    return [(conn, chunk, t, i) for i, (conn, chunk) in enumerate(chunks)]


def test_framed_stream_batchlike(spark, tmp_path):
    """Drive the real applyInPandasWithState operator through a streaming
    file source: partial frames stitch across rows, multi-message chunks
    split, per-key isolation holds."""
    src = tmp_path / "in"
    src.mkdir()
    rows = _chunk_rows(
        ("a", MSG1 + EOT + MSG2[:5]),  # one complete + one partial
        ("a", MSG2[5:] + EOT),  # completes the partial
        ("b", MSG1),  # never completed on b
    )
    with open(src / "chunks.json", "w") as f:
        for conn, chunk, ts, seq in rows:
            f.write(
                json.dumps(
                    {
                        "conn_id": conn,
                        "chunk": chunk,
                        "arrival_ts": ts.strftime("%Y-%m-%dT%H:%M:%S.000Z"),
                        "arrival_seq": seq,
                    }
                )
                + "\n"
            )
    chunks = (
        spark.readStream.schema(CHUNK_SCHEMA)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
        .json(str(src))
    )
    framed = framed_stream(chunks, stale_timeout_ms=60_000)
    q = (
        framed.writeStream.format("memory")
        .queryName("framed_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # NB: processAllAvailable() can block forever with processing-time
    # timeouts (timer checks keep scheduling batches) — poll instead.
    try:
        deadline = time.time() + 90
        out: list = []
        while time.time() < deadline:
            if q.exception():
                raise AssertionError(str(q.exception()))
            out = spark.table("framed_out").collect()
            if sum(1 for r in out if r["kind"] == "message") >= 2:
                break
            time.sleep(1)
    finally:
        q.stop()
    msgs = sorted((r["conn_id"], r["raw"]) for r in out if r["kind"] == "message")
    assert msgs == [("a", MSG1), ("a", MSG2)]  # b's partial stays buffered
