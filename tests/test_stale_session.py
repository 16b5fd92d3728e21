"""Stale-session timeout semantics (reference proxy.ex:121-127, :230-240;
proxy_test.exs:128-134: ANY traffic — heartbeats included — resets the
timer; silence past the timeout closes the session)."""

from __future__ import annotations

import json
import time

from trike_spark.streaming.framing import CHUNK_SCHEMA, EOT, framed_stream

MSG1 = "4994,TSCH,02:00:06,R,RLD,W"


def test_stale_timeout_emits_session_closed(spark, tmp_path):
    """Feed one chunk, then let the processing-time timeout fire with no
    further traffic → a session_closed control row appears."""
    src = tmp_path / "in"
    src.mkdir()

    def write_chunk(name: str, conn: str, chunk: str, seq: int) -> None:
        with open(src / name, "w") as f:
            f.write(
                json.dumps(
                    {
                        "conn_id": conn,
                        "chunk": chunk,
                        "arrival_ts": "2021-08-13T12:00:00.000Z",
                        "arrival_seq": seq,
                    }
                )
                + "\n"
            )

    write_chunk("c1.json", "conn-1", MSG1 + EOT, 0)
    chunks = (
        spark.readStream.schema(CHUNK_SCHEMA)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
        .json(str(src))
    )
    framed = framed_stream(chunks, stale_timeout_ms=5000)
    q = (
        framed.writeStream.format("memory")
        .queryName("stale_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    def wait_for(pred, timeout=90):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if q.exception():
                raise AssertionError(str(q.exception()))
            rows = spark.table("stale_out").collect()
            if pred(rows):
                return rows
            time.sleep(1)
        raise AssertionError(f"timed out; rows={spark.table('stale_out').collect()}")

    try:
        # batch 1: the message arrives
        wait_for(lambda rows: any(r["kind"] == "message" and r["conn_id"] == "conn-1" for r in rows))
        time.sleep(6)  # let the 5 s processing-time timer expire
        # timeouts fire on a subsequent micro-batch; new data on a different
        # key (must not reset conn-1's timer) guarantees one promptly
        write_chunk("c2.json", "conn-2", MSG1 + EOT, 1)
        rows = wait_for(
            lambda rows: any(r["kind"] == "session_closed" and r["conn_id"] == "conn-1" for r in rows)
            and any(r["kind"] == "message" and r["conn_id"] == "conn-2" for r in rows)
        )
        kinds = {(r["conn_id"], r["kind"]) for r in rows}
        assert ("conn-1", "message") in kinds
        assert ("conn-1", "session_closed") in kinds  # timer fired
        assert ("conn-2", "message") in kinds
        assert ("conn-2", "session_closed") not in kinds  # fresh traffic
    finally:
        q.stop()
