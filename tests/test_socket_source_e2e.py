"""S1 over a REAL socket: a live TCP server feeds Spark's socket source
through the full ingest pipeline (framing -> heartbeat filter ->
CloudEvent projection -> ordered sink).

The reference's S1 is a TCP *server* (proxy.ex accepts connections);
Spark's dev socket source is a *client*, so the test plays the OCS feed
side: it serves newline-delimited packets (the socket source's record
unit) whose payloads carry EOT-framed messages — INCLUDING one message
deliberately split across two packets, so the cross-packet buffer
stitching that proxy_test.exs:85-111 pins is exercised over an actual
socket rather than the rate-source fake."""

from __future__ import annotations

import socket
import threading
import time

from trike_spark.functions.cloud_event import EOT, HEARTBEAT
from trike_spark.streaming.pipeline import build_ingest_pipeline
from trike_spark.streaming.sinks import FakeKinesisClient, KinesisSink
from trike_spark.streaming.sources import socket_chunk_stream

MSG_WHOLE = "4994,TSCH,02:00:06,R,RLD,W"
MSG_SPLIT = "4995,TSCH,03:00:06,B,RLD,E"

# one packet per line (the socket source's record unit = one chunk row);
# MSG_SPLIT's frame spans packets 2 and 3
PACKETS = [
    MSG_WHOLE + EOT,
    MSG_SPLIT[:9],
    MSG_SPLIT[9:] + EOT,
    HEARTBEAT + EOT,
]


def _serve(sock: socket.socket, stop: threading.Event) -> None:
    sock.listen(1)
    while not stop.is_set():
        try:
            conn, _ = sock.accept()
        except OSError:
            return
        try:
            while not stop.is_set():
                for p in PACKETS:
                    conn.sendall((p + "\n").encode())
                    time.sleep(0.05)
        except OSError:
            continue  # client went away; await reconnect
        finally:
            conn.close()


def test_socket_ingest_end_to_end(spark, tmp_path):
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    port = server.getsockname()[1]
    stop = threading.Event()
    t = threading.Thread(target=_serve, args=(server, stop), daemon=True)
    t.start()

    client = FakeKinesisClient()
    sink = KinesisSink(stream="console", client=client)
    chunks = socket_chunk_stream(spark, host="127.0.0.1", port=port)
    events = build_ingest_pipeline(chunks, stale_timeout_ms=60_000)
    q = (
        events.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink)
        .start()
    )

    def all_data() -> str:
        return "".join(c["data"] for c in client.calls)

    try:
        deadline = time.time() + 90
        while time.time() < deadline and not (
            MSG_WHOLE in all_data() and MSG_SPLIT in all_data()
        ):
            if q.exception():
                raise AssertionError(str(q.exception()))
            time.sleep(1)
    finally:
        q.stop()
        stop.set()
        server.close()

    data = all_data()
    assert MSG_WHOLE in data, "whole-frame message never reached the sink"
    # the split message only exists if two separate socket records were
    # stitched in the stateful buffer — the property under test
    assert MSG_SPLIT in data, "cross-packet frame was not reassembled"
    assert "HEARTBEAT" not in data  # F2 still filters after framing
    # every record came from the single socket connection key
    assert {c["partition_key"] for c in client.calls} == {f"127.0.0.1:{port}"}
