"""S1 over a REAL socket: a live TCP server feeds Spark's socket source
through the full ingest pipeline (framing -> heartbeat filter ->
CloudEvent projection -> ordered sink).

The reference's S1 is a TCP *server* (proxy.ex accepts connections);
Spark's dev socket source is a *client*, so the test plays the OCS feed
side: it serves newline-delimited packets (the socket source's record
unit) whose payloads carry EOT-framed messages — INCLUDING one message
deliberately split across two packets, so the cross-packet buffer
stitching that proxy_test.exs:85-111 pins is exercised over an actual
socket rather than the rate-source fake.

Flake defense (round-8, r7 verdict item 2): the adapter's only order
signal is ``unix_millis`` of the socket-read time, so two packets read
in the same millisecond tie and the framing kernel correctly kills the
query loudly. Sender pacing alone cannot prevent that — under load the
receiver bunches reads and drains the kernel buffer in one burst. Two
layers here:

  1. **ACK-paced sends**: the server sends packet N+1 only after the
     query's cumulative input-row count (summed over ``recentProgress``
     by batchId) shows packet N was already READ — and therefore already
     millisecond-stamped — so a later send cannot tie with it.
  2. **Bounded retry**: if a residual tie still kills the query (the
     adapter's documented loud-failure contract), the attempt restarts
     with a fresh checkpoint, up to 3 attempts. Any OTHER query
     exception fails immediately.
"""

from __future__ import annotations

import socket
import threading
import time

import pytest

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

TIE_MARKER = "duplicate arrival_seq"


class _ProgressReader:
    """Cumulative input-row count for a streaming query, summed over
    ``recentProgress`` keyed by batchId (recentProgress retains ~100
    entries; the ACK loop polls every 50 ms so no batch is missed)."""

    def __init__(self, query) -> None:
        self.query = query
        self._rows: dict[int, int] = {}

    def rows_read(self) -> int:
        for p in self.query.recentProgress:
            self._rows[p["batchId"]] = int(p["numInputRows"])
        return sum(self._rows.values())


def _serve_acked(sock: socket.socket, stop: threading.Event, ack: threading.Event) -> None:
    """Send one packet per ACK: the main thread sets ``ack`` only after
    the query has READ (= millisecond-stamped) everything sent so far."""
    sock.listen(1)
    while not stop.is_set():
        try:
            conn, _ = sock.accept()
        except OSError:
            return
        try:
            i = 0
            while not stop.is_set():
                if not ack.wait(timeout=0.2):
                    continue
                ack.clear()
                conn.sendall((PACKETS[i % len(PACKETS)] + "\n").encode())
                i += 1
        except OSError:
            continue  # client went away; await reconnect
        finally:
            conn.close()


def _run_attempt(spark, ckpt: str, port_holder: list[int]) -> tuple[bool, str]:
    """One end-to-end attempt. Returns (tie_failure, all_sink_data);
    raises on any non-tie query failure or assertion."""
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    port = server.getsockname()[1]
    port_holder.append(port)
    stop = threading.Event()
    ack = threading.Event()
    t = threading.Thread(target=_serve_acked, args=(server, stop, ack), daemon=True)
    t.start()

    client = FakeKinesisClient()
    sink = KinesisSink(stream="console", client=client)
    chunks = socket_chunk_stream(spark, host="127.0.0.1", port=port)
    events = build_ingest_pipeline(chunks, stale_timeout_ms=60_000)
    q = (
        events.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink)
        .start()
    )
    progress = _ProgressReader(q)

    def all_data() -> str:
        return "".join(c["data"] for c in client.calls)

    sent = 0
    try:
        deadline = time.time() + 90
        ack.set()  # release packet 1
        sent = 1
        while time.time() < deadline and not (
            MSG_WHOLE in all_data() and MSG_SPLIT in all_data()
        ):
            exc = q.exception()
            if exc is not None:
                if TIE_MARKER in str(exc):
                    return True, all_data()  # documented loud tie-failure
                raise AssertionError(str(exc))
            # ACK-pace: next packet only once everything sent so far has
            # been read off the socket (and therefore already stamped)
            if progress.rows_read() >= sent:
                ack.set()
                sent += 1
            time.sleep(0.05)
    finally:
        stop.set()
        q.stop()
        server.close()

    data = all_data()
    assert MSG_WHOLE in data, "whole-frame message never reached the sink"
    # the split message only exists if two separate socket records were
    # stitched in the stateful buffer — the property under test
    assert MSG_SPLIT in data, "cross-packet frame was not reassembled"
    assert "HEARTBEAT" not in data  # F2 still filters after framing
    # every record came from the single socket connection key
    assert {c["partition_key"] for c in client.calls} == {f"127.0.0.1:{port}"}
    return False, data


def test_socket_ingest_end_to_end(spark, tmp_path):
    ties = 0
    for attempt in range(3):
        ports: list[int] = []
        tie, _ = _run_attempt(spark, str(tmp_path / f"ckpt{attempt}"), ports)
        if not tie:
            return  # full e2e assertions passed inside _run_attempt
        ties += 1
    # 3 consecutive millisecond ties under ACK-paced sends would mean the
    # pacing is broken, not the machine loaded — fail, with the count.
    pytest.fail(
        f"socket e2e hit the documented loud tie-failure {ties}/3 attempts "
        "despite ACK-paced sends"
    )
