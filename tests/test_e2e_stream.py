"""Full-pipeline streaming test: fake source → stateful framing →
heartbeat filter → CloudEvent projection → ordered Kinesis sink — the
whole SURVEY.md §3.1 path running as one Structured Streaming query."""

from __future__ import annotations

import time

from trike_spark.streaming.pipeline import build_ingest_pipeline
from trike_spark.streaming.sinks import FakeKinesisClient, KinesisSink
from trike_spark.streaming.sources import CANNED_MESSAGES, fake_chunk_stream


def test_ingest_pipeline_end_to_end(spark, tmp_path):
    client = FakeKinesisClient()
    sink = KinesisSink(stream="console", client=client)
    chunks = fake_chunk_stream(spark, rows_per_second=20, n_connections=3, heartbeat_every=5)
    events = build_ingest_pipeline(chunks, stale_timeout_ms=60_000)
    q = (
        events.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink)
        .start()
    )
    def some_key_repeated() -> bool:
        seen: dict[str, int] = {}
        for c in client.calls:
            seen[c["partition_key"]] = seen.get(c["partition_key"], 0) + 1
        return any(v >= 2 for v in seen.values())

    try:
        deadline = time.time() + 90
        while time.time() < deadline and not (len(client.calls) >= 3 and some_key_repeated()):
            if q.exception():
                raise AssertionError(str(q.exception()))
            time.sleep(1)
    finally:
        q.stop()
    assert len(client.calls) >= 3, "no records reached the sink"
    # records are JSON arrays of CloudEvents with the full field set
    sample = client.calls[-1]["data"]
    for field in ('"data"', '"id"', '"partitionkey"', '"source"', '"sourceip"', '"specversion"', '"time"', '"type"'):
        assert field in sample
    assert '"com.mbta.ocs.raw_message"' in sample
    # heartbeats framed upstream but never forwarded (F2 after F1)
    assert "HEARTBEAT" not in sample
    # payloads are the canned OCS messages
    assert any(m in sample for m in CANNED_MESSAGES)
    # per-key sequence chaining: a key seen twice carries the prior seq
    by_key: dict[str, list] = {}
    for c in client.calls:
        by_key.setdefault(c["partition_key"], []).append(c)
    chained = [k for k, calls in by_key.items() if len(calls) >= 2]
    assert chained, "need a key with 2+ records to check chaining"
    for k in chained:
        assert by_key[k][0]["sequence_number_for_ordering"] is None
        assert by_key[k][1]["sequence_number_for_ordering"] is not None


def test_ingest_pipeline_survives_bad_bytes(spark, tmp_path):
    """The reference's --bad flag, end to end (fake_source.ex:60-97):
    garbage frames interleaved with real traffic must flow through the
    stateful framing without wedging the session — real messages keep
    arriving AFTER garbage ticks, and the garbage frames themselves are
    forwarded as CloudEvents (trike never validates OCS content; the
    proxy contract under corruption is passthrough + timer re-arm)."""
    import base64
    import hashlib

    client = FakeKinesisClient()
    sink = KinesisSink(stream="console", client=client)
    # bad_every=3 → every third tick is 5 md5-derived garbage bytes;
    # heartbeat ticks (every 5th) win, like the reference's cond order.
    chunks = fake_chunk_stream(
        spark, rows_per_second=20, n_connections=3, heartbeat_every=5, bad_every=3
    )
    events = build_ingest_pipeline(chunks, stale_timeout_ms=60_000)
    q = (
        events.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink)
        .start()
    )

    def expected_garbage(tick: int) -> str:
        return base64.b64encode(
            hashlib.md5(str(tick).encode()).digest()[:5]
        ).decode()

    def all_data() -> str:
        return "".join(c["data"] for c in client.calls)

    def garbage_seen() -> bool:
        # ticks ≡ 2 (mod 3) that are not heartbeat ticks (≢ 0 mod 5)
        return any(
            expected_garbage(t) in all_data()
            for t in (2, 8, 11, 14, 17)
        )

    def canned_seen() -> bool:
        return any(m in all_data() for m in CANNED_MESSAGES)

    try:
        deadline = time.time() + 90
        while time.time() < deadline and not (garbage_seen() and canned_seen()):
            if q.exception():
                raise AssertionError(str(q.exception()))
            time.sleep(1)
    finally:
        q.stop()
    data = all_data()
    assert canned_seen(), "real messages stopped flowing alongside garbage"
    assert garbage_seen(), "no garbage frame reached the sink (bad ratio = 0)"
    # heartbeats still filtered, garbage still passed — F2 is exact-match
    assert "HEARTBEAT" not in data
