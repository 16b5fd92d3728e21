"""transformWithState framing twin (streaming/framing_tws.py).

Two layers:
  * Unit parity (always runs): FramingProcessor driven through a FAKE
    handle/state/timer harness must emit exactly what the
    applyInPandasWithState function (framing.frame_and_session) emits on
    the same chunks — messages, shared per-packet timestamps, monotonic
    seq, buffer carry-over, timer re-arm set, session_closed on expiry.
  * e2e through the real transformWithStateInPandas runtime (gated):
    the Python worker needs google.protobuf, which standard PySpark
    distributions bundle but this container does not ship — skipped here,
    exercised on any normal install.
"""

from __future__ import annotations

import importlib.util
import json
import time
from datetime import datetime

import pandas as pd
import pytest

from trike_spark.streaming.framing import CHUNK_SCHEMA, EOT
from trike_spark.streaming.framing_tws import FramingProcessor, framed_stream_tws

try:  # find_spec raises if the parent 'google' namespace is absent
    HAVE_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:
    HAVE_PROTOBUF = False

MSG1 = "4994,TSCH,02:00:06,R,RLD,W"
MSG2 = "4995,TSCH,03:00:06,R,RLD,W"
MSG3 = "4996,TSCH,04:00:06,R,RLD,W"

TS = datetime(2021, 8, 13, 12, 0, 0)


# --- fake transformWithState harness ---------------------------------------

class FakeValueState:
    """Implicitly scoped to the handle's CURRENT grouping key, exactly like
    the real runtime's state cells."""

    def __init__(self, handle):
        self.handle = handle
        self.per_key = {}

    def get(self):
        return self.per_key.get(self.handle.current_key)

    def update(self, v):
        self.per_key[self.handle.current_key] = v

    def clear(self):
        self.per_key.pop(self.handle.current_key, None)


class FakeHandle:
    def __init__(self):
        self.states = {}
        self.per_key_timers = {}
        self.current_key = None

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeValueState(self))

    def _timers(self):
        return self.per_key_timers.setdefault(self.current_key, set())

    def listTimers(self):
        return iter(sorted(self._timers()))

    def registerTimer(self, ts):
        self._timers().add(ts)

    def deleteTimer(self, ts):
        self._timers().discard(ts)


class FakeTimerValues:
    def __init__(self, now_ms):
        self.now_ms = now_ms

    def getCurrentProcessingTimeInMs(self):
        return self.now_ms


def _batch(rows):
    return pd.DataFrame(
        {
            "conn_id": [r[0] for r in rows],
            "chunk": [r[1] for r in rows],
            "arrival_ts": [TS] * len(rows),
            "arrival_seq": [r[2] for r in rows],
        }
    )


def _drive_processor(batches_per_key):
    """Run FramingProcessor over keyed micro-batches; returns (rows, handle)."""
    proc = FramingProcessor(stale_timeout_ms=60_000)
    handle = FakeHandle()
    proc.init(handle)
    out = []
    now = 1_000_000
    for key, batch in batches_per_key:
        handle.current_key = key
        for pdf in proc.handleInputRows((key,), iter([batch]), FakeTimerValues(now)):
            out.extend(pdf.to_dict("records"))
        now += 1_000
    return out, handle


def _drive_apply_in_pandas(batches_per_key):
    """Reference: the applyInPandasWithState function with its GroupState
    protocol faked minimally (per-key buffer tuple)."""
    from trike_spark.streaming.framing import frame_and_session

    class FakeGroupState:
        def __init__(self):
            self.value = None
            self.hasTimedOut = False

        @property
        def exists(self):
            return self.value is not None

        @property
        def get(self):
            return self.value

        def update(self, v):
            self.value = v

        def remove(self):
            self.value = None

        def setTimeoutDuration(self, ms):
            pass

    states: dict = {}
    out = []
    for key, batch in batches_per_key:
        st = states.setdefault(key, FakeGroupState())
        for pdf in frame_and_session((key,), iter([batch]), st, 60_000):
            out.extend(pdf.to_dict("records"))
    return out


CHUNKS = [
    ("a", _batch([("a", MSG1 + EOT + MSG2[:5], 0)])),
    ("b", _batch([("b", MSG1, 1)])),
    ("a", _batch([("a", MSG2[5:] + EOT + MSG3 + EOT, 2)])),
    ("b", _batch([("b", EOT, 3)])),
]


def test_processor_parity_with_applyinpandaswithstate_function():
    got, _ = _drive_processor(CHUNKS)
    ref = _drive_apply_in_pandas(CHUNKS)
    key = lambda r: (r["conn_id"], r["seq"])
    assert sorted(got, key=key) == sorted(ref, key=key)
    assert [(r["conn_id"], r["raw"], r["seq"]) for r in sorted(got, key=key)] == [
        ("a", MSG1, 0),
        ("a", MSG2, 1),
        ("a", MSG3, 2),
        ("b", MSG1, 0),
    ]
    # shared per-packet timestamp preserved
    assert all(r["time"] == TS for r in got)


def test_processor_rearms_single_timer_per_key():
    proc = FramingProcessor(stale_timeout_ms=5_000)
    handle = FakeHandle()
    proc.init(handle)
    handle.current_key = "k"
    for i, now in enumerate((1_000, 2_000, 9_999)):
        list(
            proc.handleInputRows(
                ("k",), iter([_batch([("k", "x", i)])]), FakeTimerValues(now)
            )
        )
        # exactly ONE pending timer, at now + timeout (re-arm, not stack)
        assert list(handle.listTimers()) == [now + 5_000]


def test_processor_expired_timer_emits_closed_and_clears():
    proc = FramingProcessor(stale_timeout_ms=5_000)
    handle = FakeHandle()
    proc.init(handle)
    handle.current_key = "k"
    list(
        proc.handleInputRows(
            ("k",), iter([_batch([("k", MSG1, 0)])]), FakeTimerValues(1_000)
        )
    )
    assert handle.states["framebuf"].get() == (MSG1, 0)
    rows = []
    for pdf in proc.handleExpiredTimer(("k",), FakeTimerValues(6_500), None):
        rows.extend(pdf.to_dict("records"))
    assert [(r["conn_id"], r["kind"]) for r in rows] == [("k", "session_closed")]
    assert handle.states["framebuf"].get() is None
    assert list(handle.listTimers()) == []


@pytest.mark.skipif(
    not HAVE_PROTOBUF,
    reason="transformWithState Python worker requires google.protobuf "
    "(bundled with standard PySpark; absent in this container)",
)
def test_tws_e2e_through_real_runtime(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    with open(src / "chunks.json", "w") as f:
        for conn, chunk, seq in [
            ("a", MSG1 + EOT + MSG2[:5], 0),
            ("a", MSG2[5:] + EOT, 1),
        ]:
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
    chunks = (
        spark.readStream.schema(CHUNK_SCHEMA)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
        .json(str(src))
    )
    q = (
        framed_stream_tws(chunks, stale_timeout_ms=60_000)
        .writeStream.format("memory")
        .queryName("tws_e2e")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 90
        out: list = []
        while time.time() < deadline:
            if q.exception():
                raise AssertionError(str(q.exception()))
            out = spark.table("tws_e2e").collect()
            if sum(1 for r in out if r["kind"] == "message") >= 2:
                break
            time.sleep(1)
    finally:
        q.stop()
    msgs = sorted((r["conn_id"], r["raw"]) for r in out if r["kind"] == "message")
    assert msgs == [("a", MSG1), ("a", MSG2)]


def test_e2e_skip_reason_is_only_protobuf_absence(spark):
    """Guard on the one suite skip: the e2e must be gated SOLELY on
    google.protobuf availability. Everything else the real runtime needs
    — the transformWithStateInPandas API, the processor class, the state
    schema — must be present and importable, so the moment the
    environment gains protobuf the e2e auto-unskips (and if a Spark
    upgrade ever removed the API, this fails loudly instead of the e2e
    silently staying skipped forever)."""
    gdf = spark.createDataFrame([], CHUNK_SCHEMA).groupBy("conn_id")
    assert hasattr(gdf, "transformWithStateInPandas"), (
        "transformWithStateInPandas missing — the e2e skip is no longer "
        "about protobuf; re-gate or fix"
    )
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    assert issubclass(FramingProcessor, StatefulProcessor)
    if HAVE_PROTOBUF:
        pytest.fail(
            "google.protobuf is now available — remove the skip gate and "
            "let test_tws_e2e_through_real_runtime run for real"
        )


def test_duplicate_arrival_seq_fails_loudly_both_twins():
    """A duplicate (conn_id, arrival_seq) pair means the source's order
    signal has ties (the dev socket source stamps at millisecond
    resolution) and the stitch order — hence the reassembled frame — is
    arbitrary. Both stateful twins must refuse loudly rather than frame
    a possibly-corrupted message (ADVICE r6: 'have framing assert on
    duplicate pairs so ties fail loudly')."""
    dup = _batch([("a", MSG1[:10], 7), ("a", MSG1[10:] + EOT, 7)])

    with pytest.raises(ValueError, match="duplicate arrival_seq"):
        _drive_processor([("a", dup)])

    with pytest.raises(ValueError, match="duplicate arrival_seq"):
        _drive_apply_in_pandas([("a", dup)])

    # unique seqs on the same payload still frame fine (control)
    ok = _batch([("a", MSG1[:10], 7), ("a", MSG1[10:] + EOT, 8)])
    rows, _ = _drive_processor([("a", ok)])
    assert [r["raw"] for r in rows if r["kind"] == "message"] == [MSG1]


def test_cross_chunk_order_restored_before_stitch():
    """Arrow may deliver one key's micro-batch as SEVERAL chunks in
    arbitrary order; the framing twins must sort the CONCATENATION by
    arrival_seq (a per-chunk sort would stitch later bytes first and
    corrupt the frame silently). Feed the later half of a split frame in
    the FIRST chunk and assert both twins still reassemble it."""
    first_half = _batch([("a", MSG1[:10], 3)])
    second_half = _batch([("a", MSG1[10:] + EOT, 8)])

    # applyInPandasWithState function, chunks delivered out of order
    from trike_spark.streaming.framing import frame_and_session

    class _St:
        value = None
        hasTimedOut = False

        @property
        def exists(self):
            return self.value is not None

        @property
        def get(self):
            return self.value

        def update(self, v):
            self.value = v

        def setTimeoutDuration(self, ms):
            pass

    out = []
    for pdf in frame_and_session(("a",), iter([second_half, first_half]), _St(), 60_000):
        out.extend(pdf.to_dict("records"))
    assert [r["raw"] for r in out if r["kind"] == "message"] == [MSG1]

    # transformWithState twin, same delivery order
    proc = FramingProcessor(stale_timeout_ms=60_000)
    handle = FakeHandle()
    proc.init(handle)
    handle.current_key = "a"
    rows = []
    for pdf in proc.handleInputRows(
        ("a",), iter([second_half, first_half]), FakeTimerValues(1_000_000)
    ):
        rows.extend(pdf.to_dict("records"))
    assert [r["raw"] for r in rows if r["kind"] == "message"] == [MSG1]
