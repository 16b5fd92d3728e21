"""Per-key token-bucket admission (streaming/throttle.py): burst capacity
on first contact, per-batch refill capped at burst, arrival_seq admission
order, carry-over credit across micro-batches, and visible (not silent)
shedding."""

from __future__ import annotations

import json
import time

from pyspark.sql.types import LongType, StringType, StructField, StructType

from trike_spark.streaming.throttle import throttled_stream

SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("event_id", LongType()),
        StructField("arrival_seq", LongType()),
    ]
)


def _write(src, name, rows):
    with open(src / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _poll(spark, q, table, pred, timeout=90):
    deadline = time.time() + deadline_pad(timeout)
    while time.time() < deadline:
        if q.exception():
            raise AssertionError(str(q.exception()))
        rows = spark.table(table).collect()
        if pred(rows):
            return rows
        time.sleep(1)
    raise AssertionError(f"timeout; rows={spark.table(table).collect()}")


def deadline_pad(t):
    return t


B1 = [{"key": "a", "event_id": i, "arrival_seq": i} for i in range(5)] + [
    {"key": "b", "event_id": 100, "arrival_seq": 0}
]
B2 = [{"key": "a", "event_id": 10 + i, "arrival_seq": 10 + i} for i in range(3)]


def test_throttle_burst_refill_and_order(spark, tmp_path):
    src = tmp_path / "thr_in"
    src.mkdir()
    _write(src, "b1.json", B1)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = throttled_stream(stream, burst=3, refill=2)
    q = (
        out.writeStream.format("memory")
        .queryName("thr_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "thr_ckpt"))
        .start()
    )
    try:
        rows = _poll(spark, q, "thr_out", lambda r: len(r) >= len(B1))
        a1 = sorted((r for r in rows if r["key"] == "a"), key=lambda r: r["arrival_seq"])
        # burst=3: first three admitted in arrival order, then shed — but
        # every row is present with a verdict (no silent drop).
        assert [r["admitted"] for r in a1] == [True, True, True, False, False]
        (b1,) = [r for r in rows if r["key"] == "b"]
        assert b1["admitted"] is True  # fresh key gets its own bucket

        _write(src, "b2.json", B2)
        rows = _poll(spark, q, "thr_out", lambda r: len(r) >= len(B1) + len(B2))
        a2 = sorted(
            (r for r in rows if r["key"] == "a" and r["arrival_seq"] >= 10),
            key=lambda r: r["arrival_seq"],
        )
        # batch 2: credit 0 + refill 2 → exactly two more admitted.
        assert [r["admitted"] for r in a2] == [True, True, False]
    finally:
        q.stop()


class _FakeState:
    """Minimal GroupState stand-in for unit-testing `admit` directly
    (applyInPandasWithState has no batch mode)."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def test_admit_unit_carries_credit_across_batches():
    import pandas as pd

    from trike_spark.streaming.throttle import admit

    st = _FakeState()
    b1 = pd.DataFrame({"event_id": [0, 1, 2, 3, 4], "arrival_seq": [0, 1, 2, 3, 4]})
    (out1,) = list(admit(("a",), [b1], st, burst=3, refill=2))
    assert list(out1["admitted"]) == [True, True, True, False, False]
    assert st.get == (0,)
    b2 = pd.DataFrame({"event_id": [10, 11, 12], "arrival_seq": [10, 11, 12]})
    (out2,) = list(admit(("a",), [b2], st, burst=3, refill=2))
    assert list(out2["admitted"]) == [True, True, False]
    assert st.get == (0,)
    # idle batches re-accumulate credit only up to burst
    for _ in range(5):
        list(admit(("a",), [pd.DataFrame({"event_id": [], "arrival_seq": []})], st, burst=3, refill=2))
    assert st.get == (3,)


def test_admit_property_against_reference_model():
    """Property: for ANY batch-size sequence and (burst, refill), the
    stateful operator matches a direct simulation of the bucket algebra
    exactly — admitted counts, per-row verdicts, and carried credit."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from trike_spark.streaming.throttle import admit

    @settings(max_examples=200, deadline=None)
    @given(
        sizes=st.lists(st.integers(min_value=0, max_value=7), min_size=1, max_size=6),
        burst=st.integers(min_value=1, max_value=5),
        refill=st.integers(min_value=0, max_value=5),
    )
    def check(sizes, burst, refill):
        st_obj = _FakeState()
        credit = burst  # reference model
        seq = 0
        for bi, n in enumerate(sizes):
            if bi > 0:
                credit = min(burst, credit + refill)
            pdf = pd.DataFrame(
                {"event_id": list(range(seq, seq + n)), "arrival_seq": list(range(seq, seq + n))}
            )
            out = list(admit(("k",), [pdf], st_obj, burst=burst, refill=refill))
            admitted = list(out[0]["admitted"]) if out else []
            exp_admit = min(credit, n)
            assert admitted == [True] * exp_admit + [False] * (n - exp_admit)
            credit -= exp_admit
            assert st_obj.get == (credit,)
            seq += n

    check()
