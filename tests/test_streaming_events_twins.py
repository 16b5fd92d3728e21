"""Streaming twins for the last two events-family batch faces without one:
the per-user activity pivot and the click→purchase interval join (r3
verdict item 8). Each twin runs Structured Streaming over the SAME parquet
fixture its batch face reads, and asserts row-for-row parity with the
registered batch query — the same batch/streaming symmetry contract the
sketch/curation families carry (tests/test_streaming_analytics.py).

Semantics notes:
  * Streaming has no ``pivot()`` — the twin is conditional aggregation
    (count-when per event type), exactly the single-pass Expand-free plan
    the batch face compiles to; outputMode("complete") because the
    aggregation is global-per-key (no watermark column in the group).
  * The interval join is the canonical stream-stream shape: equality key +
    event-time range bound; watermarks on both sides let the engine expire
    join state — the property that makes it runnable on an unbounded
    stream, asserted here by checking the range condition appears in the
    join (not a cross product).
"""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from trike_spark.queries.events import (
    events_interval_join_click_purchase,
    events_user_activity_pivot,
)

US = 1_000_000
T0 = 1_700_000_000 * US  # 2023-11-14 22:13:20 UTC

EVENTS = [
    # (event_id, ts_us, user_id, event_type, value)
    (1, T0, 1, "click", 1.0),
    (2, T0 + 10 * 60 * US, 1, "purchase", 9.9),          # 10 min after click → in window
    (3, T0 + 2 * 3600 * US, 1, "purchase", 5.0),          # 2 h after click → out
    (4, T0, 2, "click", 1.0),
    (5, T0 + 3599 * US, 2, "purchase", 2.0),              # 59:59 after click → in
    (6, T0 + 60 * US, 2, "view", 0.0),
    (7, T0 + 120 * US, 3, "view", 0.0),
    (8, T0 + 180 * US, 3, "signup", 0.0),
    (9, T0 + 240 * US, 3, "error", 0.0),
    (10, T0 + 300 * US, 1, "click", 1.0),                 # second click; purchase 2 in window
]


def _events_fixture(tmp_path) -> str:
    d = tmp_path / "sf_fixture"
    d.mkdir()
    table = pa.table(
        {
            "event_id": pa.array([e[0] for e in EVENTS], pa.int64()),
            "ts": pa.array([e[1] for e in EVENTS], pa.timestamp("us")),
            "user_id": pa.array([e[2] for e in EVENTS], pa.int64()),
            "event_type": pa.array([e[3] for e in EVENTS], pa.string()),
            "value": pa.array([e[4] for e in EVENTS], pa.float64()),
            "props": pa.array(["{}"] * len(EVENTS), pa.string()),
        }
    )
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


def _read_events_stream(spark, sf_dir):
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    return spark.readStream.schema(schema).parquet(sf_dir)


def _await(q, name, spark, n_rows, timeout=90):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if q.exception():
            raise AssertionError(str(q.exception()))
        rows = spark.table(name).collect()
        if len(rows) >= n_rows and not q.status["isDataAvailable"]:
            return rows
        time.sleep(1)
    raise AssertionError(f"timeout; rows={spark.table(name).collect()}")


def test_streaming_pivot_twin_matches_batch_face(spark, tmp_path):
    sf_dir = _events_fixture(tmp_path)
    batch = {
        tuple(r) for r in events_user_activity_pivot(spark, sf_dir).collect()
    }

    types = ["click", "view", "purchase", "signup", "error"]
    stream = _read_events_stream(spark, sf_dir)
    pivoted = stream.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
            for t in types
        ]
    )
    q = (
        pivoted.writeStream.format("memory")
        .queryName("pivot_twin")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_pivot"))
        .start()
    )
    try:
        rows = _await(q, "pivot_twin", spark, n_rows=3)
        assert {tuple(r) for r in rows} == batch
    finally:
        q.stop()


def test_streaming_interval_join_twin_matches_batch_face(spark, tmp_path):
    sf_dir = _events_fixture(tmp_path)
    batch = {
        tuple(r)
        for r in events_interval_join_click_purchase(spark, sf_dir).collect()
    }
    assert batch, "fixture must produce at least one in-window pair"

    stream = _read_events_stream(spark, sf_dir)
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("c_ts"),
        )
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") < F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ij_twin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ij"))
        .start()
    )
    try:
        rows = _await(q, "ij_twin", spark, n_rows=len(batch))
        assert {tuple(r) for r in rows} == batch
    finally:
        q.stop()
