"""Watermark / late-data handling over a streamed ``events``-shaped source
(SURVEY.md §2.6 "Streaming": withWatermark + windowed agg; late rows beyond
the watermark are dropped)."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _write(src, name, rows):
    with open(src / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_late_event_dropped_beyond_watermark(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    # batch 1: events at 10:00 and 12:00 → watermark advances to 12:00-10min
    _write(
        src,
        "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T10:00:00.000Z", "user_id": 1, "event_type": "click", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-01T12:00:00.000Z", "user_id": 1, "event_type": "click", "value": 1.0},
        ],
    )
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_out")
        .outputMode("append")  # append emits only windows sealed by the watermark
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )

    def wait_rows(pred, timeout=90):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if q.exception():
                raise AssertionError(str(q.exception()))
            rows = spark.table("wm_out").collect()
            if pred(rows):
                return rows
            time.sleep(1)
        raise AssertionError(f"timeout; rows={spark.table('wm_out').collect()}")

    try:
        # a late event at 09:30 (window 09:00) arrives AFTER the watermark
        # passed 11:50 → must be dropped, so window 09:00 never appears;
        # window 10:00 seals (1 event), the late one doesn't resurrect 09:00
        _write(
            src,
            "b2.json",
            [{"event_id": 3, "ts": "2024-01-01T09:30:00.000Z", "user_id": 1, "event_type": "click", "value": 1.0}],
        )
        # push the watermark far forward so earlier windows seal
        _write(
            src,
            "b3.json",
            [{"event_id": 4, "ts": "2024-01-01T15:00:00.000Z", "user_id": 1, "event_type": "click", "value": 1.0}],
        )
        rows = wait_rows(lambda rows: len(rows) >= 2)
        starts = {r["window_start"].strftime("%H:%M"): r["n"] for r in rows}
        assert starts.get("10:00") == 1
        assert starts.get("12:00") == 1
        assert "09:00" not in starts  # late event beyond watermark dropped
    finally:
        q.stop()
