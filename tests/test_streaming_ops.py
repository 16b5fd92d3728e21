"""Additional streaming-operator coverage: dropDuplicates within a
watermark, and a stream-stream time-bounded join (SURVEY.md §2.6
"Streaming")."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("ts", TimestampType()),
        StructField("tag", StringType()),
    ]
)

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


def _write(src, name, rows):
    with open(src / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _poll(spark, q, table, pred, timeout=90):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if q.exception():
            raise AssertionError(str(q.exception()))
        rows = spark.table(table).collect()
        if pred(rows):
            return rows
        time.sleep(1)
    raise AssertionError(f"timeout; rows={spark.table(table).collect()}")


def test_streaming_dropduplicates_within_watermark(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write(
        src,
        "b1.json",
        [
            {"k": 1, "ts": "2024-01-01T10:00:00.000Z", "tag": "first"},
            {"k": 1, "ts": "2024-01-01T10:00:30.000Z", "tag": "dup-same-batch"},
            {"k": 2, "ts": "2024-01-01T10:01:00.000Z", "tag": "other"},
        ],
    )
    stream = (
        spark.readStream.schema(SCHEMA).option("timestampFormat", TS_FMT).json(str(src))
    )
    dedup = stream.withWatermark("ts", "10 minutes").dropDuplicates(["k"])
    q = (
        dedup.writeStream.format("memory")
        .queryName("dd_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        rows = _poll(spark, q, "dd_out", lambda rows: len({r["k"] for r in rows}) >= 2)
        # later duplicate arrives in a second batch — still suppressed
        _write(src, "b2.json", [{"k": 1, "ts": "2024-01-01T10:02:00.000Z", "tag": "dup-later-batch"}])
        time.sleep(4)
        rows = spark.table("dd_out").collect()
        per_key = {}
        for r in rows:
            per_key.setdefault(r["k"], []).append(r["tag"])
        assert len(per_key[1]) == 1, per_key
        assert len(per_key[2]) == 1
    finally:
        q.stop()


def test_stream_stream_join_time_bounded(spark, tmp_path):
    left_src = tmp_path / "left"
    right_src = tmp_path / "right"
    left_src.mkdir()
    right_src.mkdir()
    _write(
        left_src,
        "l1.json",
        [
            {"k": 1, "ts": "2024-01-01T10:00:00.000Z", "tag": "click"},
            {"k": 2, "ts": "2024-01-01T10:00:00.000Z", "tag": "click"},
        ],
    )
    _write(
        right_src,
        "r1.json",
        [
            {"k": 1, "ts": "2024-01-01T10:03:00.000Z", "tag": "purchase-in-window"},
            {"k": 2, "ts": "2024-01-01T11:30:00.000Z", "tag": "purchase-too-late"},
        ],
    )
    left = (
        spark.readStream.schema(SCHEMA).option("timestampFormat", TS_FMT).json(str(left_src))
    ).withWatermark("ts", "1 hour").select(F.col("k"), F.col("ts").alias("l_ts"))
    right = (
        spark.readStream.schema(SCHEMA).option("timestampFormat", TS_FMT).json(str(right_src))
    ).withWatermark("ts", "1 hour").select(F.col("k").alias("rk"), F.col("ts").alias("r_ts"))
    # purchase must follow the click within 10 minutes
    joined = left.join(
        right,
        (F.col("k") == F.col("rk"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 10 MINUTES")),
    ).select("k", "l_ts", "r_ts")
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        rows = _poll(spark, q, "ss_out", lambda rows: len(rows) >= 1)
        ks = {r["k"] for r in rows}
        assert ks == {1}, rows  # k=2's purchase fell outside the join window
    finally:
        q.stop()
