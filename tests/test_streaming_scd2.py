"""Streaming SCD2 maintenance (streaming/scd2.py): the closed intervals a
stateful stream emits must equal the batch face's closed intervals on the
same data, and state must carry the open interval across micro-batches."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from trike_spark.queries.events import events_scd2_intervals
from trike_spark.streaming.scd2 import scd2_stream

SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string"
TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"

B1 = [
    {"event_id": 1, "ts": "2024-01-01T10:00:00.000Z", "user_id": 1, "event_type": "view"},
    {"event_id": 2, "ts": "2024-01-01T10:01:00.000Z", "user_id": 1, "event_type": "view"},
    {"event_id": 3, "ts": "2024-01-01T10:02:00.000Z", "user_id": 1, "event_type": "click"},
    {"event_id": 4, "ts": "2024-01-01T10:00:30.000Z", "user_id": 2, "event_type": "error"},
]
B2 = [
    # closes user 1's click run and user 2's error run across the batch gap
    {"event_id": 5, "ts": "2024-01-01T10:05:00.000Z", "user_id": 1, "event_type": "view"},
    {"event_id": 6, "ts": "2024-01-01T10:06:00.000Z", "user_id": 2, "event_type": "click"},
]


def _write(src, name, rows):
    with open(src / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streaming_scd2_matches_batch_closed_intervals(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write(src, "b1.json", B1)
    _write(src, "b2.json", B2)

    stream = (
        spark.readStream.schema(SCHEMA).option("timestampFormat", TS_FMT).json(str(src))
    )
    q = (
        scd2_stream(stream)
        .writeStream.format("memory")
        .queryName("scd2_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(90)
        got = {
            (r["user_id"], r["event_type"], r["valid_from"], r["valid_to"], r["n_events"])
            for r in spark.table("scd2_out").collect()
        }
    finally:
        q.stop()

    batch = spark.createDataFrame(
        [
            (r["event_id"], r["ts"].replace("Z", ""), r["user_id"], r["event_type"])
            for r in B1 + B2
        ],
        "event_id bigint, ts_s string, user_id bigint, event_type string",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type")
    batch.createOrReplaceTempView("_scd2_fixture")

    # the batch face's CLOSED intervals (valid_to not null) on the same rows
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    marked = batch.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0).alias("chg"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("user_n"),
    )
    starts = marked.filter(F.col("chg") == 1)
    expected = {
        (r["user_id"], r["event_type"], r["valid_from"], r["valid_to"], r["n_events"])
        for r in starts.select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            (F.coalesce(F.lead("rn").over(w), F.col("user_n") + 1) - F.col("rn"))
            .cast("bigint")
            .alias("n_events"),
        ).collect()
        if r["valid_to"] is not None
    }
    assert expected, "fixture must close at least one interval"
    assert got == expected

    # cross-batch continuity: user 1's first view run (2 events) closed by
    # the click INSIDE b1; the click run closed by b2's view
    u1 = sorted((t for t in got if t[0] == 1), key=lambda t: t[2])
    assert [t[1] for t in u1] == ["view", "click"]
    assert u1[0][4] == 2  # the two views collapsed into one interval


def test_streaming_scd2_consistent_with_registered_batch_face(spark, tmp_path):
    """On the real sf0.001 events table (streamed from parquet), the
    emitted closed intervals must equal the registered batch face's
    closed subset."""
    sf = "/root/testdata/sf0.001"
    face = events_scd2_intervals(spark, sf)
    closed_batch = {
        (r["user_id"], r["event_type"], r["valid_from"], r["valid_to"], r["n_events"])
        for r in face.collect()
        if r["valid_to"] is not None
    }
    from trike_spark.io import load_table

    src = str(tmp_path / "events_src")
    load_table(spark, sf, "events").select(
        "event_id", "ts", "user_id", "event_type"
    ).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        scd2_stream(stream)
        .writeStream.format("memory")
        .queryName("scd2_real")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_real"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
        got = {
            (r["user_id"], r["event_type"], r["valid_from"], r["valid_to"], r["n_events"])
            for r in spark.table("scd2_real").collect()
        }
    finally:
        q.stop()
    assert got == closed_batch


def test_streaming_scd2_survives_restart(spark, tmp_path):
    """Kill the query between micro-batches and resume from the
    checkpoint: state (the open interval) must carry across the restart —
    no lost closures, no duplicates."""
    src = tmp_path / "in"
    src.mkdir()
    _write(src, "b1.json", B1)

    stream = (
        spark.readStream.schema(SCHEMA).option("timestampFormat", TS_FMT).json(str(src))
    )
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")  # file sink: supports checkpoint recovery

    def run_until_idle():
        q = (
            scd2_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(90)
        q.stop()

    run_until_idle()
    first = {tuple(r) for r in spark.read.parquet(out).collect()}

    _write(src, "b2.json", B2)
    run_until_idle()  # resumed from the same checkpoint
    second = {tuple(r) for r in spark.read.parquet(out).collect()} - first

    # b2 closes user1's click run (opened in b1) and user2's error run —
    # possible only if the open-interval state survived the restart
    closed_after_restart = {(t[0], t[1], t[4]) for t in second}
    assert (1, "click", 1) in closed_after_restart
    assert (2, "error", 1) in closed_after_restart
    # pre-restart emissions appear exactly once (no replay duplicates)
    all_rows = spark.read.parquet(out).collect()
    assert len(all_rows) == len({tuple(r) for r in all_rows})
