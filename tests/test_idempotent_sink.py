"""Exactly-once archive sink: a replayed micro-batch (Spark re-runs the
last uncommitted batch after a crash) must overwrite its own output, not
append duplicates — while other batches' output stays intact."""

from __future__ import annotations

from trike_spark.streaming.sinks import IdempotentParquetSink


def test_replayed_batch_does_not_duplicate(spark, tmp_path):
    path = str(tmp_path / "archive")
    sink = IdempotentParquetSink(path)

    b0 = spark.createDataFrame([(1, "a"), (2, "b")], ["event_id", "payload"])
    b1 = spark.createDataFrame([(3, "c")], ["event_id", "payload"])

    sink(b0, 0)
    sink(b1, 1)
    # crash-recovery replay of batch 1, this time with a retry's worth of
    # the same data — must replace, not append
    sink(b1, 1)

    got = spark.read.parquet(path)
    rows = sorted((r["batch_id"], r["event_id"]) for r in got.collect())
    assert rows == [(0, 1), (0, 2), (1, 3)]


def test_other_batches_survive_dynamic_overwrite(spark, tmp_path):
    path = str(tmp_path / "archive")
    sink = IdempotentParquetSink(path)
    for i in range(3):
        sink(spark.createDataFrame([(i, f"p{i}")], ["event_id", "payload"]), i)
    # replay the middle batch only
    sink(spark.createDataFrame([(1, "p1-retry")], ["event_id", "payload"]), 1)
    got = spark.read.parquet(path)
    by_batch = {r["batch_id"]: r["payload"] for r in got.collect()}
    assert by_batch == {0: "p0", 1: "p1-retry", 2: "p2"}


def test_streaming_foreachbatch_end_to_end(spark, tmp_path):
    """Wired as a real foreachBatch sink over a bounded stream."""
    import json

    src = tmp_path / "in"
    src.mkdir()
    with open(src / "data.json", "w") as f:
        for i in range(4):
            f.write(json.dumps({"event_id": i, "payload": f"m{i}"}) + "\n")
    stream = spark.readStream.schema("event_id LONG, payload STRING").json(str(src))
    sink = IdempotentParquetSink(str(tmp_path / "archive"))
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(str(tmp_path / "archive"))
    assert sorted(r["event_id"] for r in got.collect()) == [0, 1, 2, 3]
