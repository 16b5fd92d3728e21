"""Archive → replay loop (entry point C, reference kinesis_source.ex):
stream events to a parquet archive, batch-read it back, re-emit ×scale —
the Spark shape of `mix kinesis_source --scale`."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from trike_spark.streaming.sources import fake_chunk_stream, replay_scaled


def test_archive_then_scaled_replay(spark, tmp_path):
    archive = str(tmp_path / "archive")
    chunks = fake_chunk_stream(spark, rows_per_second=20)
    q = (
        chunks.writeStream.format("parquet")
        .option("path", archive)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            try:
                n = spark.read.parquet(archive).count()
            except Exception:
                n = 0
            if n >= 10:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert n >= 10
    archived = spark.read.parquet(archive)
    replayed = replay_scaled(archived, raw_col="chunk", scale=3)
    assert replayed.count() == archived.count() * 3
    # duplicates are real copies of the payload (kinesis_source.ex:129-147)
    one = archived.select("chunk").first()["chunk"]
    assert replayed.filter(F.col("chunk") == one).count() >= 3
