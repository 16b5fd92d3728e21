"""Parity test for the SPRT streaming twin: the watermarked daily stream
plus the decision sink must reproduce the batch face
``events_sprt_sequential`` row-for-row on the same bounded data."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_sprt_matches_batch_face(spark, tmp_path):
    from trike_spark.io import load_table
    from trike_spark.queries.events import (
        SPRT_DELTA,
        SPRT_LN_19,
        events_sprt_sequential,
    )
    from trike_spark.streaming.analytics import sprt_daily_stream, sprt_decision_sink

    batch = {tuple(r) for r in events_sprt_sequential(spark, SF_DIR).collect()}

    # frozen H0 rate = the A arm's pooled purchase share, same as the face
    from trike_spark.queries.dedup import _h60

    e = load_table(spark, SF_DIR, "events")
    draw = _h60(F.col("user_id").cast("string")) % 100
    p0 = (
        e.filter(draw < 50)
        .agg(
            (
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("p0")
        )
        .collect()[0]["p0"]
    )

    src = tmp_path / "sprt_events"
    e.write.parquet(str(src))
    stream = spark.readStream.schema(e.schema).parquet(str(src))
    daily = sprt_daily_stream(stream)
    target = str(tmp_path / "sprt_decisions")
    q = (
        daily.writeStream.outputMode("complete")
        .foreachBatch(sprt_decision_sink(target, p0, SPRT_DELTA, SPRT_LN_19))
        .option("checkpointLocation", str(tmp_path / "ckpt_sprt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # decision table lands as a versioned snapshot (lakehouse default):
    # read via read_version; history gives the when-did-we-cross audit
    from trike_spark import versioned as V

    got = {tuple(r) for r in V.read_version(spark, target).collect()}
    assert got == batch
    assert V.history(target), "no versioned snapshot committed"
