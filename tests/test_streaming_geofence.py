"""Parity test for the geofence streaming twin: the watermarked
stream-static containment + stateful rollup must reproduce the batch face
row-for-row on the same bounded data (complete-mode read)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_geofence_matches_batch_face(spark, tmp_path):
    from trike_spark.io import load_table
    from trike_spark.queries.events import events_geofence_entries
    from trike_spark.streaming.geofence import geofence_entries_stream

    batch = {tuple(r) for r in events_geofence_entries(spark, SF_DIR).collect()}
    assert batch, "batch face returned no rows at the smoke scale"

    zones = load_table(spark, SF_DIR, "region").select(
        F.col("r_regionkey").alias("zone_id"),
        (F.col("r_regionkey") * 150000).alias("xmin"),
        (F.col("r_regionkey") * 150000 + 120000).alias("xmax"),
        (100000 + F.col("r_regionkey") * 120000).alias("ymin"),
        (200000 + F.col("r_regionkey") * 120000).alias("ymax"),
    )
    e = load_table(spark, SF_DIR, "events")
    src = tmp_path / "geo_events"
    e.write.parquet(str(src))
    stream = spark.readStream.schema(e.schema).parquet(str(src))
    out = geofence_entries_stream(stream, zones)
    q = (
        out.writeStream.format("memory")
        .queryName("geo_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_geo"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM geo_out").collect()}
    assert got == batch
