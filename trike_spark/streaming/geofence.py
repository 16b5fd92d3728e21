"""Streaming geofence entry detection — the streaming twin of the batch
face ``queries/events.py::events_geofence_entries``, and the closest
thing in this engine to what the reference's transit domain consumes
downstream: vehicle/user positions stream in, zones are a tiny static
dimension, alerts fire per (user, zone).

Split exactly like the other twins: containment against the BROADCAST
zone table is a narrow stream-static join (no state), and the
first-entry/ping-count rollup is ONE watermarked stateful aggregation
keyed on (user, zone) — state is O(live user-zone pairs), bounded by the
watermark. Works on a static DataFrame too (same plan), which the parity
test exploits for an exact batch-vs-stream comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trike_spark.queries.dedup import _h60
from trike_spark.queries.events import GEO_PLANE_M


def geofence_entries_stream(
    events: DataFrame, zones: DataFrame, watermark: str = "2 days"
) -> DataFrame:
    """(user_id, zone_id, first_entry_ts, n_pings_inside) over a ping
    stream: identical semantics to the batch face — MIN event time and
    ping count per (user, zone) — with the rollup running as watermarked
    streaming state. ``zones`` must carry (zone_id, xmin, xmax, ymin,
    ymax); it is broadcast, as any real zone dimension would be."""
    pos = events.withWatermark("ts", watermark).select(
        "user_id",
        "ts",
        (
            _h60(F.concat(F.lit("px"), F.col("event_id").cast("string")))
            % GEO_PLANE_M
        ).alias("x"),
        (
            _h60(F.concat(F.lit("py"), F.col("event_id").cast("string")))
            % GEO_PLANE_M
        ).alias("y"),
    )
    hits = pos.join(
        F.broadcast(zones),
        (pos.x >= zones.xmin)
        & (pos.x < zones.xmax)
        & (pos.y >= zones.ymin)
        & (pos.y < zones.ymax),
    )
    return hits.groupBy("user_id", "zone_id").agg(
        F.min("ts").alias("first_entry_ts"),
        F.count(F.lit(1)).cast("bigint").alias("n_pings_inside"),
    )
