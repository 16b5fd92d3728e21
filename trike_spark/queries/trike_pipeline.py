"""Batch-checkable faces of the trike ingest pipeline (SURVEY.md §2.2-2.4).

The ``events`` table stands in for the TCP message stream: ``user_id`` ↔
connection / partition key, ``event_type`` ↔ payload (with one type playing
the heartbeat), ``ts`` ↔ packet arrival clock. The streaming versions in
``trike_spark.streaming`` reuse the same column expressions; proving them
here against the oracle proves the per-row semantics.

The CloudEvent id formula is the reference's
``base64(sha1(iso8601(time) <> raw))`` (cloud_event.ex:34); DuckDB has no
sha1, so the oracle-checked variant uses md5 and the sha1 golden parity is
covered by tests/test_cloud_event.py against the reference fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trike_spark.functions.cloud_event import cloud_event_columns
from trike_spark.io import load_table
from trike_spark.registry import register

# events stand-in wiring
_RAW = "event_type || ',' || CAST(value AS VARCHAR)"
_PKEY = "'conn-' || CAST(user_id % 8 AS VARCHAR)"
_FROZEN = "2021-08-13 12:00:00"  # reference test clock, fake_datetime.ex:7


@register(
    "trike_cloud_event_project",
    f"""
    SELECT event_id,
           {_RAW} AS raw,
           to_base64(from_hex(md5('2021-08-13T12:00:00Z' || ({_RAW})))) AS id,
           {_PKEY} AS partitionkey,
           'trike-spark.local/trike' AS source,
           '' AS sourceip,
           '1.0' AS specversion,
           TIMESTAMP '{_FROZEN}' AS time,
           'com.mbta.ocs.raw_message' AS type
    FROM events
    """,
    doc="CloudEvent projection F3 (md5-id variant for the oracle; sha1 golden parity in tests).",
)
def trike_cloud_event_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    raw = F.concat(F.col("event_type"), F.lit(","), F.col("value").cast("string"))
    pkey = F.concat(F.lit("conn-"), (F.col("user_id") % 8).cast("string"))
    cols = cloud_event_columns(
        raw=raw,
        partition_key=pkey,
        time=F.lit(_FROZEN).cast("timestamp"),
        source_ip=F.lit(""),
        source="trike-spark.local/trike",
        id_algo="md5",
    )
    return e.select("event_id", *cols)


@register(
    "trike_heartbeat_filter",
    """
    SELECT event_id, user_id, event_type, ts
    FROM events WHERE event_type <> 'view'
    """,
    doc="Heartbeat filter F2: drop heartbeat-typed messages ('view' plays HEARTBEAT).",
)
def trike_heartbeat_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.filter(F.col("event_type") != "view").select(
        "event_id", "user_id", "event_type", "ts"
    )


@register(
    "trike_batch_encode",
    f"""
    SELECT {_PKEY} AS partitionkey,
           to_json(list(struct_pack(event_id := event_id, raw := {_RAW})
                        ORDER BY event_id)) AS record,
           COUNT(*) AS n_events
    FROM events
    GROUP BY partitionkey
    """,
    doc="Batch-encode F4: all events of one key → one JSON-array record (proxy.ex:164-175).",
)
def trike_batch_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    raw = F.concat(F.col("event_type"), F.lit(","), F.col("value").cast("string"))
    pkey = F.concat(F.lit("conn-"), (F.col("user_id") % 8).cast("string"))
    return (
        e.select(pkey.alias("partitionkey"), F.struct(F.col("event_id"), raw.alias("raw")).alias("ev"))
        .groupBy("partitionkey")
        .agg(
            F.to_json(F.array_sort(F.collect_list("ev"))).alias("record"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "trike_stale_sessions",
    f"""
    WITH keyed AS (
      SELECT {_PKEY} AS partitionkey, ts, event_type FROM events),
    flagged AS (
      SELECT partitionkey, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts >= lag(ts) OVER w + INTERVAL '5 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM keyed WINDOW w AS (PARTITION BY partitionkey ORDER BY ts)),
    numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY partitionkey ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged)
    SELECT partitionkey, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '5 minutes' AS stale_deadline,
           COUNT(*) AS n_messages,
           COUNT(*) FILTER (WHERE event_type <> 'view') AS n_forwarded
    FROM numbered GROUP BY partitionkey, session_id
    """,
    doc="Stale-session timeout T1: 5-min gap sessions; timer resets on ALL traffic "
    "(heartbeats included) but heartbeats aren't forwarded (proxy_test.exs:128-145).",
)
def trike_stale_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The load-bearing trike subtlety: the session is keyed on PRE-filter
    traffic (heartbeats keep it alive), while the forwarded count excludes
    heartbeats — so we sessionize first, filter inside the aggregate."""
    e = load_table(spark, sf_dir, "events")
    pkey = F.concat(F.lit("conn-"), (F.col("user_id") % 8).cast("string"))
    keyed = e.select(pkey.alias("partitionkey"), "ts", "event_type")
    return (
        keyed.groupBy("partitionkey", F.session_window("ts", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_messages"),
            F.count_if(F.col("event_type") != "view").alias("n_forwarded"),
        )
        .select(
            "partitionkey",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("stale_deadline"),
            "n_messages",
            "n_forwarded",
        )
    )
