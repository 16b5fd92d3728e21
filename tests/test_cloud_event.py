"""Golden-parity tests for the CloudEvent projection against the
reference's frozen-clock fixtures (FIXTURES.md §A.2; reference
test/proxy_test.exs:61-83, test/cloud_event_test.exs:5-24)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trike_spark.functions.cloud_event import cloud_event_struct, event_id

FROZEN = "2021-08-13 12:00:00"  # fake_datetime.ex:7
MSG1 = "4994,TSCH,02:00:06,R,RLD,W"
MSG2 = "4995,TSCH,03:00:06,R,RLD,W"
GOLDEN_ID1 = "myH7tTFo1tuZdSXxQ/5QFA4Xx58="  # proxy_test.exs:67
GOLDEN_ID2 = "O7ODUPlPMM089UZL1YLYpFIZzeo="  # proxy_test.exs:79

GOLDEN_JSON1 = (
    '{"data":{"raw":"4994,TSCH,02:00:06,R,RLD,W"},'
    f'"id":"{GOLDEN_ID1}",'
    '"partitionkey":"test_key",'
    '"source":"<hostname>.mbta.com/trike",'
    '"sourceip":"",'
    '"specversion":"1.0",'
    '"time":"2021-08-13T12:00:00Z",'
    '"type":"com.mbta.ocs.raw_message"}'
)


def _event(spark, raw):
    df = spark.createDataFrame([(raw,)], ["raw"])
    return df.select(
        cloud_event_struct(
            raw=F.col("raw"),
            partition_key=F.lit("test_key"),
            time=F.lit(FROZEN).cast("timestamp"),
            source_ip=F.lit(""),
            source="<hostname>.mbta.com/trike",
        ).alias("event")
    )


def test_event_id_matches_reference_sha1(spark):
    df = spark.createDataFrame([(MSG1,), (MSG2,)], ["raw"])
    ids = [
        r["id"]
        for r in df.select(
            event_id(F.col("raw"), F.lit(FROZEN).cast("timestamp")).alias("id")
        ).collect()
    ]
    assert ids == [GOLDEN_ID1, GOLDEN_ID2]


def test_cloud_event_json_golden(spark):
    """Byte-identical to the reference's Jason encoding: alphabetical keys,
    Z-suffixed ISO-8601, base64 SHA-1 id (proxy_test.exs:67)."""
    out = _event(spark, MSG1).select(F.to_json(F.col("event")).alias("j")).collect()
    assert out[0]["j"] == GOLDEN_JSON1


def test_packet_batch_is_json_array(spark):
    """One TCP packet with two messages → ONE record that is a JSON array
    of both events (proxy_test.exs:73-83)."""
    df = spark.createDataFrame([(MSG1,), (MSG2,)], ["raw"])
    events = df.select(
        cloud_event_struct(
            raw=F.col("raw"),
            partition_key=F.lit("test_key"),
            time=F.lit(FROZEN).cast("timestamp"),
            source_ip=F.lit(""),
            source="<hostname>.mbta.com/trike",
        ).alias("event")
    )
    rec = events.agg(F.to_json(F.sort_array(F.collect_list("event"))).alias("r")).collect()[0]["r"]
    assert rec.startswith("[{") and rec.endswith("}]")
    assert GOLDEN_ID1 in rec and GOLDEN_ID2 in rec
    assert rec.index(GOLDEN_ID1) < rec.index(GOLDEN_ID2)
