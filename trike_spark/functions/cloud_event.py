"""CloudEvent projection — trike's F3 operator as pure column expressions
(reference lib/trike/cloud_event.ex:8-40).

Field semantics, field-for-field:
  * ``specversion`` = "1.0", ``type`` = "com.mbta.ocs.raw_message"
    (cloud_event.ex:25)
  * ``source`` = "<hostname>.mbta.com/trike" (cloud_event.ex:23) —
    parameterized here
  * ``id`` = base64(sha1(iso8601(time) <> raw)) (cloud_event.ex:34)
  * ``partitionkey`` = connection string (proxy.ex:219-228)
  * ``time`` = ingest wall clock, injectable for tests (proxy.ex:150, :25)
  * ``data.raw`` = the opaque OCS payload (ocs_raw_message.ex:5-8)

Everything is a JVM-side built-in expression — the projection fuses into
whole-stage codegen with the surrounding plan; no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SPECVERSION = "1.0"
EVENT_TYPE = "com.mbta.ocs.raw_message"
HEARTBEAT = "HEARTBEAT"  # config/config.exs:21
EOT = "\x04"  # proxy.ex:42

# Matches Elixir DateTime.to_iso8601 for second-precision UTC datetimes
# (the reference's frozen test clock, fake_datetime.ex:7). Microsecond
# inputs would need the fractional pattern; trike's golden fixtures are
# whole-second.
_ISO8601 = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def event_id(raw: Column, time: Column, algo: str = "sha1") -> Column:
    """Deterministic id = base64(hash(iso8601(time) || raw)).

    ``sha1`` matches the reference byte-for-byte (cloud_event.ex:34);
    ``md5`` is the DuckDB-oracle-checkable variant (DuckDB 1.0 has no sha1).
    """
    payload = F.concat(F.date_format(time, _ISO8601), raw)
    if algo == "sha1":
        return F.base64(F.unhex(F.sha1(payload)))
    if algo == "md5":
        return F.base64(F.unhex(F.md5(payload)))
    raise ValueError(f"unsupported id algo {algo!r}")


def cloud_event_columns(
    raw: Column,
    partition_key: Column,
    time: Column,
    source_ip: Column,
    source: str = "trike-spark.local/trike",
    id_algo: str = "sha1",
) -> list[Column]:
    """Flat CloudEvent columns (alphabetical, minus the data struct —
    ``raw`` stands flat). Used by oracle-checked batch queries."""
    return [
        raw.alias("raw"),
        event_id(raw, time, id_algo).alias("id"),
        partition_key.alias("partitionkey"),
        F.lit(source).alias("source"),
        source_ip.alias("sourceip"),
        F.lit(SPECVERSION).alias("specversion"),
        time.alias("time"),
        F.lit(EVENT_TYPE).alias("type"),
    ]


def cloud_event_struct(
    raw: Column,
    partition_key: Column,
    time: Column,
    source_ip: Column,
    source: str = "trike-spark.local/trike",
    id_algo: str = "sha1",
) -> Column:
    """Nested CloudEvent struct with ALPHABETICAL field order so
    ``to_json`` emits keys exactly like the reference's Jason encoding
    (test/proxy_test.exs:67): data, id, partitionkey, source, sourceip,
    specversion, time, type."""
    return F.struct(
        F.struct(raw.alias("raw")).alias("data"),
        event_id(raw, time, id_algo).alias("id"),
        partition_key.alias("partitionkey"),
        F.lit(source).alias("source"),
        source_ip.alias("sourceip"),
        F.lit(SPECVERSION).alias("specversion"),
        F.date_format(time, _ISO8601).alias("time"),
        F.lit(EVENT_TYPE).alias("type"),
    )
