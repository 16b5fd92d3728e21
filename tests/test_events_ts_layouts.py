"""Schema-drift contract for the events table's ts column.

The driver's testdata generator has shipped events.parquet in two layouts:
TIMESTAMP(NANOS) (round ≤2; arrives as bigint under the nanosAsLong legacy
conf) and TIMESTAMP(MICROS) (round 3+; arrives as timestamp_ntz). Round 3
went red because load_table assumed the nanos layout. This test pins the
contract: ``load_table`` must return a plain micros TIMESTAMP column with
identical values for BOTH layouts, so a driver-side regeneration can never
again take out the events family at plan build.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from trike_spark.io import load_table

UTC = datetime.timezone.utc

# Micro-precision instants (the synthetic data is micro-precision, so the
# nanos layout is an exact 1000× blow-up of the micros layout).
TS_MICROS = [
    1_700_000_000_000_000,  # 2023-11-14 22:13:20 UTC
    1_700_000_123_456_789,
    1_700_086_400_000_000,
]


def _write_events(tmp_path, unit: str):
    (tmp_path / f"events_{unit}").mkdir(exist_ok=True)
    path = str(tmp_path / f"events_{unit}" / "events.parquet")
    factor = 1000 if unit == "ns" else 1
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([t * factor for t in TS_MICROS], pa.timestamp(unit)),
            "user_id": pa.array([10, 11, 10], pa.int64()),
            "event_type": pa.array(["click", "view", "click"], pa.string()),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(['{"a":1}', "{}", '{"b":2}'], pa.string()),
        }
    )
    pq.write_table(table, path)
    return str(tmp_path / f"events_{unit}")


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_load_table_normalizes_both_ts_layouts(spark, tmp_path, unit):
    sf_dir = _write_events(tmp_path, unit)
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", (
        f"{unit} layout must load as plain TIMESTAMP, got {dict(df.dtypes)['ts']}"
    )
    rows = {r.event_id: r.ts for r in df.select("event_id", "ts").collect()}
    expected = {
        i + 1: datetime.datetime.fromtimestamp(t / 1e6, tz=UTC).replace(tzinfo=None)
        for i, t in enumerate(TS_MICROS)
    }
    assert rows == expected


def test_both_layouts_agree(spark, tmp_path):
    d_us = _write_events(tmp_path, "us")
    d_ns = _write_events(tmp_path, "ns")
    a = load_table(spark, d_us, "events").select("event_id", "ts").collect()
    b = load_table(spark, d_ns, "events").select("event_id", "ts").collect()
    assert sorted(a) == sorted(b)
