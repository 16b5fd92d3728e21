"""CSV parse-mode contract (the batch analog of the streaming source's
corruption injection): the same malformed file must behave per mode —
PERMISSIVE nulls + captures the bad row, DROPMALFORMED silently drops
it, FAILFAST refuses the read. Pinning this protects every CSV ingest
path from a silently-lossy default."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

CSV = """id,qty,name
1,10,alpha
2,notanumber,beta
3,30,gamma
"""

SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("qty", IntegerType()),
        StructField("name", StringType()),
        StructField("_corrupt_record", StringType()),
    ]
)


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text(CSV)
    return str(p)


def test_permissive_nulls_and_captures(spark, csv_path):
    df = (
        spark.read.option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(SCHEMA)
        .csv(csv_path)
    )
    rows = {r.id: r for r in df.collect()}
    assert rows[1].qty == 10 and rows[1]._corrupt_record is None
    assert rows[2].qty is None  # unparseable cell nulled
    assert "notanumber" in rows[2]._corrupt_record  # raw line preserved
    assert rows[3].qty == 30


def test_dropmalformed_drops_silently(spark, csv_path):
    schema = StructType(SCHEMA.fields[:3])
    df = (
        spark.read.option("header", "true")
        .option("mode", "DROPMALFORMED")
        .schema(schema)
        .csv(csv_path)
    )
    assert sorted(r.id for r in df.collect()) == [1, 3]


def test_failfast_raises(spark, csv_path):
    schema = StructType(SCHEMA.fields[:3])
    df = (
        spark.read.option("header", "true")
        .option("mode", "FAILFAST")
        .schema(schema)
        .csv(csv_path)
    )
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        df.collect()
