"""Source/sink connector coverage: CSV, JSON, partitioned parquet with
partition pruning (SURVEY.md §2.1/§2.3 extension surface)."""

from __future__ import annotations

from trike_spark import plans
from trike_spark.io import (
    load_table,
    read_csv,
    read_json,
    write_csv,
    write_json,
    write_parquet,
)

SF_DIR = "/root/testdata/sf0.001"


def test_csv_round_trip(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    path = str(tmp_path / "orders_csv")
    write_csv(orders, path)
    back = read_csv(spark, path, schema="o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
    assert back.count() == orders.count()
    assert back.schema == orders.schema


def test_json_round_trip(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "event_type", "value")
    path = str(tmp_path / "events_json")
    write_json(ev, path)
    back = read_json(spark, path, schema="event_id BIGINT, event_type STRING, value DOUBLE")
    assert back.count() == ev.count()


def test_partitioned_parquet_prunes(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_part")
    write_parquet(orders, path, partition_by=["o_orderstatus"])
    back = spark.read.parquet(path).filter("o_orderstatus = 'F'")
    plan = plans.formatted_plan(back)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters", 1)[1][:200]
    total = spark.read.parquet(path).count()
    f_only = back.count()
    assert 0 < f_only < total


def test_csv_codec_contract_lossless_for_hostile_strings(spark, tmp_path):
    """The scan-face CSV options (queries/scans.py) must round-trip ANY
    string content — leading/trailing whitespace, embedded newlines and
    quotes, empty-vs-null — bit-for-bit (round-2 advice: writer defaults
    trim whitespace and the reader nulls empty strings)."""
    from trike_spark.queries.scans import _CSV_READ_OPTS, _CSV_WRITE_OPTS

    rows = [
        (1, "  leading spaces"),
        (2, "trailing spaces  "),
        (3, "embedded\nnewline"),
        (4, 'quote " and, comma'),
        (5, ""),
        (6, None),
        (7, "\\N literal backslash-N"),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    path = str(tmp_path / "csv_hostile")
    df.write.mode("overwrite").options(**_CSV_WRITE_OPTS).csv(path)
    back = spark.read.schema("id bigint, text string").options(**_CSV_READ_OPTS).csv(path)
    got = {(r["id"], r["text"]) for r in back.collect()}
    assert got == set(rows)


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    """Compaction repacks a fragmented directory into ~target-sized files
    without losing or altering a single row."""
    import glob

    from trike_spark.io import compact_parquet, load_table

    o = load_table(spark, "/root/testdata/sf0.01", "orders")
    src = str(tmp_path / "fragmented")
    o.repartition(64).write.parquet(src)
    assert len(glob.glob(src + "/*.parquet")) == 64

    dst = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, dst, target_file_bytes=1 << 20)
    got = glob.glob(dst + "/*.parquet")
    assert len(got) == n < 64

    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert a.count() == b.count()
    # content-identical: order-insensitive md5-xor over a stable row encoding
    from pyspark.sql import functions as F

    def fingerprint(df):
        row = F.md5(F.to_json(F.struct(*sorted(df.columns))))
        return df.select(
            F.sum(F.conv(F.substring(row, 1, 15), 16, 10).cast("decimal(38,0)")).alias("fp")
        ).collect()[0]["fp"]

    assert fingerprint(a) == fingerprint(b)
