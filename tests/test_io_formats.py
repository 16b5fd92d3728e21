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


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    """ORC round-trips losslessly and its scan gets the same pushdown
    treatment as parquet (predicate reaches the reader, schema pruned)."""
    from trike_spark.io import read_orc, write_orc

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_shipdate"
    )
    path = str(tmp_path / "lineitem_orc")
    write_orc(li, path)
    back = read_orc(spark, path)
    assert back.count() == li.count()
    assert back.schema == li.schema

    q = read_orc(spark, path).filter("l_quantity > 30").select("l_orderkey")
    plan = plans.formatted_plan(q)
    assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters", 1)[1][:200]
    # column pruning: ReadSchema carries only the two referenced columns
    read_schema = plan.split("ReadSchema", 1)[1][:200]
    assert "l_orderkey" in read_schema and "l_shipdate" not in read_schema


def test_orc_partitioned_prunes(spark, tmp_path):
    from trike_spark.io import read_orc, write_orc

    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_orc_part")
    write_orc(orders, path, partition_by=["o_orderstatus"])
    back = read_orc(spark, path).filter("o_orderstatus = 'F'")
    plan = plans.formatted_plan(back)
    assert "PartitionFilters" in plan
    assert 0 < back.count() < read_orc(spark, path).count()


def test_text_line_round_trip(spark, tmp_path):
    """Line-mode text: one row per line, lossless for plain lines."""
    from pyspark.sql import functions as F

    from trike_spark.io import read_text, write_text

    docs = load_table(spark, SF_DIR, "documents").select(
        F.concat_ws("\t", "doc_id", "lang").alias("value")
    )
    path = str(tmp_path / "docs_txt")
    write_text(docs, path)
    back = read_text(spark, path)
    assert back.columns == ["value"]
    assert {r["value"] for r in back.collect()} == {r["value"] for r in docs.collect()}


def test_text_wholefile_one_row_per_file(spark, tmp_path):
    from trike_spark.io import read_text

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("line one\nline two\n")
    (d / "b.txt").write_text("solo\n")
    whole = read_text(spark, str(d), whole=True)
    assert whole.count() == 2
    vals = sorted(r["value"] for r in whole.collect())
    assert vals[0] == "line one\nline two\n"
    lines = read_text(spark, str(d))
    assert lines.count() == 3


def test_binary_files_ingest_glob_and_size_filter(spark, tmp_path):
    """binaryFile ingest: content is byte-exact, pathGlobFilter prunes at
    listing time, and the length filter is a metadata predicate (evaluated
    without reading content)."""
    from trike_spark.io import read_binary_files

    d = tmp_path / "blobs"
    d.mkdir()
    payload_small = b"\x89PNG\r\n\x1a\n" + bytes(range(64))
    payload_big = b"\x89PNG\r\n\x1a\n" + bytes(1024)
    (d / "a.png").write_bytes(payload_small)
    (d / "b.png").write_bytes(payload_big)
    (d / "c.wav").write_bytes(b"RIFFxxxxWAVE")

    pngs = read_binary_files(spark, str(d), glob="*.png")
    assert pngs.count() == 2
    small = read_binary_files(spark, str(d), glob="*.png", max_bytes=200)
    rows = small.collect()
    assert len(rows) == 1
    assert bytes(rows[0]["content"]) == payload_small
    assert rows[0]["length"] == len(payload_small)


def test_epoch_shard_write_reproducible_and_balanced(spark, tmp_path):
    """write_epoch_shards: every input row lands in exactly one shard
    partition; the same seed rewrites the IDENTICAL shard membership
    (epoch reproducibility with no RNG state); a different seed
    re-permutes; shards are roughly balanced (hash-ranged assignment)."""
    import os

    from pyspark.sql import functions as F

    from trike_spark.io import write_epoch_shards

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    p1, p1b, p2 = str(tmp_path / "e1"), str(tmp_path / "e1b"), str(tmp_path / "e2")
    write_epoch_shards(df, p1, seed="epoch1")
    write_epoch_shards(df, p1b, seed="epoch1")
    write_epoch_shards(df, p2, seed="epoch2")

    r1 = spark.read.parquet(p1)
    assert sorted(r1.columns) == ["doc_id", "shard"]
    # the shard must be a real partition directory, not just a column
    assert any(d.startswith("shard=") for d in os.listdir(p1))
    # lossless: every doc exactly once
    assert r1.count() == 2000 and r1.select("doc_id").distinct().count() == 2000
    m1 = {r["doc_id"]: r["shard"] for r in r1.collect()}
    m1b = {r["doc_id"]: r["shard"] for r in spark.read.parquet(p1b).collect()}
    m2 = {r["doc_id"]: r["shard"] for r in spark.read.parquet(p2).collect()}
    assert m1 == m1b, "same seed must reproduce identical shard membership"
    assert m1 != m2, "a new seed must re-permute"
    # hash-ranged balance: no shard more than 2x the ideal share
    sizes = r1.groupBy("shard").count().collect()
    assert len(sizes) == 8
    assert max(s["count"] for s in sizes) < 2 * (2000 / 8)
