from __future__ import annotations

from pyspark.sql import functions as F

from trike_spark import plans
from trike_spark.io import load_table, write_time_partitioned

SF_DIR = "/root/testdata/sf0.001"


def test_time_partitioned_archive_prunes(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "archive")
    write_time_partitioned(orders, path, "o_orderdate", "month")
    back = spark.read.parquet(path).filter("_part = '1996-03'")
    plan = plans.formatted_plan(back)
    assert "PartitionFilters" in plan
    n = back.count()
    assert 0 < n < orders.count()
    # rows inside a partition are sorted by the timestamp (row-group skip aid)
    rows = [r["o_orderdate"] for r in back.collect()]
    # file-internal order preserved by parquet read of a single partition dir
    assert all(rows[i] <= rows[i + 1] for i in range(len(rows) - 1)) or n < 2


def test_day_granularity_labels_are_day_fine(spark, tmp_path):
    """A 'day' archive must carry day-fine _part labels — a month-fine
    label would silently collapse day-level pruning."""
    from trike_spark.io import write_time_partitioned

    df = spark.createDataFrame(
        [("2024-01-10 05:00:00",), ("2024-01-11 06:00:00",)], "ts_s string"
    ).select(F.to_timestamp("ts_s").alias("ts"))
    path = str(tmp_path / "day_arch")
    write_time_partitioned(df, path, "ts", granularity="day")
    # partition-column type inference reads day labels back as DATEs
    parts = {str(r["_part"]) for r in spark.read.parquet(path).select("_part").collect()}
    assert parts == {"2024-01-10", "2024-01-11"}


def test_archive_week_filter_prunes_partitions(spark, tmp_path):
    """The registered scan face's week predicate must land in
    PartitionFilters (pruned before IO), not a post-scan Filter."""
    from trike_spark.io import write_time_partitioned
    from trike_spark.plans import formatted_plan

    rows = [(f"2024-01-{d:02d} 12:00:00",) for d in range(1, 31)]
    df = spark.createDataFrame(rows, "ts_s string").select(
        F.to_timestamp("ts_s").alias("ts")
    )
    path = str(tmp_path / "prune_arch")
    write_time_partitioned(df, path, "ts", granularity="day")
    archived = spark.read.parquet(path)
    q = archived.filter(F.col("_part").between("2024-01-10", "2024-01-16"))
    plan = formatted_plan(q)
    assert "PartitionFilters" in plan, plan
    assert q.count() == 7


def test_backfill_rewrites_only_its_partitions(spark, tmp_path):
    """backfill_time_partitioned: re-running one day replaces exactly that
    day — no duplicates (append would), no archive wipe (static
    overwrite would), and a second identical run converges (idempotent)."""
    from trike_spark.io import backfill_time_partitioned

    path = str(tmp_path / "archive")
    rows = spark.createDataFrame(
        [(i, f"2024-01-0{1 + i % 3}", i * 10) for i in range(9)],
        "id long, d string, v long",
    ).select("id", F.col("d").cast("timestamp").alias("ts"), "v")
    write_time_partitioned(rows, path, "ts", "day")
    assert spark.read.parquet(path).count() == 9

    # backfill day 2 with a corrected, smaller row set
    fixed = spark.createDataFrame(
        [(100, "2024-01-02", 999), (101, "2024-01-02", 998)],
        "id long, d string, v long",
    ).select("id", F.col("d").cast("timestamp").alias("ts"), "v")
    backfill_time_partitioned(fixed, path, "ts", "day")

    back = spark.read.parquet(path)
    assert back.filter("_part = '2024-01-02'").count() == 2  # replaced, not appended
    assert back.filter("_part = '2024-01-01'").count() == 3  # untouched
    assert back.filter("_part = '2024-01-03'").count() == 3  # untouched
    ids_day2 = {r.id for r in back.filter("_part = '2024-01-02'").collect()}
    assert ids_day2 == {100, 101}

    # idempotence: the same backfill again changes nothing
    backfill_time_partitioned(fixed, path, "ts", "day")
    again = spark.read.parquet(path)
    assert again.count() == 8
    assert {r.id for r in again.filter("_part = '2024-01-02'").collect()} == {100, 101}
