from __future__ import annotations

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
