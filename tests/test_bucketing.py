"""Bucketed co-located join: same bucketing on both sides ⇒ the join plan
has NO shuffle exchange — the 100 TB answer to the recurring fact⋈fact
join (SURVEY.md §4.3; 'bucketing for co-located joins')."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from trike_spark import plans
from trike_spark.io import load_table, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # managed tables land in ./spark-warehouse (gitignored); warehouse.dir
    # is a static conf and can't move per-test — clear stale locations from
    # previous sessions too (metastore is per-session, the dir is not)
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    write_bucketed(
        load_table(spark, SF_DIR, "orders"), "b_orders", "o_orderkey", 4, sort_col="o_orderkey"
    )
    write_bucketed(
        load_table(spark, SF_DIR, "lineitem"), "b_lineitem", "l_orderkey", 4, sort_col="l_orderkey"
    )
    o = spark.table("b_orders")
    li = spark.table("b_lineitem")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = plans.formatted_plan(joined)
        # the join itself must consume bucketed scans directly: no Exchange
        # between the scans and the SortMergeJoin
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        assert not re.search(r"Exchange hashpartitioning\(\s*[lo]_orderkey", plan), plan
        # and the result is right
        total = joined.agg(F.sum("n")).collect()[0][0]
        assert total == load_table(spark, SF_DIR, "lineitem").count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
