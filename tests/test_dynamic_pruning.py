"""Plan + behavior assertions for the dynamic-partition-pruning face:
the fact scan must carry a runtime `dynamicpruning` partition filter
derived from the dim join, and the result must match the layout-agnostic
computation."""

from __future__ import annotations

from trike_spark.queries.scans import scan_dynamic_partition_pruning

SF_DIR = "/root/testdata/sf0.001"


def test_dpp_subquery_lands_in_fact_scan(spark):
    df = scan_dynamic_partition_pruning(spark, SF_DIR)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "dynamicpruning" in optimized.lower(), optimized
    rows = df.collect()
    assert 1 <= len(rows) <= 3
    # every emitted day must actually be a signup day (the pruning dim)
    from pyspark.sql import functions as F

    from trike_spark.io import load_table

    signup_days = {
        r.d
        for r in load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "signup")
        .select(F.date_trunc("day", F.col("ts")).cast("date").alias("d"))
        .distinct()
        .collect()
    }
    assert {r.day for r in rows} <= signup_days
