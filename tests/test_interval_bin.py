"""Unit + plan-shape tests for the bin-bucketed point-in-interval join
(operators/interval_bin.py) and its registered face.

The operator's contract: identical rows to the naive inequality join —
no misses, no duplicates — even when intervals span multiple bins, while
the physical plan stays an EQUI-join on the bin key (the naive plan is
BroadcastNestedLoopJoin)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from trike_spark.operators.interval_bin import bin_interval_join

BIN_US = 10 * 60 * 1_000_000  # 10-minute bins


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, minute // 60, minute % 60, second)


def test_bin_join_matches_naive_range_join(spark):
    # Intervals deliberately misaligned with the 10-min grid, several
    # spanning 2-4 bins, one empty, two overlapping each other.
    intervals = spark.createDataFrame(
        [
            (1, _ts(5), _ts(12)),    # spans bins 0-1
            (2, _ts(18), _ts(55)),   # spans bins 1-5
            (3, _ts(30), _ts(40)),   # exactly one bin, grid-aligned
            (4, _ts(32), _ts(38)),   # nested inside interval 3
            (5, _ts(90), _ts(95)),   # no points
        ],
        "iv_id int, w_start timestamp, w_end timestamp",
    )
    points = spark.createDataFrame(
        [(i, _ts(m, s)) for i, (m, s) in enumerate(
            [(0, 0), (5, 0), (11, 59), (12, 0), (19, 30), (35, 0),
             (39, 59), (40, 0), (54, 59), (55, 0), (89, 59)]
        )],
        "p_id int, ts timestamp",
    )
    binned = bin_interval_join(points, intervals, "ts", "w_start", "w_end", BIN_US)
    naive = points.join(
        intervals,
        (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")),
    )
    got = sorted((r.p_id, r.iv_id) for r in binned.collect())
    want = sorted((r.p_id, r.iv_id) for r in naive.collect())
    assert got == want
    # spot-check semantics: [start, end) — start inclusive, end exclusive
    assert (1, 1) in got and (3, 1) not in got
    # overlap: point 5 (t=35) is in both 3 and 4; no duplicates per pair
    assert got.count((5, 3)) == 1 and got.count((5, 4)) == 1


def test_bin_join_plans_as_equi_join(spark):
    intervals = spark.createDataFrame(
        [(1, _ts(5), _ts(12))], "iv_id int, w_start timestamp, w_end timestamp"
    )
    points = spark.createDataFrame([(0, _ts(6))], "p_id int, ts timestamp")
    binned = bin_interval_join(points, intervals, "ts", "w_start", "w_end", BIN_US)
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    naive = points.join(
        intervals,
        (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")),
    )
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    # what we're avoiding: the keyless range join plans as a nested loop
    assert "BroadcastNestedLoopJoin" in naive_plan or "CartesianProduct" in naive_plan


def test_face_bin_join_is_hash_join_with_residual(spark):
    """The registered face's containment join must be a hash join on _bin
    (BHJ at this size; shuffled hash at scale) — never a nested loop over
    events × intervals."""
    from trike_spark.registry import REGISTRY, load_all_query_modules

    load_all_query_modules()
    df = REGISTRY["join_interval_binned"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    join_lines = [ln for ln in plan.splitlines() if "Join" in ln]
    bin_joins = [ln for ln in join_lines if "_bin" in ln]
    assert bin_joins and all("HashJoin" in ln for ln in bin_joins)
    # the only nested-loop allowed is the 1-row stats broadcast
    bnlj = [ln for ln in join_lines if "BroadcastNestedLoopJoin" in ln]
    assert all("hh" in ln or "t#" in ln for ln in bnlj)
