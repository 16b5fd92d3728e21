"""Bin-bucketed point-in-interval join.

A point-in-interval join with NO equality key (`p.ts BETWEEN i.start AND
i.end`) is the classic relational scale-killer: Spark can only plan a
pure inequality join as BroadcastNestedLoopJoin (small side fits) or a
Cartesian product (it doesn't) — O(|P|·|I|) comparisons at 100 TB.

The standard fix (used by range-join hints in Databricks SQL, Flink's
interval-join state layout, and time-series engines generally) is to
MANUFACTURE an equality key from the range dimension: quantize time into
fixed-width bins, explode each interval onto every bin it overlaps, tag
each point with its containing bin, hash-join on the bin id, and keep the
exact containment predicate as a residual filter.

Correctness: a point p in interval [s, e) shares p's bin with the
interval's exploded copy for that bin — exactly one copy, so the join
neither misses nor duplicates matches (no post-join dedup needed).

Cost model: intervals explode into ⌈len/width⌉(+1) copies, points stay
1×. Pick the bin width on the order of the MEDIAN interval length: much
smaller → interval blow-up; much larger → each bin pairs points with many
non-overlapping intervals and the residual filter does the work the join
was supposed to. Hot bins (bursty time ranges) are ordinary join skew —
AQE skew-join splitting or a salt on the bin id composes orthogonally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bin_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str | Column,
    start_ts: str | Column,
    end_ts: str | Column,
    bin_width_us: int,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end``, via an equi-join on time bins of
    ``bin_width_us`` microseconds. Returns points ⋈ intervals with all
    columns of both (the internal ``_bin`` key is dropped).
    """
    p_ts = F.col(point_ts) if isinstance(point_ts, str) else point_ts
    s_ts = F.col(start_ts) if isinstance(start_ts, str) else start_ts
    e_ts = F.col(end_ts) if isinstance(end_ts, str) else end_ts

    p = points.withColumn("_bin", F.floor(F.unix_micros(p_ts) / bin_width_us))
    # [s, e): the last covered bin is the one containing e - 1 µs.
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(s_ts) / bin_width_us),
                F.floor((F.unix_micros(e_ts) - 1) / bin_width_us),
            )
        ),
    )
    return (
        p.join(iv, "_bin")
        .filter((p_ts >= s_ts) & (p_ts < e_ts))
        .drop("_bin")
    )
