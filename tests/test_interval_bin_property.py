"""Property test: bin_interval_join ≡ naive range join for ARBITRARY
point sets, interval sets, and bin widths (the unit test pins chosen
cases; this sweeps the space — bins misaligned with intervals, empty
intervals, duplicate timestamps, widths smaller and larger than every
interval).

Spark-side execution per example is slow, so the property runs the
OPERATOR'S ALGEBRA (bin assignment + containment) in pure Python against
the naive O(n·m) reference, and a handful of drawn examples re-execute on
Spark to anchor the algebra to the real operator."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

US = 1_000_000
BASE = dt.datetime(2024, 1, 1)


def _naive(points, intervals):
    return sorted(
        (pi, ii)
        for pi, p in enumerate(points)
        for ii, (s, e) in enumerate(intervals)
        if s <= p < e
    )


def _binned(points, intervals, width):
    # mirrors operators/interval_bin.py exactly: floor-div bins, the
    # interval explodes from bin(start) to bin(end - 1), join on bin,
    # containment residual
    matches = []
    for ii, (s, e) in enumerate(intervals):
        if e <= s:
            continue
        bins = set(range(s // width, (e - 1) // width + 1))
        for pi, p in enumerate(points):
            if p // width in bins and s <= p < e:
                matches.append((pi, ii))
    return sorted(matches)


intervals_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),
        st.integers(min_value=1, max_value=2_000),
    ).map(lambda t: (t[0], t[0] + t[1])),
    min_size=0,
    max_size=8,
)
points_st = st.lists(st.integers(min_value=0, max_value=12_000), min_size=0, max_size=20)
width_st = st.integers(min_value=1, max_value=4_000)


@given(points=points_st, intervals=intervals_st, width=width_st)
@settings(max_examples=300, deadline=None)
def test_bin_algebra_equals_naive(points, intervals, width):
    assert _binned(points, intervals, width) == _naive(points, intervals)


def test_spark_operator_matches_algebra_on_drawn_cases(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from trike_spark.operators.interval_bin import bin_interval_join

    cases = [
        # (points, intervals, width_units) — adversarial picks: width 1,
        # interval == width, end on bin edge, duplicate points
        ([0, 1, 2, 3], [(1, 3)], 1),
        ([5, 10, 15, 10], [(0, 10), (10, 20)], 10),
        ([7, 8, 9], [(0, 9), (8, 16)], 4),
        ([0], [(0, 1)], 3),
    ]
    for points, intervals, width in cases:
        pdf = spark.createDataFrame(
            [(i, BASE + dt.timedelta(seconds=p)) for i, p in enumerate(points)],
            "p_id int, ts timestamp",
        )
        idf = spark.createDataFrame(
            [
                (i, BASE + dt.timedelta(seconds=s), BASE + dt.timedelta(seconds=e))
                for i, (s, e) in enumerate(intervals)
            ],
            "iv_id int, w_start timestamp, w_end timestamp",
        )
        got = sorted(
            (r.p_id, r.iv_id)
            for r in bin_interval_join(
                pdf, idf, "ts", "w_start", "w_end", width * US
            ).collect()
        )
        want = _naive(points, intervals)
        assert got == want, (points, intervals, width, got, want)
