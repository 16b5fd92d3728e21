"""Exactness of delta-join view maintenance: after every maintenance
tick, the materialized view must equal the from-scratch join of the
current base snapshots — including the tricky tick where BOTH sides grew
(where naive ΔA⋈B_old ∪ A_new⋈ΔB double-counts or misses ΔA⋈ΔB)."""

from __future__ import annotations

import pytest

from trike_spark import versioned
from trike_spark.operators.incremental_join import maintain_join_view


def _rows(df, cols=("k", "va", "vb")):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _full_join(spark, pa, pb):
    a = versioned.read_version(spark, pa)
    b = versioned.read_version(spark, pb)
    return a.join(b, ["k"])


def test_view_equals_full_recompute_at_every_tick(spark, tmp_path):
    pa, pb = str(tmp_path / "A"), str(tmp_path / "B")
    pv = str(tmp_path / "V")

    versioned.commit(spark.createDataFrame([(1, "a1"), (2, "a2")], "k int, va string"), pa)
    versioned.commit(spark.createDataFrame([(1, "b1"), (3, "b3")], "k int, vb string"), pb)

    state = maintain_join_view(spark, pa, pb, ["k"], pv)
    assert _rows(versioned.read_version(spark, pv)) == _rows(_full_join(spark, pa, pb))
    assert _rows(versioned.read_version(spark, pv)) == [(1, "a1", "b1")]

    # tick 2: only A grows — its delta must see ALL of B
    versioned.commit(spark.createDataFrame([(3, "a3")], "k int, va string"), pa)
    state = maintain_join_view(spark, pa, pb, ["k"], pv, state)
    assert _rows(versioned.read_version(spark, pv)) == _rows(_full_join(spark, pa, pb))

    # tick 3: BOTH sides grow, including a pair matching only delta-to-delta
    versioned.commit(spark.createDataFrame([(7, "a7"), (2, "a2x")], "k int, va string"), pa)
    versioned.commit(spark.createDataFrame([(7, "b7"), (2, "b2")], "k int, vb string"), pb)
    state = maintain_join_view(spark, pa, pb, ["k"], pv, state)
    view = _rows(versioned.read_version(spark, pv))
    assert view == _rows(_full_join(spark, pa, pb))
    # the delta-delta pair (7, a7, b7) appears exactly once
    assert view.count((7, "a7", "b7")) == 1
    # pre-existing A rows joined the new B delta: both a2 and a2x match b2
    assert (2, "a2", "b2") in view and (2, "a2x", "b2") in view

    # tick 4: nothing grew → no new view version
    v_before = versioned.current_version(pv)
    state = maintain_join_view(spark, pa, pb, ["k"], pv, state)
    assert versioned.current_version(pv) == v_before

    # the maintained view is itself incrementally consumable
    delta, hw = versioned.read_incremental(spark, pv, 1)
    assert delta is not None and hw == v_before


def test_overwrite_on_base_forces_resync(spark, tmp_path):
    pa, pb = str(tmp_path / "A2"), str(tmp_path / "B2")
    pv = str(tmp_path / "V2")
    versioned.commit(spark.createDataFrame([(1, "a")], "k int, va string"), pa)
    versioned.commit(spark.createDataFrame([(1, "b")], "k int, vb string"), pb)
    state = maintain_join_view(spark, pa, pb, ["k"], pv)
    versioned.commit(
        spark.createDataFrame([(9, "a9")], "k int, va string"), pa, mode="overwrite"
    )
    with pytest.raises(ValueError, match="overwrite"):
        maintain_join_view(spark, pa, pb, ["k"], pv, state)


def test_agg_view_merge_on_read_equals_full_recompute(spark, tmp_path):
    from pyspark.sql import functions as F

    from trike_spark.operators.incremental_join import (
        compact_agg_view,
        maintain_agg_view,
        read_agg_view,
    )

    base, view = str(tmp_path / "base"), str(tmp_path / "aggv")

    def full():
        return sorted(
            tuple(r)
            for r in versioned.read_version(spark, base)
            .groupBy("k")
            .agg(F.sum("x").alias("sum_x"), F.count(F.lit(1)).alias("n_rows"))
            .collect()
        )

    def view_rows():
        return sorted(
            tuple(r) for r in read_agg_view(spark, view, ["k"], ["x"]).collect()
        )

    versioned.commit(
        spark.createDataFrame([(1, 10), (1, 5), (2, 7)], "k int, x bigint"), base
    )
    state = maintain_agg_view(spark, base, ["k"], ["x"], view)
    assert view_rows() == full() == [(1, 15, 2), (2, 7, 1)]

    versioned.commit(
        spark.createDataFrame([(1, 1), (3, 30)], "k int, x bigint"), base
    )
    state = maintain_agg_view(spark, base, ["k"], ["x"], view, state)
    assert view_rows() == full() == [(1, 16, 3), (2, 7, 1), (3, 30, 1)]

    # compaction: results identical, segment count collapses to one
    n_segments_before = len(versioned.read_version(spark, view).inputFiles())
    compact_agg_view(spark, view, ["k"], ["x"])
    assert view_rows() == full()
    assert len(versioned.read_version(spark, view).inputFiles()) <= n_segments_before

    # post-compaction ticks keep working
    versioned.commit(spark.createDataFrame([(2, 3)], "k int, x bigint"), base)
    state = maintain_agg_view(spark, base, ["k"], ["x"], view, state)
    assert view_rows() == full()
