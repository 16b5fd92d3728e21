"""Unit tests for operators/banded.py: each banded primitive must be
value-identical to the bare global window it replaces, across band
widths (including degenerate ones: everything in one band, one row per
band) — the decomposition is exact or it is wrong."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from trike_spark.operators.banded import (
    banded_fill,
    banded_cummax,
    banded_cumsum,
    banded_ntile,
    banded_rank,
)


@pytest.fixture(scope="module")
def data(spark):
    # deterministic skewed values with plenty of ties
    return (
        spark.range(500)
        .select(
            F.col("id"),
            (F.xxhash64(F.col("id")) % 37).alias("v"),
            (F.xxhash64(F.col("id") + 1) % 1000).alias("w"),
        )
        .cache()
    )


WIDTHS = [1, 7, 1000]  # one-band-per-value, mid, everything-in-one-band


@pytest.mark.parametrize("width", WIDTHS)
def test_banded_row_number_matches_global(spark, data, width):
    order = [F.col("v"), F.col("id")]
    want = data.select(
        "id", F.row_number().over(Window.orderBy(*order)).alias("rk")
    )
    got = banded_rank(data, F.floor(F.col("v") / width), order, out="rk").select(
        "id", "rk"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@pytest.mark.parametrize("width", WIDTHS)
def test_banded_min_rank_matches_global(spark, data, width):
    want = data.select("id", F.rank().over(Window.orderBy("v")).alias("rk"))
    got = banded_rank(
        data, F.floor(F.col("v") / width), ["v"], out="rk", kind="rank"
    ).select("id", "rk")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@pytest.mark.parametrize("width", WIDTHS)
def test_banded_cumsum_matches_global(spark, data, width):
    order = [F.col("v"), F.col("id")]
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = data.select("id", F.sum("w").over(w).alias("c"))
    got = banded_cumsum(
        data, F.floor(F.col("v") / width), order, {"c": "w"}
    ).select("id", "c")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@pytest.mark.parametrize("width", WIDTHS)
def test_banded_cummax_matches_global(spark, data, width):
    order = [F.col("v"), F.col("id")]
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = data.select("id", F.max("w").over(w).alias("m"))
    got = banded_cummax(
        data, F.floor(F.col("v") / width), order, "w", "m"
    ).select("id", "m")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@pytest.mark.parametrize("width", WIDTHS)
@pytest.mark.parametrize("k", [3, 10])
def test_banded_ntile_matches_global(spark, data, width, k):
    order = [F.col("v"), F.col("id")]
    want = data.select("id", F.ntile(k).over(Window.orderBy(*order)).alias("t"))
    got = banded_ntile(data, F.floor(F.col("v") / width), order, k, "t").select(
        "id", "t"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_banded_desc_order_with_negated_band(spark, data):
    """DESC orderings use a negated band — the RFM/decile pattern."""
    order = [F.col("v").desc(), F.col("id")]
    want = data.select(
        "id", F.row_number().over(Window.orderBy(*order)).alias("rk")
    )
    got = banded_rank(data, -F.floor(F.col("v") / 5), order, out="rk").select(
        "id", "rk"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_banded_string_band_cummax(spark):
    """String bands (md5-prefix arrival keys — the lateness-frontier
    pattern) work without a long cast."""
    df = spark.range(300).select(
        F.md5(F.col("id").cast("string")).alias("k"), F.col("id").alias("x")
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = df.select("k", F.max("x").over(w).alias("m"))
    got = banded_cummax(df, F.substring("k", 1, 1), ["k"], "x", "m").select("k", "m")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@pytest.mark.parametrize("width", WIDTHS)
@pytest.mark.parametrize("direction", ["prev", "next"])
def test_banded_fill_matches_global(spark, data, width, direction):
    """Running IGNORE NULLS fill (the 1-NN / as-of adjacency shape):
    value is null on ~half the rows; banded fill must equal the bare
    exclusive-frame last/first ignore-nulls window."""
    order = [F.col("v"), F.col("id")]
    val = F.when(F.col("id") % 2 == 0, F.col("w"))
    if direction == "prev":
        w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
        want = data.select("id", F.last(val, ignorenulls=True).over(w).alias("f"))
    else:
        w = Window.orderBy(*order).rowsBetween(1, Window.unboundedFollowing)
        want = data.select("id", F.first(val, ignorenulls=True).over(w).alias("f"))
    got = banded_fill(
        data, F.floor(F.col("v") / width), order, val, "f", direction=direction
    ).select("id", "f")
    assert sorted(map(tuple, got.collect()), key=str) == sorted(
        map(tuple, want.collect()), key=str
    )


@pytest.mark.parametrize("width", WIDTHS)
def test_banded_cummax_exclusive_matches_global(spark, data, width):
    order = [F.col("v"), F.col("id")]
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    want = data.select("id", F.max("w").over(w).alias("m"))
    got = banded_cummax(
        data, F.floor(F.col("v") / width), order, "w", "m", inclusive=False
    ).select("id", "m")
    assert sorted(map(tuple, got.collect()), key=str) == sorted(
        map(tuple, want.collect()), key=str
    )


def test_banded_struct_band_rank(spark, data):
    """Composite struct bands (the Zipf (-freq, token-prefix) pattern)."""
    order = [F.col("v").desc(), F.col("id")]
    band = F.struct((-F.col("v")).alias("nv"), (F.col("id") % 3).alias("sub"))
    want = data.select(
        "id", F.row_number().over(Window.orderBy(*order)).alias("rk")
    )
    got = banded_rank(data, band, order, out="rk").select("id", "rk")
    # (id % 3) is NOT monotone within ties of v... but within a tie of v
    # the order continues by id, and sub-banding by id%3 breaks it — this
    # must FAIL, proving the monotone-band contract is load-bearing.
    assert sorted(map(tuple, got.collect())) != sorted(map(tuple, want.collect()))
    # a contract-respecting sub-band (id bucket, monotone within v ties)
    band_ok = F.struct((-F.col("v")).alias("nv"), F.floor(F.col("id") / 100).alias("sub"))
    got_ok = banded_rank(data, band_ok, order, out="rk").select("id", "rk")
    assert sorted(map(tuple, got_ok.collect())) == sorted(map(tuple, want.collect()))


@pytest.mark.parametrize("width", WIDTHS)
def test_banded_rank_cumsum_fused_matches_global(spark, data, width):
    """The fused rank+cumsum helper must equal BOTH bare global windows
    at once (row_number and running sum over the same total order) while
    paying a single band-stats pass."""
    from trike_spark.operators.banded import banded_rank_cumsum

    order = [F.col("v"), F.col("id")]
    w = Window.orderBy(*order)
    want = data.select(
        "id",
        F.row_number().over(w).alias("rk"),
        F.sum("w").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    )
    got = banded_rank_cumsum(
        data, F.floor(F.col("v") / width), order, {"cum": "w"}, out_rank="rk"
    ).select("id", "rk", "cum")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_banded_rank_cumsum_single_stats_window(spark, data):
    """Plan shape: the fusion's whole point — exactly ONE unpartitioned
    window (the shared band-stats prefix pass), where separate
    banded_rank + banded_cumsum calls cost two."""
    from trike_spark import plans
    from trike_spark.operators.banded import (
        banded_cumsum,
        banded_rank,
        banded_rank_cumsum,
    )

    order = [F.col("v"), F.col("id")]
    band = F.floor(F.col("v") / 7)
    fused = banded_rank_cumsum(data, band, order, {"cum": "w"}, out_rank="rk")
    assert plans.unpartitioned_window_count(fused) == 1
    separate = banded_cumsum(
        banded_rank(data, band, order, out="rk"), band, order, {"cum": "w"}
    )
    assert plans.unpartitioned_window_count(separate) == 2
