"""Banded decomposition of global ordered windows — the shuffle-parallel
form of ``OVER (ORDER BY ...)`` with no partition key.

A bare global window collapses its whole input onto ONE task (Spark even
warns: "No Partition Defined for Window operation"). But every running
aggregate over a total order decomposes over contiguous bands of that
order:

    global_agg(row) = fold(per-band running agg, prefix-fold of whole
                           EARLIER bands)

so the heavy window can run partitioned BY BAND (parallelism = #bands)
with only a bounded band-STATS table (one row per band) going through a
tiny unpartitioned prefix window. This is the skeleton behind
``window_equidepth_histogram`` (the repo's original instance), promoted
here to a shared operator after the round-5 verdict flagged five faces
that had re-grown the single-partition shape.

Contract for ``band``: it must be a MONOTONE NON-DECREASING function of
the ordering prefix, and rows that compare equal under ``order`` must
share a band (automatic when the band is a function of the ordering key,
e.g. ``floor(x / width)`` for ``ORDER BY x``). Then per-band results plus
exclusive prefix offsets reproduce the global window exactly —
rank/row_number/ntile stay integer-identical, sums stay fold-identical.

At 100 TB the band plays the role of the range-partitioner's split
points; #bands only sets parallelism and the stats table's size, so a few
hundred to a few thousand is plenty. The census ``gwin`` metric counts
the remaining unpartitioned windows; the ones these helpers emit run over
the band-stats table only.

Two further contract clauses (both latent today — no call site can
violate them — but load-bearing for new callers):

* **``band`` must be NON-NULL for every row.** The helpers re-attach the
  band offsets with an inner equi-join on ``_band``; a row whose band
  expression evaluates to NULL (e.g. a NULL ordering key) would be
  silently dropped rather than placed NULLS FIRST/LAST the way the bare
  window would. Derive the band from a non-null key, or
  ``coalesce``/filter NULL keys into an explicit band first.
* **Columns summed by :func:`banded_cumsum` / :func:`banded_rank_cumsum`
  must be NON-NULL.** A band whose prefix rows are all NULL would yield
  ``_off + NULL = NULL`` where the bare window carries the earlier-band
  running sum forward, and the first band's offset is coalesced to 0
  where a bare window over an all-NULL global prefix returns NULL.
  ``coalesce`` the measure to 0 at the call site if NULLs can occur.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BAND = "_band"
_TMP = ("_band", "_off", "_N", "_rk")


def _with_offsets(
    df: DataFrame,
    band: Column,
    per_band: Column,
    fold_prev,
    zero: Column,
    with_total: bool = False,
) -> DataFrame:
    """Attach `_band` and `_off` (the fold of whole earlier bands'
    per-band aggregates; `zero` for the first band), plus `_N` (the fold
    over ALL bands) when requested. The only unpartitioned window here
    runs over the one-row-per-band stats table."""
    banded = df.withColumn(_BAND, band)
    stats = banded.groupBy(_BAND).agg(per_band.alias("_b"))
    w_prev = Window.orderBy(_BAND).rowsBetween(Window.unboundedPreceding, -1)
    cols = [F.col(_BAND), F.coalesce(fold_prev("_b").over(w_prev), zero).alias("_off")]
    if with_total:
        w_all = Window.orderBy(_BAND).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        cols.append(fold_prev("_b").over(w_all).alias("_N"))
    offsets = stats.select(*cols)
    return banded.join(F.broadcast(offsets), _BAND)


def _order_window(order: Sequence[Column | str]) -> Window:
    return Window.partitionBy(_BAND).orderBy(*order)


def banded_rank(
    df: DataFrame,
    band: Column,
    order: Sequence[Column | str],
    out: str = "rk",
    kind: str = "row_number",
) -> DataFrame:
    """Exact global ``row_number()``/``rank()`` OVER (ORDER BY order) as
    offset + per-band rank. ``kind='rank'`` keeps min-rank tie semantics
    (ties can't straddle bands under the band contract)."""
    fn = {"row_number": F.row_number, "rank": F.rank}[kind]
    j = _with_offsets(df, band, F.count(F.lit(1)), F.sum, F.lit(0))
    return j.withColumn(out, F.col("_off") + fn().over(_order_window(order))).drop(
        *(c for c in _TMP if c != out)
    )


def banded_cumsum(
    df: DataFrame,
    band: Column,
    order: Sequence[Column | str],
    sums: dict[str, str],
) -> DataFrame:
    """Running SUMs over a global order: one stats pass carries every
    measure's per-band subtotal; each output = earlier-band offset +
    within-band cumulative (window partitioned by band)."""
    banded = df.withColumn(_BAND, band)
    stats = banded.groupBy(_BAND).agg(
        *[F.sum(src).alias(f"_b_{out}") for out, src in sums.items()]
    )
    w_prev = Window.orderBy(_BAND).rowsBetween(Window.unboundedPreceding, -1)
    offsets = stats.select(
        _BAND,
        *[
            F.coalesce(F.sum(f"_b_{out}").over(w_prev), F.lit(0)).alias(f"_off_{out}")
            for out in sums
        ],
    )
    w_band = _order_window(order).rowsBetween(Window.unboundedPreceding, 0)
    j = banded.join(F.broadcast(offsets), _BAND)
    for out, src in sums.items():
        j = j.withColumn(out, F.col(f"_off_{out}") + F.sum(src).over(w_band))
    return j.drop(_BAND, *[f"_off_{out}" for out in sums])


def banded_rank_cumsum(
    df: DataFrame,
    band: Column,
    order: Sequence[Column | str],
    sums: dict[str, str],
    out_rank: str = "rk",
    kind: str = "row_number",
) -> DataFrame:
    """Fused global rank + running SUMs over one total order: ONE
    band-stats pass carries the per-band row count and every measure's
    subtotal, and ONE unpartitioned window over that stats table emits
    all the prefix offsets together (calling :func:`banded_rank` then
    :func:`banded_cumsum` separately costs two stats aggregations, two
    broadcasts, and two gwin entries for the same answer)."""
    fn = {"row_number": F.row_number, "rank": F.rank}[kind]
    banded = df.withColumn(_BAND, band)
    stats = banded.groupBy(_BAND).agg(
        F.count(F.lit(1)).alias("_b_n"),
        *[F.sum(src).alias(f"_b_{out}") for out, src in sums.items()],
    )
    w_prev = Window.orderBy(_BAND).rowsBetween(Window.unboundedPreceding, -1)
    offsets = stats.select(
        _BAND,
        F.coalesce(F.sum("_b_n").over(w_prev), F.lit(0)).alias("_off_n"),
        *[
            F.coalesce(F.sum(f"_b_{out}").over(w_prev), F.lit(0)).alias(f"_off_{out}")
            for out in sums
        ],
    )
    j = banded.join(F.broadcast(offsets), _BAND)
    w_cum = _order_window(order).rowsBetween(Window.unboundedPreceding, 0)
    j = j.withColumn(out_rank, F.col("_off_n") + fn().over(_order_window(order)))
    for out, src in sums.items():
        j = j.withColumn(out, F.col(f"_off_{out}") + F.sum(src).over(w_cum))
    return j.drop(_BAND, "_off_n", *[f"_off_{out}" for out in sums])


def banded_cummax(
    df: DataFrame,
    band: Column,
    order: Sequence[Column | str],
    col: str,
    out: str,
    inclusive: bool = True,
) -> DataFrame:
    """Running MAX over a global order (the watermark-frontier shape):
    greatest(within-band running max, max over whole earlier bands).
    ``greatest`` skips NULLs, so the first band's missing offset and —
    with ``inclusive=False`` (the skyline-frontier ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING frame) — each band's NULL
    first-row max both fold away; a global first row with no
    predecessors stays NULL, matching the bare window exactly."""
    j = _with_offsets(df, band, F.max(col), F.max, F.lit(None))
    hi = 0 if inclusive else -1
    w_band = _order_window(order).rowsBetween(Window.unboundedPreceding, hi)
    return j.withColumn(
        out, F.greatest(F.max(col).over(w_band), F.col("_off"))
    ).drop(_BAND, "_off")


_FILL_MODES = {
    "prev": (F.max_by, F.last, (Window.unboundedPreceding, -1)),
    "next": (F.min_by, F.first, (1, Window.unboundedFollowing)),
}


def banded_fills(
    df: DataFrame,
    band: Column,
    order: Sequence[Column | str],
    specs: Sequence[tuple[Column, str, str]],
) -> DataFrame:
    """Running IGNORE NULLS fills over a global order — the sort-merge
    1-NN / as-of adjacency shape. Each spec is ``(value, out,
    direction)``: ``'prev'`` gives each row the LAST non-null ``value``
    strictly BEFORE it (ROWS UNBOUNDED PRECEDING TO 1 PRECEDING),
    ``'next'`` the FIRST strictly after. Decomposition: per-band boundary
    values (max_by/min_by over the order key, null-value rows skipped) ->
    running ignore-nulls fill over the band-STATS table ->
    coalesce(within-band exclusive fill, band offset). All specs share
    ONE stats pass, ONE broadcast, and one band partitioning of the data
    (a prev+next pair costs the same shuffle as either alone). ``order``
    must be plain ASCENDING expressions (the boundary agg compares the
    order key as a struct)."""
    okey = F.struct(*[F.col(c) if isinstance(c, str) else c for c in order])
    banded = df.withColumn(_BAND, band)
    aggs = []
    for i, (value, _out, direction) in enumerate(specs):
        boundary = _FILL_MODES[direction][0]
        banded = banded.withColumn(f"_v{i}", value)
        aggs.append(
            boundary(
                f"_v{i}", F.when(F.col(f"_v{i}").isNotNull(), okey)
            ).alias(f"_b{i}")
        )
    stats = banded.groupBy(_BAND).agg(*aggs)
    off_cols = []
    for i, (_value, _out, direction) in enumerate(specs):
        fill, hi = _FILL_MODES[direction][1:]
        w_stats = Window.orderBy(_BAND).rowsBetween(*hi)
        off_cols.append(
            fill(f"_b{i}", ignorenulls=True).over(w_stats).alias(f"_off{i}")
        )
    offs = stats.select(_BAND, *off_cols)
    out = banded.join(F.broadcast(offs), _BAND)
    drop = [_BAND]
    for i, (_value, out_col, direction) in enumerate(specs):
        fill, hi = _FILL_MODES[direction][1:]
        w_band = _order_window(order).rowsBetween(*hi)
        out = out.withColumn(
            out_col,
            F.coalesce(fill(f"_v{i}", ignorenulls=True).over(w_band), F.col(f"_off{i}")),
        )
        drop += [f"_v{i}", f"_off{i}"]
    return out.drop(*drop)


def banded_fill(
    df: DataFrame,
    band: Column,
    order: Sequence[Column | str],
    value: Column,
    out: str,
    direction: str = "prev",
) -> DataFrame:
    """Single-spec convenience wrapper over :func:`banded_fills`."""
    if direction not in _FILL_MODES:
        raise ValueError(f"direction must be prev|next, got {direction!r}")
    return banded_fills(df, band, order, [(value, out, direction)])


def banded_ntile(
    df: DataFrame,
    band: Column,
    order: Sequence[Column | str],
    k: int,
    out: str,
) -> DataFrame:
    """Exact ``NTILE(k) OVER (ORDER BY order)``: banded global rank, then
    NTILE's front-loaded allocation (first N mod k tiles get ceil(N/k))
    as a closed-form integer expression over (rank, N)."""
    j = _with_offsets(df, band, F.count(F.lit(1)), F.sum, F.lit(0), with_total=True)
    ranked = j.withColumn(
        "_rk", F.col("_off") + F.row_number().over(_order_window(order))
    )
    tile = F.expr(
        f"""CASE WHEN _rk <= (_N % {k}) * (_N div {k} + 1)
                 THEN (_rk - 1) div (_N div {k} + 1) + 1
                 ELSE (_N % {k})
                      + (_rk - (_N % {k}) * (_N div {k} + 1) - 1)
                        div (_N div {k}) + 1
            END"""
    )
    return ranked.withColumn(out, tile.cast("int")).drop(*_TMP)
