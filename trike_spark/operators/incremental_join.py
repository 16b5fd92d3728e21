"""Incremental view maintenance for inner equi-joins over versioned
tables — the delta-join identity:

    Δ(A ⋈ B) = ΔA ⋈ B_new  ∪  A_old ⋈ ΔB

(with ``B_new = B_old ∪ ΔB``; the asymmetry — new on one side, old on the
other — is what stops ΔA⋈ΔB from being double-counted). Appending the
delta to the materialized join view reproduces the full recomputation
exactly, while the work done is proportional to the DELTAS: at 100 TB,
maintaining a 1 GB/day-growing join costs two delta-sized joins instead
of re-joining two 100 TB tables.

Built directly on the versioned-table layer: inputs are snapshot paths +
the consumer's high-water versions (``read_incremental`` refuses to
silently cross an overwrite, so a compaction/delete on either base
forces an explicit full refresh — the same contract Delta/Materialized
Views expose). The maintained view itself is committed append-mode, so
downstream consumers can in turn read IT incrementally.

Limitation (documented, deliberate): inner joins only. Outer joins need
retraction (a null-padded row may need to be withdrawn when its match
arrives) — an append-only manifest log cannot express deletes; that is
the point where real IVM systems switch to a changelog representation
(Flink retract streams, Materialize's differential dataflow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from trike_spark import versioned


def incremental_join_delta(
    spark: SparkSession,
    path_a: str,
    path_b: str,
    on: list[str],
    since_a: int,
    since_b: int,
) -> tuple[DataFrame | None, int, int]:
    """Compute Δ(A ⋈ B) for the appends after (since_a, since_b).

    Returns (delta DataFrame or None if neither side grew, new high-water
    version of A, of B). Raises if either base table saw an overwrite
    past the high-water mark (resync via full recompute)."""
    delta_a, hw_a = versioned.read_incremental(spark, path_a, since_a)
    delta_b, hw_b = versioned.read_incremental(spark, path_b, since_b)
    if delta_a is None and delta_b is None:
        return None, hw_a, hw_b

    parts: list[DataFrame] = []
    if delta_a is not None:
        b_new = versioned.read_version(spark, path_b, hw_b)
        parts.append(delta_a.join(b_new, on))
    if delta_b is not None:
        if since_a >= 1:
            a_old = versioned.read_version(spark, path_a, since_a)
            parts.append(a_old.join(delta_b, on))
        # since_a == 0 → A_old is empty; ΔA ⋈ B_new already covered ΔA ⋈ ΔB
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out, hw_a, hw_b


def maintain_join_view(
    spark: SparkSession,
    path_a: str,
    path_b: str,
    on: list[str],
    view_path: str,
    state: dict | None = None,
) -> dict:
    """One maintenance tick: read both bases incrementally from the
    versions recorded in ``state`` ({'a': int, 'b': int}), commit the
    join delta (if any) to the versioned view at ``view_path``, and
    return the new state. Call repeatedly as the bases grow; the view's
    full content always equals the from-scratch join (asserted in
    tests/test_incremental_join.py)."""
    st = dict(state or {"a": 0, "b": 0})
    delta, hw_a, hw_b = incremental_join_delta(
        spark, path_a, path_b, on, st["a"], st["b"]
    )
    if delta is not None:
        versioned.commit(delta, view_path, mode="append")
    return {"a": hw_a, "b": hw_b}


# --- incremental aggregate maintenance (merge-on-read rollup) ---------------
#
# The aggregate counterpart of the delta join, using the segment design
# OLAP stores (Druid/Pinot) and Iceberg merge-on-read deletes share:
# each tick APPENDS the delta's partial aggregates (a monoid: SUM/COUNT
# partials per key), readers merge partials at query time (one small
# groupBy over segment rows, not base rows), and a compaction tick
# squashes the partial history into one segment via an overwrite commit.
# Correctness needs only that the aggregate is a commutative monoid —
# the same property Spark's own partial aggregation relies on.


def maintain_agg_view(
    spark: SparkSession,
    base_path: str,
    keys: list[str],
    sum_cols: list[str],
    view_path: str,
    state: dict | None = None,
) -> dict:
    """One tick: append the NEW base rows' partial (key → SUM(col)..,
    COUNT(*)) segment to the view. Work ∝ the delta."""
    from pyspark.sql import functions as F

    st = dict(state or {"base": 0})
    delta, hw = versioned.read_incremental(spark, base_path, st["base"])
    if delta is not None:
        seg = delta.groupBy(*keys).agg(
            *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
            F.count(F.lit(1)).alias("n_rows"),
        )
        versioned.commit(seg, view_path, mode="append")
    return {"base": hw}


def read_agg_view(
    spark: SparkSession, view_path: str, keys: list[str], sum_cols: list[str]
) -> DataFrame:
    """Merge-on-read: fold all partial segments into final aggregates —
    a groupBy over segment rows (≈ keys × ticks), never the base table."""
    from pyspark.sql import functions as F

    segs = versioned.read_version(spark, view_path)
    return segs.groupBy(*keys).agg(
        *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
        F.sum("n_rows").alias("n_rows"),
    )


def compact_agg_view(
    spark: SparkSession, view_path: str, keys: list[str], sum_cols: list[str]
) -> int:
    """Squash the partial-segment history into one segment (overwrite
    commit). Readers before/after see identical merged results; the
    read-time fold shrinks from O(ticks) segments to one. Note this is an
    overwrite, so incremental CONSUMERS of the view must resync — the
    same contract as any compaction."""
    merged = read_agg_view(spark, view_path, keys, sum_cols)
    return versioned.commit(merged, view_path, mode="overwrite")
