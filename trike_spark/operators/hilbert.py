"""Hilbert-curve helpers: map two quantized dimensions onto the Hilbert
space-filling curve so that sorting by ONE integer clusters the data in
BOTH — like the Z-order (Morton) curve in :mod:`.zorder`, but without
Morton's long diagonal jumps.

Why a second curve: consecutive Morton codes can be geometrically FAR
apart (the z jumps from the end of one quadrant row to the start of the
next), so a file holding a contiguous z-range sometimes spans a tall thin
L-shape whose min/max bounding box is loose. Consecutive Hilbert codes
are always ADJACENT cells (curve property: every step is distance 1), so
contiguous code-ranges tile compact squares and the per-file min/max
footer stats are uniformly tight. This is why engines that cluster for
multi-dimensional skipping moved from Z-order to Hilbert (e.g. Delta
Lake's liquid clustering); measured here by
``tests/test_hilbert_layout.py``, which lays out the same data both ways
and compares summed per-file bounding-box areas.

Implementation: the standard xy→d walk (quadrant digit + rotate, the
classic iterative formulation) unrolled over the fixed bit depth. The
state updates per level are plain integer CASE arithmetic, emitted once
as SQL text and consumed by BOTH the Spark plan and the DuckDB oracle —
Spark via chained ``withColumn`` (each level is one projection, fused by
whole-stage codegen into straight-line JVM code; zero Python at run
time), DuckDB via an equivalent CTE chain — so faces built on it
hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hilbert_level_exprs", "hilbert_cte_sql", "with_hilbert_key"]


def hilbert_level_exprs(qx: str, qy: str, bits: int = 8) -> list[tuple[str, str, str]]:
    """Per-level state updates of the xy→d Hilbert walk, MSB→LSB.

    Returns ``bits`` triples ``(d_term, next_x, next_y)`` of SQL text.
    Level ``i`` (processing bit ``s = bits-1-i``) reads state columns
    ``{x}`` / ``{y}`` (the previous level's outputs) and emits:

    * ``d_term`` — this level's contribution ``s²·((3·rx) XOR ry)`` to
      the Hilbert distance,
    * ``next_x`` / ``next_y`` — the rotated/reflected coordinates the
      next level consumes (conditional swap + reflection, the loop body
      of the classic formulation).

    The snippets contain the placeholders ``{x}`` and ``{y}``; callers
    substitute their own column names per level. Shared by the Spark and
    DuckDB sides so both compute bit-identical keys.
    """
    out: list[tuple[str, str, str]] = []
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        rx = f"(({{x}}) >= {s})"  # this level's quadrant bits, as booleans
        ry = f"(({{y}}) >= {s})"
        rxi = f"(CASE WHEN {rx} THEN 1 ELSE 0 END)"
        ryi = f"(CASE WHEN {ry} THEN 1 ELSE 0 END)"
        # (3·rx) XOR ry over 0/1 operands == 3·rx + ry − 2·rx·ry: plain
        # arithmetic, because the engines disagree on the XOR spelling
        # (Spark `^`, DuckDB `xor()`), and shared text is the contract.
        d_term = (
            f"CAST({s} AS BIGINT) * {s} * "
            f"(3 * {rxi} + {ryi} - 2 * {rxi} * {ryi})"
        )
        # Drop this level's bit, then rotate the frame: when ry=0 the
        # lower half is traversed in a flipped orientation — reflect
        # (if rx=1) and swap x/y. When ry=1 the frame is upright.
        x_low = f"(({{x}}) % {s})"
        y_low = f"(({{y}}) % {s})"
        next_x = (
            f"CASE WHEN NOT {ry} AND {rx} THEN {s - 1} - {y_low} "
            f"WHEN NOT {ry} THEN {y_low} ELSE {x_low} END"
        )
        next_y = (
            f"CASE WHEN NOT {ry} AND {rx} THEN {s - 1} - {x_low} "
            f"WHEN NOT {ry} THEN {x_low} ELSE {y_low} END"
        )
        out.append((d_term, next_x, next_y))
    return out


def _subst(tpl: str, x: str, y: str) -> str:
    return tpl.replace("{x}", x).replace("{y}", y)


def hilbert_cte_sql(
    source_sql: str,
    qx: str,
    qy: str,
    bits: int = 8,
    carry: list[str] | None = None,
) -> str:
    """Full ``WITH``-chain SQL computing ``hkey`` for every row of
    ``source_sql`` (a query exposing integer columns ``qx``/``qy`` in
    ``[0, 2**bits)`` plus any ``carry`` columns to pass through).

    One CTE per level keeps the text linear in ``bits`` (naive textual
    substitution would blow up exponentially — each level's x/y is used
    several times by the next). Output query exposes ``hkey`` + carry.
    """
    carry = carry or []
    carry_sql = "".join(f", {c}" for c in carry)
    levels = hilbert_level_exprs(qx, qy, bits)
    parts = [f"_h0 AS (SELECT {qx} AS _hx, {qy} AS _hy, CAST(0 AS BIGINT) AS _hd{carry_sql} FROM ({source_sql}))"]
    for i, (d_term, nx, ny) in enumerate(levels):
        d = _subst(d_term, "_hx", "_hy")
        x = _subst(nx, "_hx", "_hy")
        y = _subst(ny, "_hx", "_hy")
        parts.append(
            f"_h{i + 1} AS (SELECT ({x}) AS _hx, ({y}) AS _hy, "
            f"_hd + ({d}) AS _hd{carry_sql} FROM _h{i})"
        )
    body = ",\n".join(parts)
    return f"WITH {body}\nSELECT _hd AS hkey{carry_sql} FROM _h{bits}"


def with_hilbert_key(
    df: DataFrame, qx: str, qy: str, out: str = "hkey", bits: int = 8
) -> DataFrame:
    """Spark side: attach the Hilbert key as chained projections.

    Each level is one ``withColumn`` trio over the previous state — the
    optimizer collapses the chain into a single whole-stage-codegen
    projection (verified by the layout test's plan check), so the cost
    is straight-line integer math per row, zero shuffles, zero Python.

    ``qx``/``qy`` must be non-negative integers below ``2**bits`` — the
    walk's ``>= s`` quadrant test only equals the classic bit test inside
    that domain, and an out-of-domain key would be silently off-curve
    (the DuckDB oracle runs the same arithmetic, so the hash gate can't
    catch it). Enforced here with a per-row ``raise_error`` guard: a bad
    quantizer fails the job loudly instead of degrading the layout.
    """
    n = 1 << bits
    for tmp in ("_hx", "_hy", "_hd", out):
        if tmp in df.columns:
            raise ValueError(
                f"with_hilbert_key reserves column name {tmp!r}; rename it first"
            )
    in_domain = (
        (F.col(qx) >= 0) & (F.col(qx) < n) & (F.col(qy) >= 0) & (F.col(qy) < n)
    )
    err = F.expr(
        f"raise_error(CONCAT('hilbert key out of [0, {n}) domain: qx=', "
        f"CAST({qx} AS STRING), ' qy=', CAST({qy} AS STRING)))"
    )
    cur = (
        df.withColumn("_hx", F.when(in_domain, F.col(qx)).otherwise(err).cast("bigint"))
        .withColumn("_hy", F.col(qy).cast("bigint"))
        .withColumn("_hd", F.lit(0).cast("bigint"))
    )
    for d_term, nx, ny in hilbert_level_exprs(qx, qy, bits):
        d = _subst(d_term, "_hx", "_hy")
        x = _subst(nx, "_hx", "_hy")
        y = _subst(ny, "_hx", "_hy")
        cur = (
            cur.withColumn("_hd2", F.col("_hd") + F.expr(d))
            .withColumn("_hx2", F.expr(x))
            .withColumn("_hy2", F.expr(y))
            .drop("_hd", "_hx", "_hy")
            .withColumnsRenamed({"_hd2": "_hd", "_hx2": "_hx", "_hy2": "_hy"})
        )
    return cur.withColumnRenamed("_hd", out).drop("_hx", "_hy")
