"""Shared helpers for cross-engine (Spark ↔ DuckDB) deterministic results.

The driver hash-compares values, so floating-point aggregation order must
not leak into results. Strategy: do the arithmetic in exact DECIMAL (order-
independent, identical in both engines), then round + cast to DOUBLE at the
very end. The final decimal→double conversion is correctly-rounded in both
engines, so bits match.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for sf0.1 sums; at real 100 TB scale you would widen to
# DECIMAL(38,4) or aggregate per-partition and combine, but the testdata
# magnitudes fit comfortably.
DEC = "decimal(18,4)"


def dec(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def dsum(c: str | Column, scale: int = 2) -> Column:
    """Exact decimal sum → round → double. Order-independent."""
    return F.round(F.sum(dec(c)), scale).cast("double")


def davg(c: str | Column, scale: int = 6) -> Column:
    """avg as double-division of an exact decimal sum by the count —
    same two deterministic inputs in both engines → identical bits."""
    return F.round(F.sum(dec(c)).cast("double") / F.count(F.lit(1)), scale)


def sql_dec(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(18,4))"


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(SUM({sql_dec(expr)}), {scale}) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    return f"ROUND(CAST(SUM({sql_dec(expr)}) AS DOUBLE) / COUNT(*), {scale})"
