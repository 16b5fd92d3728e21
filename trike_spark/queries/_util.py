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

# DECIMAL(38,4): wide enough that even 100 TB-scale sums cannot overflow the
# accumulator (10^34 headroom above the 4 fraction digits). Spark widens
# SUM(decimal(38,4)) to decimal(38,4) (cap) and DuckDB keeps DECIMAL(38,4),
# so both engines fold in exact, order-independent arithmetic.
DEC = "decimal(38,4)"

# Multiplication operands stay at DECIMAL(18,4): the product of two (18,4)
# values is (37,8) — still exact within Spark's 38-digit cap. Widening the
# OPERANDS to (38,4) would push the product past precision 38 and trigger
# Spark's allowPrecisionLoss scale truncation (38,6), a double-rounding hazard
# vs DuckDB's exact (but differently-typed) product. SUMs over the exact
# product still accumulate at precision 38 in both engines.
DECMUL = "decimal(18,4)"


def dec(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def mdec(c: str | Column) -> Column:
    """Cast for a multiplication operand — see DECMUL note."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DECMUL)


def dsum(c: str | Column, scale: int = 2) -> Column:
    """Exact decimal sum → round → double. Order-independent."""
    return F.round(F.sum(dec(c)), scale).cast("double")


def davg(c: str | Column, scale: int = 6) -> Column:
    """avg as double-division of an exact decimal sum by the count —
    same two deterministic inputs in both engines → identical bits."""
    return F.round(F.sum(dec(c)).cast("double") / F.count(F.lit(1)), scale)


def sql_dec(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(38,4))"


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(SUM({sql_dec(expr)}), {scale}) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    return f"ROUND(CAST(SUM({sql_dec(expr)}) AS DOUBLE) / COUNT(*), {scale})"
