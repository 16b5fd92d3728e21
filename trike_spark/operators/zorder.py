"""Z-order (Morton) curve helpers: interleave the bits of two quantized
dimensions so that sorting by ONE integer clusters the data in BOTH.

Why this matters at 100 TB: parquet row-group (and file) min/max stats can
only prune a scan when the rows inside each unit are CLOSE in the filtered
column. A single-column sort gives perfect pruning on that column and none
on any other; the Z-curve trades a little of each for useful locality in
all interleaved dimensions — a contiguous z-range bounds a rectangle in
(x, y) space, so a 2-D predicate (date BETWEEN … AND price BETWEEN …)
skips most row groups. This is the layout trick behind Databricks Delta's
OPTIMIZE ZORDER BY and Iceberg's sort-order z-ordering; here it is plain
integer expressions + ``repartitionByRange`` — no engine extension needed.

The interleave is pure BIGINT bit math, generated once and shared verbatim
by the Spark plan and the DuckDB oracle, so faces built on it hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def z_expr_sql(qx: str, qy: str, bits: int = 8) -> str:
    """SQL expression interleaving two ``bits``-wide non-negative ints:
    x occupies even bit positions, y odd — identical text works in Spark
    SQL and DuckDB."""
    terms = []
    for i in range(bits):
        terms.append(f"((({qx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({qy} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def z_expr_spark(qx: str, qy: str, bits: int = 8) -> Column:
    return F.expr(z_expr_sql(qx, qy, bits))
