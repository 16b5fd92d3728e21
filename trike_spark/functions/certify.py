"""Shared predicates for certification faces — queries whose approximate
leg is engine-specific (HLL++, GK sketches) and therefore cannot be
hash-compared across engines directly. The face instead emits the exact
leg plus a boolean asserting the approximation landed within its bound;
the DuckDB oracle emits literal TRUE, so a drifting sketch flips the
boolean and fails the driver hash. One definition so the faces cannot
silently diverge on bound semantics."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def within_rel_bound(approx: str, exact: str, bound: float) -> Column:
    """|approx − exact| ≤ bound · exact, as a Column predicate.

    Assumes a strictly-positive ``exact`` leg (counts, prices) — with
    exact = 0 the bound degenerates to requiring approx = 0 exactly,
    which is the conservative failure mode, not a silent pass."""
    return F.abs(F.col(approx) - F.col(exact)) <= F.lit(bound) * F.col(exact)
