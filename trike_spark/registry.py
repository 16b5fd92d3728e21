"""Central query registry.

Every implemented operator from SURVEY.md §2 registers here as a
:class:`QuerySpec`: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus —
whenever the semantics are SQL-expressible — a DuckDB oracle SQL string the
driver runs side-by-side at sf0.01 (row-count + schema + order-insensitive
value-hash).

Determinism rules (so the value-hash matches across engines):
  * Money/measure aggregates are computed in exact DECIMAL arithmetic on
    BOTH sides, then ``round(_, N)`` and cast to DOUBLE — exact decimal sums
    are order-independent, so Spark's partial aggregation and DuckDB's
    single-threaded fold produce identical bits.
  * Every ORDER BY used for ranking/limiting carries a unique tie-break key.
  * Aggregate/computed columns are aliased identically in both dialects.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver records rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all_query_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    # Imports are side-effecting registrations.
    from trike_spark.queries import (  # noqa: F401
        aggregates,
        dedup,
        events,
        joins,
        multimodal,
        relational,
        scalars,
        setops,
        text,
        training_pipeline,
        trike_pipeline,
        vectors,
        windows,
    )


def queries() -> dict[str, QueryFn]:
    load_all_query_modules()
    return {name: spec.fn for name, spec in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    load_all_query_modules()
    return {name: spec.oracle for name, spec in sorted(REGISTRY.items()) if spec.oracle is not None}
