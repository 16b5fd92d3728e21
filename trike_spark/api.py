"""User-facing convenience API: the 'switch from the reference' surface.

A trike user gets (a) the streaming ingest pipeline (streaming/), (b) the
full relational/LLM query registry, and (c) ad-hoc SQL over the testdata
star schema — all from one import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from trike_spark.io import register_views
from trike_spark.registry import REGISTRY, load_all_query_modules


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run ad-hoc SQL against the registered testdata views (region,
    nation, customer, supplier, part, orders, lineitem, events, documents,
    embeddings) — Catalyst plans it like any registry query."""
    register_views(spark, sf_dir)
    return spark.sql(query)


def run(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Run a registered operator by name (see docs/OPERATORS.md)."""
    load_all_query_modules()
    if name not in REGISTRY:
        raise KeyError(
            f"unknown query {name!r}; available: {sorted(REGISTRY)[:5]}... "
            f"({len(REGISTRY)} total)"
        )
    return REGISTRY[name].fn(spark, sf_dir)


def catalog() -> dict[str, str]:
    """name → one-line description of every registered operator."""
    load_all_query_modules()
    return {n: (s.doc or "").strip().splitlines()[0] if s.doc else "" for n, s in sorted(REGISTRY.items())}
