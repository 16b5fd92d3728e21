"""Physical-plan introspection — the engine's guardrails for 100 TB scale.

Correctness says *what* a query returns; these helpers pin *how*: filters
reach the parquet scan (PushedFilters), small dims broadcast instead of
shuffling the fact, projections prune columns (ReadSchema), and the hot
path stays inside WholeStageCodegen. Tests assert these properties so a
regression in plan shape fails CI the same way a wrong result would.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_tree(df: DataFrame) -> str:
    """Just the operator tree (formatted output repeats every operator in
    the details section, which double-counts naive string counts)."""
    full = formatted_plan(df)
    return full.split("\n\n(", 1)[0]


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    return any(fragment in pf for pf in pushed_filters(df))


def broadcast_join_count(df: DataFrame) -> int:
    return plan_tree(df).count("BroadcastHashJoin")


def shuffle_count(df: DataFrame) -> int:
    """Exchange operators in the plan (AQE may collapse some at runtime)."""
    return len(re.findall(r"\bExchange\b", plan_tree(df)))


def sort_merge_join_count(df: DataFrame) -> int:
    return plan_tree(df).count("SortMergeJoin")


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — proves column pruning."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", formatted_plan(df))


def wholestage_codegen_ids(df: DataFrame) -> set[str]:
    return set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df)))


def scan_count(df: DataFrame) -> int:
    return plan_tree(df).count("Scan parquet")
