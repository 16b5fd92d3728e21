"""Dump `.explain("formatted")` for registered queries to a directory.

Usage: python tools/dump_plans.py OUTDIR [--suffix _before] [name ...]
Default name set: the bench HEADLINE list.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir = sys.argv[1]
    rest = sys.argv[2:]
    suffix = "_before"
    if rest and rest[0] == "--suffix":
        suffix = rest[1]
        rest = rest[2:]
    os.makedirs(outdir, exist_ok=True)

    from bench import HEADLINE
    from trike_spark.cache import release_checkpoints
    from trike_spark.registry import REGISTRY, load_all_query_modules
    from trike_spark.session import get_spark

    load_all_query_modules()
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    names = rest or [n for n in HEADLINE if n in REGISTRY]
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}{suffix}.txt"), "w") as f:
            f.write(plan)
        release_checkpoints()
        print("wrote", name)


if __name__ == "__main__":
    main()
