"""One-shot sf0.1 -> sf1.0 scale-curvature probe (r5 verdict item 4).

    python tools/gen_scale_probe.py /tmp/sf1     # once
    python tools/scale_probe.py [/tmp/sf1]

Times the heaviest headliners (plus the TPC-H controls) at sf0.1 and at
the 10x probe set, and prints the per-query scaling exponent
alpha = log10(t_sf1 / t_sf0.1): alpha = 1 is linear, < 1 means fixed
costs (scheduling, broadcast builds, JVM) still dominate at this size,
> 1 is super-linear growth that needs a documented reason. Results are
recorded in docs/BENCH_NOTES.md — this converts 'the plan should scale'
claims into measured curvature.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

PROBE = [
    # the 10 most expensive headliners by r5 driver medians
    "graph_knn_components",
    "dedup_lsh_band_sweep",
    "curation_split_cluster_safe",
    "graph_pagerank_fixedpoint",
    "pipeline_training_data_prep",
    "graph_kcore_peeling",
    "dedup_cluster_canonical",
    "dedup_editdistance_pairs",
    "dedup_ngram_jaccard_pairs",
    "sim_pq_rerank_topk",
    # TPC-H controls
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "q10_returned_items",
]

N_RUNS = 3


def main(sf1_dir: str = "/tmp/sf1") -> None:
    from trike_spark.cache import release_checkpoints
    from trike_spark.registry import REGISTRY, load_all_query_modules
    from trike_spark.session import get_spark

    load_all_query_modules()
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def best_of(name: str, sf_dir: str) -> float:
        REGISTRY[name].fn(spark, sf_dir).collect()  # warm-up
        release_checkpoints()
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
            release_checkpoints()
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        return min(runs)

    print(f"{'query':34s} {'sf0.1':>7s} {'sf1':>8s} {'alpha':>6s}")
    for name in PROBE:
        t_small = best_of(name, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
        t_big = best_of(name, sf1_dir)
        alpha = math.log10(t_big / t_small)
        print(f"{name:34s} {t_small:7.2f} {t_big:8.2f} {alpha:6.2f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
