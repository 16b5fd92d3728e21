"""Per-query profiler (optimization guide §1): isolate one registered query
in THIS session, time it (min/median of N collects, exactly the bench's
methodology), capture `.explain("formatted")`, and break the cost down by
stage via the UI REST API (shuffle bytes, task time, GC, spill).

Usage:
  SPARK_UI=true python tools/profile_query.py <name> [--runs 5] [--sf DIR]
      [--explain-only] [--plan-out FILE]

Stage rows are attributed to the query via setJobDescription; the warm-up
run is excluded from stage attribution by tagging only the timed runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain-only", action="store_true")
    ap.add_argument("--plan-out", default=None, help="write explain('formatted') here")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_UI", "true")
    from trike_spark.cache import release_checkpoints
    from trike_spark.registry import REGISTRY, load_all_query_modules
    from trike_spark.session import get_spark

    load_all_query_modules()
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    ui = sc.uiWebUrl  # e.g. http://host:4040
    app_id = sc.applicationId

    for name in args.names:
        fn = REGISTRY[name].fn
        df = fn(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if args.plan_out:
            with open(args.plan_out, "w") as f:
                f.write(plan)
        else:
            print(plan)
        release_checkpoints()
        if args.explain_only:
            continue

        # warm-up (untagged)
        t0 = time.perf_counter()
        fn(spark, args.sf).collect()
        warm = time.perf_counter() - t0
        release_checkpoints()

        jobs_before = {j["jobId"] for j in _rest(ui, f"/api/v1/applications/{app_id}/jobs")} if ui else set()

        times = []
        sc.setJobDescription(f"profile:{name}")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, args.sf).collect()
            times.append(time.perf_counter() - t0)
            release_checkpoints()
        sc.setJobDescription(None)
        times.sort()
        med = times[len(times) // 2]
        print(
            f"\n=== {name}: warm {warm:.3f}s | min {times[0]:.3f}s "
            f"| med {med:.3f}s | runs {[round(t, 3) for t in times]}"
        )

        if not ui:
            continue
        jobs = [j for j in _rest(ui, f"/api/v1/applications/{app_id}/jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j.get("stageIds", [])})
        rows = []
        for sid in stage_ids:
            try:
                st_list = _rest(ui, f"/api/v1/applications/{app_id}/stages/{sid}")
            except Exception:
                continue
            for st in st_list:
                if st.get("status") == "SKIPPED":
                    continue
                rows.append(
                    {
                        "stage": sid,
                        "name": st.get("name", "")[:60],
                        "tasks": st.get("numCompleteTasks"),
                        "ms": st.get("executorRunTime"),
                        "cpu_ms": (st.get("executorCpuTime") or 0) // 1_000_000,
                        "gc_ms": st.get("jvmGcTime"),
                        "in_mb": round((st.get("inputBytes") or 0) / 1e6, 1),
                        "sh_r_mb": round((st.get("shuffleReadBytes") or 0) / 1e6, 1),
                        "sh_w_mb": round((st.get("shuffleWriteBytes") or 0) / 1e6, 1),
                        "spill_mb": round((st.get("diskBytesSpilled") or 0) / 1e6, 1),
                    }
                )
        rows.sort(key=lambda r: -(r["ms"] or 0))
        total_ms = sum(r["ms"] or 0 for r in rows)
        print(f"stages (timed runs only, total executorRunTime {total_ms} ms across {args.runs} runs):")
        for r in rows[:25]:
            print(
                f"  s{r['stage']:>4} {r['ms']:>7}ms cpu{r['cpu_ms']:>7} gc{r['gc_ms']:>5} "
                f"t{r['tasks']:>3} in{r['in_mb']:>8} shR{r['sh_r_mb']:>8} shW{r['sh_w_mb']:>8} "
                f"sp{r['spill_mb']:>6}  {r['name']}"
            )


if __name__ == "__main__":
    main()
