"""Bounded-error contract for the approx-quantile sketch face: Spark's
percentile_approx (GK sketch, accuracy=10000) must land within the rank
error bound of the exact interpolated percentile on the same data — the
check that stands in for a DuckDB oracle (different approx sketch there)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_approx_quantiles_within_rank_error(spark):
    from trike_spark.queries.sketches import sketch_quantiles_approx
    from trike_spark.io import load_table

    approx = {
        r["o_orderpriority"]: r
        for r in sketch_quantiles_approx(spark, SF_DIR).collect()
    }
    o = load_table(spark, SF_DIR, "orders")
    exact = {
        r["o_orderpriority"]: r
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("median_exact"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90_exact"),
        )
        .collect()
    }
    assert set(approx) == set(exact) and approx
    for prio, a in approx.items():
        e = exact[prio]
        # GK guarantees a RANK bound; translate loosely to value space by
        # allowing 2% relative error — generous vs accuracy=10000, tight
        # enough to catch a wrong-column / wrong-sketch regression.
        assert abs(a["median_approx"] - e["median_exact"]) <= 0.02 * e["median_exact"]
        assert abs(a["p90_approx"] - e["p90_exact"]) <= 0.02 * e["p90_exact"]
