"""Bounded-error contract for the approx-quantile sketch face: Spark's
percentile_approx (GK sketch, accuracy=10000) must land within the rank
error bound of the exact interpolated percentile on the same data. The
face itself now emits the certification booleans (driver-hash-gated);
this test independently recomputes the raw values so a bound loosened by
accident in the face cannot hide a drifting sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_approx_quantiles_within_rank_error(spark):
    from trike_spark.io import load_table
    from trike_spark.queries.sketches import sketch_quantiles_approx

    # the face's own certification must hold
    face = sketch_quantiles_approx(spark, SF_DIR).collect()
    assert face and all(
        r["median_within_bound"] and r["p90_within_bound"] for r in face
    )

    # independent recomputation of both legs at the raw-value level
    o = load_table(spark, SF_DIR, "orders")
    rows = (
        o.groupBy("o_orderpriority")
        .agg(
            F.percentile_approx("o_totalprice", 0.5, 10000).alias("median_approx"),
            F.percentile_approx("o_totalprice", 0.9, 10000).alias("p90_approx"),
            F.percentile("o_totalprice", F.lit(0.5)).alias("median_exact"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90_exact"),
        )
        .collect()
    )
    assert len(rows) == len(face)
    for r in rows:
        # GK guarantees a RANK bound; translate loosely to value space by
        # allowing 2% relative error — generous vs accuracy=10000, tight
        # enough to catch a wrong-column / wrong-sketch regression.
        assert abs(r["median_approx"] - r["median_exact"]) <= 0.02 * r["median_exact"]
        assert abs(r["p90_approx"] - r["p90_exact"]) <= 0.02 * r["p90_exact"]
