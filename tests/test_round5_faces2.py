"""Second property-test pack for round-5 faces: guarantees the DuckDB
hash gate cannot express — completeness of the spatial grid prune vs a
brute-force control, the DDSketch relative-error bound, IPF marginal
convergence, and the KMV sub-K exact branch. All at sf0.001."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_spatial_grid_join_complete_vs_bruteforce(spark):
    """The 3x3-neighbor cell probe must find EXACTLY the pairs the O(n²)
    brute-force join finds — the grid is a prune, never a filter."""
    from trike_spark.queries.dedup import _h60
    from trike_spark.queries.joins import (
        GEO_R_M,
        GEO_SIDE_M,
        join_spatial_grid_radius,
    )

    got = {
        (r["cust_a"], r["cust_b"], r["dist_sq_m2"])
        for r in join_spatial_grid_radius(spark, SF_DIR).collect()
    }
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (_h60(F.concat(F.lit("x"), F.col("c_custkey").cast("string"))) % GEO_SIDE_M).alias("x"),
        (_h60(F.concat(F.lit("y"), F.col("c_custkey").cast("string"))) % GEO_SIDE_M).alias("y"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    d2 = (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x")) + (
        F.col("a.y") - F.col("b.y")
    ) * (F.col("a.y") - F.col("b.y"))
    brute = {
        (r["cust_a"], r["cust_b"], r["dist_sq_m2"])
        for r in a.crossJoin(b)
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(d2 <= GEO_R_M * GEO_R_M)
        .select(
            F.col("a.id").alias("cust_a"),
            F.col("b.id").alias("cust_b"),
            d2.cast("bigint").alias("dist_sq_m2"),
        )
        .collect()
    }
    assert got == brute


def test_ddsketch_relative_error_within_gamma_bound(spark):
    """Every DDSketch estimate must sit within the gamma-1 relative-error
    guarantee of the exact quantile (with midpoint-estimate slack)."""
    from trike_spark.queries.sketches import DD_GAMMA, sketch_ddsketch_quantiles

    rows = sketch_ddsketch_quantiles(spark, SF_DIR).collect()
    assert len(rows) == 3
    bound = DD_GAMMA - 1.0  # ±(gamma-1) with the 2g/(g+1) midpoint estimate
    for r in rows:
        assert r["rel_err"] <= bound + 1e-9, (
            f"q={r['q']}: rel_err {r['rel_err']} exceeds {bound}"
        )


def test_ipf_raking_hits_both_marginals(spark):
    """After 2 IPF rounds the source marginal (fitted last) must be
    exactly uniform and the lang marginal close to uniform."""
    from trike_spark.queries.curation import curation_raking_ipf

    rows = curation_raking_ipf(spark, SF_DIR).collect()
    langs = {r["lang"] for r in rows}
    sources = {r["source"] for r in rows}
    lang_shares = {r["lang"]: r["lang_share"] for r in rows}
    source_shares = {r["source"]: r["source_share"] for r in rows}
    t_lang, t_source = 1.0 / len(langs), 1.0 / len(sources)
    for s, v in source_shares.items():
        assert abs(v - t_source) < 1e-4, f"source {s}: {v} vs {t_source}"
    for lg, v in lang_shares.items():
        assert abs(v - t_lang) < 0.05, f"lang {lg}: {v} vs {t_lang}"


def test_kmv_subk_branch_is_exact(spark):
    """At the smoke scale both sides have fewer than K distinct members,
    so the KMV estimates must EQUAL the exact counts (the sketch IS the
    set) and the union estimate must equal the exact union."""
    from trike_spark.queries.sketches import KMV_K, sketch_kmv_setops

    r = sketch_kmv_setops(spark, SF_DIR).collect()[0]
    assert r["exact_a"] < KMV_K and r["exact_b"] < KMV_K
    assert r["est_a"] == float(r["exact_a"])
    assert r["est_b"] == float(r["exact_b"])
    assert r["est_union"] == float(r["exact_union"])
    assert r["est_intersection"] == float(r["exact_intersection"])
