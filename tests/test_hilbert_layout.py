"""Hilbert layout: (1) the unrolled SQL walk equals the classic xy→d
reference bit-for-bit and is a true Hilbert curve (bijective, unit steps);
(2) `io.write_hilbert` produces parquet footer boxes at least as tight as
the Z-order layout on identical data — the no-long-jumps property, measured
on the thing pruning actually consumes."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from trike_spark.io import load_table, write_hilbert, write_zorder
from trike_spark.operators.hilbert import with_hilbert_key
from trike_spark.operators.zorder import z_expr_spark

SF_DIR = "/root/testdata/sf0.01"

_QP = "GREATEST(0, LEAST(255, CAST(FLOOR(o_totalprice / 2000) AS BIGINT)))"
_QD = "GREATEST(0, LEAST(255, CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS BIGINT) div 10))"


def _xy2d(n: int, x: int, y: int) -> int:
    """Classic iterative Hilbert xy→d (the public-domain textbook form)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_reference_and_is_a_curve(spark):
    """Spark chain == classic walk on the full 32×32 grid; bijective; every
    consecutive key step moves exactly one cell (the property Morton lacks
    and the reason Hilbert boxes are tighter)."""
    bits, n = 5, 32
    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, "qx long, qy long")
    got = {
        (r["qx"], r["qy"]): r["hkey"]
        for r in with_hilbert_key(df, "qx", "qy", bits=bits).collect()
    }
    assert got == {(x, y): _xy2d(n, x, y) for x, y in pts}
    inv = {h: xy for xy, h in got.items()}
    assert len(inv) == n * n  # bijective
    assert all(
        abs(inv[i][0] - inv[i + 1][0]) + abs(inv[i][1] - inv[i + 1][1]) == 1
        for i in range(n * n - 1)
    )


def test_hilbert_duckdb_oracle_parity(spark):
    """The DuckDB CTE chain and the Spark projection chain must agree key
    by key — a layout is a cluster-wide contract, so every writer (and the
    driver's oracle) has to compute the identical curve."""
    import duckdb

    from trike_spark.operators.hilbert import hilbert_cte_sql

    bits, n = 8, 256
    pts = [(x, y) for x in range(0, n, 7) for y in range(0, n, 11)] + [
        (0, 0), (n - 1, n - 1), (0, n - 1), (n - 1, 0)
    ]
    df = spark.createDataFrame(pts, "qx long, qy long")
    spark_keys = {
        (r["qx"], r["qy"]): r["hkey"]
        for r in with_hilbert_key(df, "qx", "qy", bits=bits).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (qx BIGINT, qy BIGINT)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    q = hilbert_cte_sql("SELECT qx, qy FROM pts", "qx", "qy", bits, carry=["qx", "qy"])
    duck_keys = {(x, y): h for h, x, y in con.execute(q).fetchall()}
    assert spark_keys == duck_keys


def _rowgroup_box_area(path_glob: str) -> float:
    """Σ over row groups of normalized (price range × date range)."""
    total = 0.0
    for f in glob.glob(path_glob):
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            ps = g.column(names["o_totalprice"]).statistics
            ds = g.column(names["o_orderdate"]).statistics
            price_rng = (ps.max - ps.min) / 500_000.0
            date_rng = (ds.max - ds.min).total_seconds() / (2_500 * 86_400.0)
            total += price_rng * date_rng
    return total


def test_hilbert_boxes_beat_natural_and_match_or_beat_zorder(spark, tmp_path):
    o = load_table(spark, SF_DIR, "orders")

    natural = str(tmp_path / "natural")
    o.repartition(8).write.parquet(natural)
    hpath = str(tmp_path / "hilbert")
    q = o.selectExpr(f"{_QP} AS qx", f"{_QD} AS qy", "*")
    write_hilbert(q, hpath, "qx", "qy", bits=8, n_files=8)
    zpath = str(tmp_path / "zordered")
    write_zorder(o, zpath, z_expr_spark(_QP, _QD, 8), n_files=8)

    a_nat = _rowgroup_box_area(natural + "/*.parquet")
    a_h = _rowgroup_box_area(hpath + "/*.parquet")
    a_z = _rowgroup_box_area(zpath + "/*.parquet")
    # same ≥2× gate as the z-order test vs natural order…
    assert a_h < a_nat / 2, (a_h, a_nat)
    # …and the curve with no quadrant jumps must not be LOOSER than Morton
    # (10% slack: file-boundary placement is data-dependent).
    assert a_h <= a_z * 1.10, (a_h, a_z)

    # the layout must not lose or alter rows
    assert spark.read.parquet(hpath).count() == o.count()


def test_hilbert_2d_predicate_skips_files(spark, tmp_path):
    """File-level pruning proxy, mirroring the Z-order variant: footer
    boxes of most Hilbert-clustered files must miss a narrow price band."""
    o = load_table(spark, SF_DIR, "orders")
    q = o.selectExpr(f"{_QP} AS qx", f"{_QD} AS qy", "*")
    hpath = str(tmp_path / "h2")
    write_hilbert(q, hpath, "qx", "qy", bits=8, n_files=32)

    lo_p, hi_p = 130_000.0, 150_000.0
    files = glob.glob(hpath + "/*.parquet")
    touched = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        ps = meta.row_group(0).column(names["o_totalprice"]).statistics
        pmin, pmax = ps.min, ps.max
        for rg in range(1, meta.num_row_groups):
            s = meta.row_group(rg).column(names["o_totalprice"]).statistics
            pmin, pmax = min(pmin, s.min), max(pmax, s.max)
        if not (pmax < lo_p or pmin > hi_p):
            touched += 1
    assert len(files) >= 16
    assert touched <= len(files) // 2, (touched, len(files))

    # pruning must not change answers
    from pyspark.sql import functions as F

    got = (
        spark.read.parquet(hpath)
        .filter(F.col("o_totalprice").between(lo_p, hi_p))
        .count()
    )
    want = o.filter(F.col("o_totalprice").between(lo_p, hi_p)).count()
    assert got == want


def test_hilbert_out_of_domain_fails_loudly(spark):
    """Values ≥ 2**bits are off-curve and the oracle runs the SAME
    arithmetic, so the hash gate is blind to them — the operator must
    raise instead of silently degrading the layout."""
    import pytest

    df = spark.createDataFrame([(300, 2)], "qx long, qy long")
    with pytest.raises(Exception, match="hilbert key out of"):
        with_hilbert_key(df, "qx", "qy", bits=8).collect()


def test_hilbert_reserved_column_collision_raises(spark):
    import pytest

    df = spark.createDataFrame([(1, 2, 3)], "qx long, qy long, _hx long")
    with pytest.raises(ValueError, match="reserves column name"):
        with_hilbert_key(df, "qx", "qy")
