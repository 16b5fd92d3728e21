"""Hot-bucket occupancy cap for the LSH cosine-pairs kernel
(operators/vector_blocks.py::lsh_bucket_cosine_pairs).

A skewed corpus can land thousands of near-identical vectors in one
hyperplane bucket; the cap decomposes such buckets into a pair-preserving
g×g grid so per-task memory is bounded. These tests pin the contract:
the OUTPUT is identical with and without the cap (the grid may only change
task granularity, never the pair set), and a synthetic hot bucket really
does split.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from trike_spark.operators.vector_blocks import _grid_tag, lsh_bucket_cosine_pairs

DIM = 8
CAP = 32


def _make_emb(spark, n_hot=150, n_cold=40, seed=7):
    """n_hot vectors clustered around one direction (one bucket), n_cold
    spread around (mostly distinct buckets)."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=DIM)
    rows = []
    for i in range(n_hot):
        v = base + rng.normal(scale=0.01, size=DIM)
        rows.append((i, [float(x) for x in v]))
    for i in range(n_cold):
        v = rng.normal(size=DIM)
        rows.append((n_hot + i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _planes(n_rot=2, per_rot=4, seed=3):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n_rot, per_rot, DIM))


def _pairs(df):
    return {
        (r["vec_a"], r["vec_b"], round(r["cosine"], 9)) for r in df.collect()
    }


def test_cap_preserves_pairs_exactly(spark):
    emb = _make_emb(spark)
    planes = _planes()
    uncapped = _pairs(lsh_bucket_cosine_pairs(emb, planes, threshold=0.5, bucket_cap=None))
    capped = _pairs(lsh_bucket_cosine_pairs(emb, planes, threshold=0.5, bucket_cap=CAP))
    assert len(uncapped) > 0
    assert capped == uncapped


def test_hot_bucket_actually_splits(spark):
    emb = _make_emb(spark)
    planes = _planes()
    from trike_spark.operators.vector_blocks import hyperplane_buckets  # noqa: F401

    # Reach into the tagging stage: bucket rows the same way the operator
    # does, then assert the grid decomposition kicked in for the hot bucket
    # and left cold buckets untouched.
    n_rot, per_rot, _ = planes.shape

    def norm_and_bucket(pdf_emb):  # JVM-free reference bucketing
        import pandas as pd

        E = np.stack(pdf_emb["embedding"]).astype(np.float64)
        out = []
        for r in range(n_rot):
            bucket = np.zeros(E.shape[0], dtype=np.int64)
            for k in range(per_rot):
                proj = np.zeros(E.shape[0])
                for j in range(E.shape[1]):
                    proj += E[:, j] * planes[r, k, j]
                bucket += (proj > 0).astype(np.int64) << k
            out.append(
                pd.DataFrame(
                    {
                        "vid": pdf_emb["vec_id"],
                        "emb": pdf_emb["embedding"],
                        "nrm": 1.0,
                        "rot": r,
                        "bucket": bucket,
                    }
                )
            )
        return pd.concat(out)

    pdf = norm_and_bucket(emb.toPandas())
    bucketed = spark.createDataFrame(
        pdf, "vid bigint, emb array<float>, nrm double, rot int, bucket bigint"
    )
    tagged = _grid_tag(bucketed, CAP).cache()
    sides = {r["side"] for r in tagged.select("side").distinct().collect()}
    assert sides == {"ab", "a", "b"}  # hot bucket split, cold passed through
    # every grid cell of a hot bucket holds at most ~2·cap rows (a+b sides)
    cell_max = (
        tagged.filter(F.col("side") != "ab")
        .groupBy("rot", "bucket", "gr", "gc")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert cell_max <= 2 * (CAP + 1)
    # cold buckets: exactly one cell, no replication
    cold_cells = (
        tagged.filter(F.col("side") == "ab")
        .select("gr", "gc")
        .distinct()
        .collect()
    )
    assert [(r["gr"], r["gc"]) for r in cold_cells] == [(0, 0)]
    tagged.unpersist()


def test_cap_one_equals_full_grid(spark):
    """Degenerate cap: every bucket splits maximally; output still equal."""
    emb = _make_emb(spark, n_hot=40, n_cold=10)
    planes = _planes(n_rot=1)
    uncapped = _pairs(lsh_bucket_cosine_pairs(emb, planes, threshold=0.5, bucket_cap=None))
    fully_split = _pairs(lsh_bucket_cosine_pairs(emb, planes, threshold=0.5, bucket_cap=1))
    assert fully_split == uncapped


def test_lsh_schedule_pins_occupancy_and_recall():
    """The corpus-size-adaptive (rotations, planes) schedule: exactly the
    registered 4x6 at every correctness SF (oracle hashes untouched),
    occupancy pinned ~LSH_TARGET_OCCUPANCY above them (candidate work
    linear in n — the r7 sf1->sf5 probe measured the fixed table
    super-linear, alpha 1.49), and recall restored by rotation growth."""
    from trike_spark.queries.dedup import (
        LSH_NEARDUP_COLLISION_P,
        LSH_TARGET_OCCUPANCY,
        LSH_TARGET_RECALL,
        _lsh_schedule,
    )

    # all driver/test scales: the registered configuration, bit-for-bit
    for n in (20, 200, 2000):
        assert _lsh_schedule(n) == (4, 6), n

    prev_planes = 0
    for n in (20_000, 100_000, 10**6, 10**8):
        rotations, planes = _lsh_schedule(n)
        # occupancy bounded: n / 2^planes stays within 2x of the target
        assert n / 2**planes <= 2 * LSH_TARGET_OCCUPANCY, n
        # monotone: more data never means fewer buckets
        assert planes >= max(prev_planes, 6)
        prev_planes = planes
        # recall restored: 1 - (1 - p^P)^R >= target
        p_band = LSH_NEARDUP_COLLISION_P**planes
        assert 1 - (1 - p_band) ** rotations >= LSH_TARGET_RECALL, n


def test_lsh_schedule_is_registered_config_at_actual_testdata_sizes():
    """The oracle SQL is pinned to the 4x6 configuration, so the Spark
    side's adaptive schedule MUST reduce to (4, 6) at the real row count
    of every oracle-checked/benched embeddings table — asserted against
    the parquet metadata itself, not hard-coded n values, so a testdata
    regeneration that crosses the 2048-row flip point fails here with a
    clear message instead of as a confusing driver hash mismatch."""
    from pathlib import Path

    import pyarrow.parquet as pq

    from trike_spark.queries.dedup import LSH_ROT_PLANES, LSH_ROTATIONS, _lsh_schedule

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        n = sum(
            pq.ParquetFile(part).metadata.num_rows
            for part in Path(f"/root/testdata/{sf}/embeddings.parquet").glob("*.parquet")
        )
        assert _lsh_schedule(n) == (LSH_ROTATIONS, LSH_ROT_PLANES), (
            f"{sf}: embeddings has {n} rows — the adaptive LSH schedule "
            f"gives {_lsh_schedule(n)} there, diverging from the oracle's "
            f"pinned {LSH_ROTATIONS}x{LSH_ROT_PLANES} configuration"
        )
