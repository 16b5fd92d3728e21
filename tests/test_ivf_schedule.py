"""Self-sizing IVF quantizer (r7 verdict item 3 — the `_lsh_schedule`
move for the IVF family): n_cells tracks √n via a per-label Lloyd split,
while every correctness SF reduces EXACTLY to the registered label-cell
structure so driver hashes stay bit-identical."""

from __future__ import annotations

import pytest

from trike_spark.queries import vectors as V

SF_DIR = "/root/testdata/sf0.001"


def test_schedule_is_identity_at_correctness_sfs():
    # n = 500 (sf0.001/sf0.01), 2000 (sf0.1), 10 labels → s = 1: the
    # registered plan, hashes unchanged
    for n in (500, 2000):
        assert V._ivf_schedule(n, 10) == 1


def test_schedule_tracks_sqrt_n():
    import math

    for n in (100_000, 1_000_000, 10**8, 10**9):
        s = V._ivf_schedule(n, 10)
        n_cells = 10 * s
        target = math.isqrt(n // V.IVF_CELL_OCC_FACTOR)
        # cells land within one label-multiple of the √(n/64) target
        assert target <= n_cells < target + 10, (n, n_cells, target)
    # monotone: more data never means fewer cells
    cells = [10 * V._ivf_schedule(n, 10) for n in (10**5, 10**6, 10**7, 10**8)]
    assert cells == sorted(cells)


@pytest.fixture
def forced_big_corpus():
    """Pretend the sf0.001 corpus is 200k vectors so the Lloyd-split path
    runs on real data; always restore the memo (other tests size off it).
    The memo key is (sf_dir, on-disk signature) as of round 9."""
    sf_dir = "forced-big"
    key = (sf_dir, V._emb_corpus_signature(sf_dir))
    V._EMB_STATS_CACHE[key] = (200_000, 10)
    yield sf_dir
    V._EMB_STATS_CACHE.pop(key, None)


def test_lloyd_split_partitions_the_corpus(spark, forced_big_corpus):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    s = V._ivf_schedule(200_000, 10)
    assert s > 1
    cells, members = V._coarse_cells(emb, forced_big_corpus)
    n = emb.count()
    # disjoint cover: every vector in exactly one cell
    assert members.count() == n
    assert members.select("vec_id").distinct().count() == n
    # cell ids are unique and bounded by the schedule
    ncells = cells.count()
    assert ncells == cells.select("cell").distinct().count()
    assert ncells <= 10 * s
    # members' cell ids all exist in the centroid table
    orphans = members.join(cells, "cell", "left_anti").count()
    assert orphans == 0


def test_split_centroids_are_member_means(spark, forced_big_corpus):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cells, members = V._coarse_cells(emb, forced_big_corpus)
    got = {r["cell"]: r["cvec"] for r in cells.collect()}
    ex = members.select("cell", F.posexplode("embedding").alias("i", "x"))
    want_rows = (
        ex.groupBy("cell", "i").agg(F.avg(F.col("x").cast("double")).alias("v")).collect()
    )
    want: dict[int, dict[int, float]] = {}
    for r in want_rows:
        want.setdefault(r["cell"], {})[r["i"]] = r["v"]
    for cell, cvec in got.items():
        for i, v in enumerate(cvec):
            assert abs(v - want[cell][i]) < 1e-6, (cell, i)


def test_ivf_search_runs_end_to_end_under_split_quantizer(spark, forced_big_corpus, monkeypatch):
    """The registered face, driven through the s>1 quantizer: still one
    probe cell per query, TOP_K rows max, descending cosine."""
    # route the face's sizing lookup to the forced stats for this sf_dir
    monkeypatch.setitem(
        V._EMB_STATS_CACHE, (SF_DIR, V._emb_corpus_signature(SF_DIR)), (200_000, 10)
    )
    df = V.sim_ivf_search(spark, SF_DIR)
    rows = df.collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r["q_vec_id"], []).append(r)
    assert per_q, "no results"
    for q, rs in per_q.items():
        assert len(rs) <= V.TOP_K
        assert len({r["probe_label"] for r in rs}) == 1  # single-probe
        cosines = [r["cosine"] for r in sorted(rs, key=lambda r: r["rk"])]
        assert cosines == sorted(cosines, reverse=True)


def test_emb_stats_cache_invalidates_on_corpus_rewrite(tmp_path, spark):
    """r8 ADVICE: regenerating a corpus under the same path in-process must
    re-size the schedule, not reuse stale stats — the memo key carries the
    on-disk (mtime, size) signature of the embeddings parquet."""
    import os
    import time

    from pyspark.sql import functions as F

    p = str(tmp_path)
    emb_small = spark.range(20).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 2).cast("int").alias("label"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    emb_small.write.mode("overwrite").parquet(os.path.join(p, "embeddings.parquet"))
    df1 = spark.read.parquet(os.path.join(p, "embeddings.parquet"))
    assert V._emb_stats(df1, p) == (20, 2)
    time.sleep(0.05)  # ensure mtime_ns moves even on coarse filesystems
    emb_big = spark.range(50).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 5).cast("int").alias("label"),
        F.array(F.lit(0.0), F.lit(1.0)).alias("embedding"),
    )
    emb_big.write.mode("overwrite").parquet(os.path.join(p, "embeddings.parquet"))
    df2 = spark.read.parquet(os.path.join(p, "embeddings.parquet"))
    assert V._emb_stats(df2, p) == (50, 5)  # stale key not reused
    V.clear_emb_stats_cache()
    assert V._emb_stats(df2, p) == (50, 5)
