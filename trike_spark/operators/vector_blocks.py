"""Grid-partitioned all-pairs cosine — the Arrow/numpy execution of the
exact O(n²) baseline (driver contract "Similarity search" /
"Deduplication": embedding-cosine near-dup).

Why this exists: the pure-Catalyst form (grid equality join, then a
higher-order ``aggregate`` fold per pair) is plan-shape-correct but pays
~1 µs of interpreted lambda evaluation per pair — at n = 5 000 that is
12.5 M folds and dominated the whole benchmark. The fix is NOT to ship
pairs to Python (12.5 M × 2 × 64 floats of Arrow traffic); it is to ship
each grid CELL's input rows once (2·√tasks·n rows total) and form the
cell's cross product inside numpy, dimension-sequentially, so the
arithmetic is bit-for-bit the engines' left fold:

    acc_0 = 0;  acc_k = acc_{k-1} + a_k·b_k   (one vectorized step per k)

matches ``aggregate(zip_with(...), 0.0, +)`` in Spark and DuckDB's
``list_aggregate(..., 'sum')`` exactly — each partial sum is the same
IEEE double, so thresholding at ≥ t and ROUND(…, 6) agree with the
oracle everywhere, not just usually.

Scale posture: identical to the JVM grid join — every (a, b) pair meets
in exactly one (gr, gc) cell, shuffle volume is C·n + R·n, work is spread
over R·C tasks, and per-task memory is (n/R)·(n/C) doubles (pick R, C so
cells fit executor memory at the target n). The Python stage is Arrow-
batched and CPU-bound on vectorized numpy — the one hot path where the
escape hatch beats every JVM-expressible form we measured.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fold_dot(x: Column, y: Column) -> Column:
    """JVM-side deterministic dot (for the cheap n-row norm precompute)."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def block_cosine_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    r_blocks: int = 8,
    c_blocks: int = 8,
) -> DataFrame:
    """All unordered pairs with cosine ≥ ``threshold``; exact.

    Returns (vec_a, vec_b, cosine) with cosine UNROUNDED (callers round).
    """
    base = emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("emb"),
        F.sqrt(_fold_dot(F.col(vec_col), F.col(vec_col))).alias("nrm"),
    )
    # Each row enters its grid row as side 'a' (replicated over columns) and
    # its grid column as side 'b' (replicated over rows): every pair meets
    # in exactly one cell. ONE explode of a per-row generated tag array —
    # the former a ∪ b two-branch union referenced `base` twice, and Spark
    # does not CSE across union branches, so the embeddings scan AND the
    # per-row norm fold ran twice per query (the same duplication _grid_tag
    # had; identical row multiset either way).
    tags = F.concat(
        F.transform(
            F.sequence(F.lit(0), F.lit(c_blocks - 1)),
            lambda j: F.struct(
                F.pmod(F.col("vid"), F.lit(r_blocks)).cast("int").alias("gr"),
                j.cast("int").alias("gc"),
                F.lit("a").alias("side"),
            ),
        ),
        F.transform(
            F.sequence(F.lit(0), F.lit(r_blocks - 1)),
            lambda i: F.struct(
                i.cast("int").alias("gr"),
                F.pmod(F.col("vid"), F.lit(c_blocks)).cast("int").alias("gc"),
                F.lit("b").alias("side"),
            ),
        ),
    )
    tagged = (
        base.select("vid", "emb", "nrm", F.explode(tags).alias("t"))
        .select("vid", "emb", "nrm", "t.gr", "t.gc", "t.side")
        .repartition(r_blocks * c_blocks, "gr", "gc")
    )

    def cell_cross(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:  # empty partition
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if pdf.empty:
            return
        for _, cell in pdf.groupby(["gr", "gc"], sort=False):
            A = cell[cell["side"] == "a"]
            B = cell[cell["side"] == "b"]
            if A.empty or B.empty:
                continue
            Am = np.stack(A["emb"].to_numpy()).astype(np.float64)  # (nA, d)
            Bm = np.stack(B["emb"].to_numpy()).astype(np.float64)  # (nB, d)
            # dimension-sequential accumulation == the engines' left fold
            acc = np.zeros((Am.shape[0], Bm.shape[0]))
            for k in range(Am.shape[1]):
                acc += Am[:, k, None] * Bm[None, :, k]
            cos = acc / (A["nrm"].to_numpy()[:, None] * B["nrm"].to_numpy()[None, :])
            ids_a = A["vid"].to_numpy()
            ids_b = B["vid"].to_numpy()
            ia, ib = np.nonzero((cos >= threshold) & (ids_a[:, None] < ids_b[None, :]))
            if len(ia):
                yield pd.DataFrame(
                    {"vec_a": ids_a[ia], "vec_b": ids_b[ib], "cosine": cos[ia, ib]}
                )

    return tagged.mapInPandas(cell_cross, schema="vec_a bigint, vec_b bigint, cosine double")


def hyperplane_buckets(
    emb: DataFrame,
    planes: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Single-rotation hyperplane bucket assignment, Arrow-batched.

    Returns (vid, emb, bucket) where bucket = Σ_p (proj_p > 0) << p and each
    proj_p accumulates dimension-sequentially — bit-identical to the JVM
    ``aggregate(zip_with(...))`` fold and DuckDB's ``list_aggregate`` — so
    an oracle computing the same md5-derived planes lands every vector in
    the same bucket. One narrow map, no shuffle; replaces P interpreted HOF
    folds per row (the measured hot spot in sim_lsh_bucket_topk) with P
    vectorized numpy passes per Arrow batch.
    """
    n_planes, _dim = planes.shape

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            E = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)  # (n, d)
            bucket = np.zeros(E.shape[0], dtype=np.int64)
            for p in range(n_planes):
                proj = np.zeros(E.shape[0])
                for j in range(E.shape[1]):  # the engines' left fold
                    proj += E[:, j] * planes[p, j]
                bucket += (proj > 0).astype(np.int64) << p
            yield pd.DataFrame(
                {
                    "vid": pdf[id_col].to_numpy(),
                    "emb": pdf[vec_col].to_numpy(),
                    "bucket": bucket,
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        assign, schema="vid bigint, emb array<float>, bucket bigint"
    )


def lsh_bucket_cosine_pairs(
    emb: DataFrame,
    planes: "np.ndarray",
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int | None = 4096,
) -> DataFrame:
    """Sub-quadratic near-dup pairs: hyperplane-LSH buckets as candidate
    cells, exact cosine verify within each cell — both stages Arrow-batched
    numpy with the engines' dimension-sequential fold (bit-identical to the
    JVM HOF form and the DuckDB oracle; see module docstring).

    ``planes`` is (rotations, planes_per_rot, dim); a vector's bucket in
    rotation r is the sign pattern of its r-th plane block. Candidates =
    same (rot, bucket); callers dedupe pairs colliding in several rotations.

    Scale posture: stage 1 is a narrow map (no shuffle) emitting
    rotations·n bucket rows; the shuffle keys are (rot, bucket, grid cell),
    so compare work scales with bucket occupancy
    (≈ rotations·n²/2^planes for uniform data), not n².

    ``bucket_cap`` bounds per-task memory on skewed data: a bucket holding
    occ > cap rows is decomposed into a g×g grid (g = ⌈occ/cap⌉) exactly
    like :func:`block_cosine_pairs` — every pair still meets in exactly one
    cell, so the OUTPUT IS UNCHANGED; only task granularity changes. (The
    tempting alternative — splitting hot buckets on extra plane bits —
    silently drops pairs whose members land in different sub-buckets, i.e.
    trades an executor OOM for a recall loss the oracle would flag; the
    grid split costs g-fold replication of hot-bucket rows instead.)
    ``None`` disables the cap (test/DEBUG only).
    """
    n_rot, planes_per_rot, _dim = planes.shape

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            E = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)  # (n, d)
            nrm = np.zeros(E.shape[0])
            for k in range(E.shape[1]):  # sequential: matches sqrt(fold(x·x))
                nrm += E[:, k] * E[:, k]
            nrm = np.sqrt(nrm)
            out = []
            for r in range(n_rot):
                bucket = np.zeros(E.shape[0], dtype=np.int64)
                for k in range(planes_per_rot):
                    proj = np.zeros(E.shape[0])
                    for j in range(E.shape[1]):  # the engines' left fold
                        proj += E[:, j] * planes[r, k, j]
                    bucket += (proj > 0).astype(np.int64) << k
                out.append(
                    pd.DataFrame(
                        {
                            "vid": pdf[id_col].to_numpy(),
                            "emb": pdf[vec_col].to_numpy(),
                            "nrm": nrm,
                            "rot": r,
                            "bucket": bucket,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    bucketed = emb.select(id_col, vec_col).mapInPandas(
        assign,
        schema="vid bigint, emb array<float>, nrm double, rot int, bucket bigint",
    )
    tagged = _grid_tag(bucketed, bucket_cap)

    def bucket_cross(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if pdf.empty:
            return
        for _, cell in pdf.groupby(["rot", "bucket", "gr", "gc"], sort=False):
            if cell["side"].iat[0] == "ab":  # uncapped bucket: self-cross
                A = B = cell
            else:  # grid cell of a hot bucket: A×B cross
                A = cell[cell["side"] == "a"]
                B = cell[cell["side"] == "b"]
            if A.empty or B.empty or len(A) + len(B) < 2:
                continue
            Am = np.stack(A["emb"].to_numpy()).astype(np.float64)
            Bm = np.stack(B["emb"].to_numpy()).astype(np.float64)
            acc = np.zeros((Am.shape[0], Bm.shape[0]))
            for k in range(Am.shape[1]):
                acc += Am[:, k, None] * Bm[None, :, k]
            cos = acc / (A["nrm"].to_numpy()[:, None] * B["nrm"].to_numpy()[None, :])
            ids_a = A["vid"].to_numpy()
            ids_b = B["vid"].to_numpy()
            ia, ib = np.nonzero((cos >= threshold) & (ids_a[:, None] < ids_b[None, :]))
            if len(ia):
                yield pd.DataFrame(
                    {"vec_a": ids_a[ia], "vec_b": ids_b[ib], "cosine": cos[ia, ib]}
                )

    return (
        tagged.repartition("rot", "bucket", "gr", "gc")
        .mapInPandas(bucket_cross, schema="vec_a bigint, vec_b bigint, cosine double")
    )


def _grid_tag(bucketed: DataFrame, bucket_cap: int | None) -> DataFrame:
    """Decompose over-cap (rot, bucket) cells into a g×g pair-preserving
    grid (g = ⌈occupancy/cap⌉): a hot bucket's rows are replicated as an
    'a' side keyed by vid mod g over all grid columns and a 'b' side keyed
    over all grid rows, so every unordered pair meets in exactly one
    (gr, gc) cell — the :func:`block_cosine_pairs` scheme applied inside a
    bucket. Cold buckets pass through untouched as one self-cross cell
    ('ab'), costing no replication. The occupancy count reuses the
    (rot, bucket) hash partitioning the downstream repartition needs
    anyway, so the cap adds one window pass, not an extra shuffle of the
    corpus."""
    if bucket_cap is None:
        return bucketed.select(
            "*", F.lit(0).alias("gr"), F.lit(0).alias("gc"), F.lit("ab").alias("side")
        )
    from pyspark.sql import Window

    occ = F.count(F.lit(1)).over(Window.partitionBy("rot", "bucket"))
    with_g = bucketed.withColumn(
        "g", F.greatest(F.ceil(occ / F.lit(bucket_cap)), F.lit(1)).cast("int")
    )
    # One explode of a per-row generated tag array replaces the previous
    # cold ∪ hot_a ∪ hot_b three-branch union: those were three plan
    # references to the subtree above, and Spark does not CSE across union
    # branches, so the corpus-wide Python bucket-assignment stage (and the
    # occupancy window) executed THREE times per query — measured as 6
    # MapInPandas nodes in sim_lsh_bucket_topk's physical plan where the
    # algorithm needs 2. A cold row (g == 1) emits its single self-cross
    # cell; a hot row emits its g 'a'-cells plus g 'b'-cells — identical
    # rows to the old union, from exactly one pass over the input.
    g = F.col("g")
    cold_tag = F.array(
        F.struct(
            F.lit(0).alias("gr"), F.lit(0).alias("gc"), F.lit("ab").alias("side")
        )
    )
    hot_tags = F.concat(
        F.transform(
            F.sequence(F.lit(0), g - 1),
            lambda j: F.struct(
                F.pmod(F.col("vid"), g).cast("int").alias("gr"),
                j.cast("int").alias("gc"),
                F.lit("a").alias("side"),
            ),
        ),
        F.transform(
            F.sequence(F.lit(0), g - 1),
            lambda j: F.struct(
                j.cast("int").alias("gr"),
                F.pmod(F.col("vid"), g).cast("int").alias("gc"),
                F.lit("b").alias("side"),
            ),
        ),
    )
    return with_g.select(
        "vid", "emb", "nrm", "rot", "bucket",
        F.explode(F.when(g == 1, cold_tag).otherwise(hot_tags)).alias("tag"),
    ).select(
        "vid", "emb", "nrm", "rot", "bucket", "tag.gr", "tag.gc", "tag.side"
    )
