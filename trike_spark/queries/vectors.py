"""Similarity-search operators over ``embeddings`` (driver contract
"Similarity search"): brute-force cosine top-k as the exact baseline, a
random-hyperplane-LSH bucketed variant as the scale path, and an
IVF-flavored centroid aggregation.

Scale notes:
  * Brute force broadcasts the (small) query set and streams candidates —
    a single narrow pass + per-query top-k window; cost O(|Q|·|C|) but
    embarrassingly parallel and shuffle-light (only the k·|Q| survivors).
  * The LSH path assigns each vector a deterministic hyperplane-sign
    bucket; candidate generation joins on bucket equality so compared-pair
    count scales with bucket occupancy, not |C|². Hyperplanes are derived
    from md5 (cross-engine reproducible), not a runtime RNG.
  * The dot product folds left-to-right over the array in BOTH engines
    (Spark ``aggregate``, DuckDB ``list_aggregate``) after exact
    float→double casts, so cosine bits match without rounding tricks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from trike_spark import cache
from trike_spark.io import load_table
from trike_spark.registry import register

N_QUERIES = 10  # vec_id < 10 are the query set
TOP_K = 5
LSH_PLANES = 12  # hyperplane count → 4096 buckets
DIM = 64

# Banded OR-amplification for the QUERY path. A single 12-bit table is far
# too selective for near-isotropic embeddings — measured on sf0.01 against
# brute-force truth (recall@5 / mean candidates per query, corpus 500):
#   1 band  × 12 bits: 0.00 /   0      (every query alone in its bucket)
#   2 bands ×  6 bits: 0.08 /  17
#   3 bands ×  4 bits: 0.48 /  97   ← chosen: useful recall at ~20 % scan
#   4 bands ×  3 bits: 0.64 / 207      (42 % of the corpus — barely "A"NN)
# A candidate collides if it matches the query in ANY band (the classic
# b×r OR-construction). Band keys are bitmasks of the one packed bucket, so
# the Arrow kernel is unchanged and the banding is a free JVM projection.
LSH_BANDS = 3
LSH_BAND_W = LSH_PLANES // LSH_BANDS
_BAND_MASKS = [((1 << LSH_BAND_W) - 1) << (LSH_BAND_W * t) for t in range(LSH_BANDS)]


def dot(x: Column, y: Column) -> Column:
    """Sequential left fold — deterministic, matches DuckDB list_aggregate.

    Measured note: unrolling this to a flat 64-term element_at expression
    tree was tried and is ~2× SLOWER — the giant expression exceeds
    codegen's method limits, falls back to interpreted element_at chains,
    and loses the HOF fold's tight array loop. The fold is the fastest
    exact-deterministic JVM form; the step beyond it is the Arrow-batched
    numpy path in operators/vector_blocks.py (same bit-exact fold order)."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(x: Column, y: Column) -> Column:
    return dot(x, y) / (F.sqrt(dot(x, x)) * F.sqrt(dot(y, y)))


_SQL_DOT_AB = (
    "list_aggregate(list_transform(list_zip(a.embedding, b.embedding), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
)


def _sql_norm(alias: str) -> str:
    return (
        f"SQRT(list_aggregate(list_transform({alias}.embedding, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    )


_SQL_COS = f"{_SQL_DOT_AB} / ({_sql_norm('a')} * {_sql_norm('b')})"


@register(
    "sim_topk_bruteforce",
    f"""
    SELECT q_vec_id, n_vec_id, cosine, rk FROM (
      SELECT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id,
             ROUND({_SQL_COS}, 6) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                ORDER BY ROUND({_SQL_COS}, 6) DESC, b.vec_id) AS rk
      FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES})
    WHERE rk <= {TOP_K}
    """,
    doc=f"Exact ANN baseline: top-{TOP_K} cosine neighbors for {N_QUERIES} query vectors.",
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(F.col("vec_id").alias("n_vec_id"), F.col("embedding").alias("n_emb"))
    cos = F.round(cosine(F.col("q_emb"), F.col("n_emb")), 6)
    w = Window.partitionBy("q_vec_id").orderBy(F.col("cosine").desc(), F.col("n_vec_id"))
    return (
        c.crossJoin(broadcast(q))
        .filter(F.col("n_vec_id") != F.col("q_vec_id"))
        .select("q_vec_id", "n_vec_id", cos.alias("cosine"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


@register(
    "sim_range_search",
    f"""
    SELECT b.vec_id, ROUND({_SQL_COS}, 6) AS cosine
    FROM (SELECT * FROM embeddings WHERE vec_id = 0) a
    JOIN embeddings b ON b.vec_id <> 0
    WHERE {_SQL_COS} >= 0.30
    """,
    doc="Range search: all vectors within cosine ≥ 0.30 of query vec_id=0.",
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    cos = cosine(F.col("q_emb"), F.col("embedding"))
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(broadcast(q))
        .filter(cos >= 0.30)
        .select("vec_id", F.round(cos, 6).alias("cosine"))
    )


def _plane_values(p: int) -> list[float]:
    """Deterministic pseudo-random hyperplane components in [-1, 1):
    md5-derived with the same formula the oracle SQL uses, but computed
    once at PLAN BUILD time — they're constants, so paying 12×64 md5 calls
    per row would be pure waste (Catalyst doesn't constant-fold through
    higher-order lambdas)."""
    import hashlib

    out = []
    for j in range(DIM):
        h = int(hashlib.md5(f"plane{p}:{j}".encode()).hexdigest()[:15], 16)
        out.append((h % 2000) / 1000.0 - 1.0)
    return out


def _sql_plane_component(p: int, j_expr: str) -> str:
    h = f"CAST(('0x' || substr(md5('plane{p}:' || CAST({j_expr} AS VARCHAR)), 1, 15)) AS BIGINT)"
    return f"(CAST({h} % 2000 AS DOUBLE) / 1000.0 - 1.0)"


# Shared bucketing CTE (12-bit packed bucket per vector) and the banded
# candidate CTE (collide in ANY of the 3 band bitmasks) — used by the
# bucket-topk / recall@k / NDCG@k query faces.
_SQL_BUCKETED = f"""planes AS (
      SELECT vec_id, embedding,
             {', '.join(
                 "CASE WHEN list_aggregate(list_transform(list_zip(embedding, "
                 f"list_transform(generate_series(0, {DIM - 1}), j -> {_sql_plane_component(p, 'j')})), "
                 "p -> CAST(p[1] AS DOUBLE) * p[2]), 'sum') > 0 "
                 f"THEN {1 << p} ELSE 0 END AS b_{p}"
                 for p in range(LSH_PLANES)
             )}
      FROM embeddings),
    bucketed AS (SELECT vec_id, embedding,
                        {' + '.join(f'b_{p}' for p in range(LSH_PLANES))} AS bucket
                 FROM planes)"""

_SQL_BAND_COND = " OR ".join(
    f"(a.bucket & {m}) = (b.bucket & {m})" for m in _BAND_MASKS
)

_SQL_CAND = f"""cand AS (
      SELECT DISTINCT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id
      FROM bucketed a JOIN bucketed b
        ON b.vec_id <> a.vec_id AND ({_SQL_BAND_COND})
      WHERE a.vec_id < {N_QUERIES})"""


def _banded_candidates(spark: SparkSession, sf_dir: str):
    """DISTINCT (q_vec_id, n_vec_id) candidate pairs colliding in at least
    one band, plus the embeddings scan for reuse. One Arrow bucketing pass
    per side; each band is its own broadcast equi-join on the masked key
    (never an OR-join, which would degenerate to a cartesian at scale);
    the union dedupes on the pair key only."""
    import numpy as np

    from trike_spark.operators.vector_blocks import hyperplane_buckets

    from trike_spark import cache

    emb = load_table(spark, sf_dir, "embeddings")
    planes = np.array([_plane_values(p) for p in range(LSH_PLANES)])
    # The query-side filter sits BELOW the kernel — predicates don't push
    # through mapInPandas, so filtering first keeps that pass at |Q| rows.
    # Both bucket tables are checkpointed: each feeds one join leg PER BAND
    # below and Spark does not CSE across union branches, so without the
    # materialization the corpus-wide Arrow bucketing pass executes once
    # per band (measured: 6 MapInPandas nodes in the physical plan for 2
    # kernel passes). The materialized rows are (vid, bucket) — 16 bytes a
    # row at any corpus size, vs re-shipping every embedding across the
    # Python boundary band-times.
    a = cache.checkpoint(
        hyperplane_buckets(emb.filter(F.col("vec_id") < N_QUERIES), planes).select(
            F.col("vid").alias("q_vec_id"), F.col("bucket").alias("q_bucket")
        )
    )
    b = cache.checkpoint(
        hyperplane_buckets(emb, planes).select(
            F.col("vid").alias("n_vec_id"), F.col("bucket").alias("n_bucket")
        )
    )
    legs = [
        b.join(
            broadcast(a),
            (F.col("n_bucket").bitwiseAND(F.lit(m)) == F.col("q_bucket").bitwiseAND(F.lit(m)))
            & (F.col("n_vec_id") != F.col("q_vec_id")),
        ).select("q_vec_id", "n_vec_id")
        for m in _BAND_MASKS
    ]
    cand = legs[0]
    for leg in legs[1:]:
        cand = cand.unionByName(leg)
    return cand.distinct(), emb


@register(
    "sim_lsh_bucket_topk",
    f"""
    WITH {_SQL_BUCKETED},
    {_SQL_CAND}
    SELECT q_vec_id, n_vec_id, cosine, rk FROM (
      SELECT c.q_vec_id, c.n_vec_id,
             ROUND({_SQL_COS}, 6) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY c.q_vec_id
                                ORDER BY ROUND({_SQL_COS}, 6) DESC, c.n_vec_id) AS rk
      FROM cand c JOIN embeddings a ON a.vec_id = c.q_vec_id
                  JOIN embeddings b ON b.vec_id = c.n_vec_id)
    WHERE rk <= {TOP_K}
    """,
    doc=(
        f"ANN scale path: {LSH_BANDS}×{LSH_BAND_W}-bit banded hyperplane LSH "
        f"(OR-amplified), rerank candidates, top-{TOP_K}."
    ),
)
def sim_lsh_bucket_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH ANN: candidates collide with the query in ANY of the
    {LSH_BANDS} band keys (the b×r OR-construction), then exact cosine
    reranks the candidate set. The single-table predecessor measured
    recall@5 = 0.00 at sf0.01 — every query sat alone in its 12-bit
    bucket; the 3×4-bit banding trades ~20 % of the corpus as candidates
    for measured recall 0.48 (see the constants table and the recall@k /
    NDCG@k gate faces).

    Bucket assignment runs through the Arrow kernel
    (operators/vector_blocks.py::hyperplane_buckets) — one narrow
    ``mapInPandas`` pass, dimension-sequential fold so buckets stay
    bit-identical to the oracle; band keys are free bitmasks of the one
    packed bucket. Each band joins as its own broadcast equi-join on the
    masked key; candidate volume scales with band occupancy, never n²."""
    cand, emb = _banded_candidates(spark, sf_dir)
    qe = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    ne = emb.select(F.col("vec_id").alias("n_vec_id"), F.col("embedding").alias("n_emb"))
    cos = F.round(cosine(F.col("q_emb"), F.col("n_emb")), 6)
    w = Window.partitionBy("q_vec_id").orderBy(F.col("cosine").desc(), F.col("n_vec_id"))
    return (
        cand.join(ne, "n_vec_id")
        .join(broadcast(qe), "q_vec_id")
        .select("q_vec_id", "n_vec_id", cos.alias("cosine"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


_SQL_COS_QC = (
    "list_aggregate(list_transform(list_zip(q_emb, cvec), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') / "
    "(SQRT(list_aggregate(list_transform(q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) "
    "* SQRT(list_aggregate(list_transform(cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))"
)

_SQL_COS_QM = (
    "list_aggregate(list_transform(list_zip(q_emb, m.embedding), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') / "
    "(SQRT(list_aggregate(list_transform(q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) "
    "* SQRT(list_aggregate(list_transform(m.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))"
)


# --- self-sizing coarse quantizer (r7 verdict item 3) -----------------------
#
# The IVF faces historically coarse-quantized on the corpus's LABEL
# structure: n_cells is fixed by the data, so per-query rerank work is
# |C|/n_labels — linear in n. This is the same gap shape `_lsh_schedule`
# closed for LSH in round 7 (dedup.py:477): a fixed index structure under
# a growing corpus. The fix is the textbook IVF sizing, n_cells ∝ √n:
# per-query probe work (≈ occupancy = n/n_cells) and quantizer-scan work
# (n_cells per query) balance at √n each, so total per-query cost grows
# as √n instead of n.

IVF_CELL_OCC_FACTOR = 64  # n_cells = max(n_labels, isqrt(n / 64))


def _ivf_schedule(n_vectors: int, n_labels: int) -> int:
    """Subcells per label for a corpus of ``n_vectors``: splits each label
    cell into s pieces so total cells ≈ √(n/64), floored at the plain
    label structure. Returns exactly 1 (= the registered label-cell
    plan, bit-identical hashes) for every correctness SF: n = 500 →
    isqrt(7) = 2 ≤ 10 labels; n = 2000 (sf0.1) → isqrt(31) = 5 ≤ 10.
    At probe scale: n = 100k → 40 cells, n = 1M → 130, n = 1e9 → ~4000
    — ∝ √n, matching docs/SCALE.md's "Similarity search (IVF)" posture."""
    import math

    target_cells = math.isqrt(max(n_vectors // IVF_CELL_OCC_FACTOR, 1))
    return max(1, math.ceil(target_cells / max(n_labels, 1)))


# sizing memo: one (count, n_labels) job per corpus per process — a
# model-SIZING scalar like dedup._scheduled_planes, not a data collect.
# Keyed by (sf_dir, on-disk signature of the embeddings parquet): if a
# harness regenerates the corpus under the same path in-process, the
# mtime/size signature changes and the schedule re-sizes instead of
# silently using stale stats (r8 ADVICE).
_EMB_STATS_CACHE: dict[tuple[str, tuple], tuple[int, int]] = {}


def _emb_corpus_signature(sf_dir: str) -> tuple:
    """Cheap on-disk fingerprint of the embeddings table under sf_dir:
    (path, mtime_ns, size) per file. Listing only — no data read."""
    import os

    base = os.path.join(sf_dir, "embeddings.parquet")
    sig: list[tuple[str, int, int]] = []
    try:
        if os.path.isdir(base):
            for name in sorted(os.listdir(base)):
                st = os.stat(os.path.join(base, name))
                sig.append((name, st.st_mtime_ns, st.st_size))
        elif os.path.exists(base):
            st = os.stat(base)
            sig.append((base, st.st_mtime_ns, st.st_size))
    except OSError:
        pass  # non-local path (e.g. object store): fall back to path-only
    return tuple(sig)


def clear_emb_stats_cache() -> None:
    """Explicit invalidation hook for harnesses that rewrite test data
    in-process without touching file mtimes."""
    _EMB_STATS_CACHE.clear()


def _emb_stats(emb: DataFrame, sf_dir: str) -> tuple[int, int]:
    key = (sf_dir, _emb_corpus_signature(sf_dir))
    st = _EMB_STATS_CACHE.get(key)
    if st is None:
        row = emb.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("label").alias("nl"),
        ).collect()[0]
        st = (int(row["n"]), int(row["nl"]))
        _EMB_STATS_CACHE[key] = st
    return st


def _coarse_cells(emb: DataFrame, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """The shared coarse quantizer behind the IVF faces: returns
    ``(cells, members)`` — ``cells(cell int, cvec array<double>)`` and
    ``members(vec_id, cell, embedding)``.

    Under the adaptive schedule: s = 1 (every correctness SF) emits the
    REGISTERED label-cell structure with the exact same plan the faces
    always had — cell = label, centroid = per-label per-dim mean in
    decimal-exact arithmetic. s > 1 refines each label cell into s
    subcells with one Lloyd step (the ``sim_kmeans_refine`` move):
    deterministic seeds (per-(label, vec_id % s) means), reassign every
    vector to its label's nearest seed by cosine (tie → lowest subcell),
    recompute means. cell = label·s + subcell keeps the key an int, so
    the faces' output schema is size-independent.

    Scale: both quantizer builds are two shuffles over (label[, sub], i)
    — partial-aggregated dimension means, never a collect; the seed and
    cell tables are O(n_cells · DIM) and broadcast at the probe join."""
    n, n_labels = _emb_stats(emb, sf_dir)
    s = _ivf_schedule(n, n_labels)

    def dim_means(df: DataFrame, keys: list[str]) -> DataFrame:
        ex = df.select(*keys, F.posexplode("embedding").alias("i", "x"))
        cent = ex.groupBy(*keys, "i").agg(
            (
                F.sum(F.col("x").cast("decimal(20,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("v")
        )
        return (
            cent.groupBy(*keys)
            .agg(F.array_sort(F.collect_list(F.struct("i", "v"))).alias("iv"))
            .select(*keys, F.transform("iv", lambda e: e["v"]).alias("cvec"))
        )

    if s == 1:
        cells = dim_means(emb, ["label"]).select(
            F.col("label").alias("cell"), "cvec"
        )
        members = emb.select("vec_id", F.col("label").alias("cell"), "embedding")
        return cells, members

    seeded = emb.withColumn("sub", F.pmod(F.col("vec_id"), F.lit(s)).cast("int"))
    seeds = dim_means(seeded, ["label", "sub"]).withColumnRenamed("cvec", "svec")
    # One broadcast row per label carrying ALL its seed vectors: the
    # reassignment is then a NARROW map (argmax over s seeds in a single
    # array expression). The previous shape — explode to n·s rows + a
    # row_number window partitioned by vec_id — shuffled n·s rows into n
    # single-digit-row window partitions, which dominated the whole face
    # at the sf25 probe (13.8 s vs 3.6 s for the fixed structure; the
    # rewrite removes that exchange entirely). Tie semantics preserved
    # exactly: max struct(cosine, −sub) == (max cosine, lowest sub).
    seed_arr = seeds.groupBy("label").agg(
        F.array_sort(F.collect_list(F.struct("sub", "svec"))).alias("seed_arr")
    )
    best = F.aggregate(
        F.transform(
            F.col("seed_arr"),
            lambda e: F.struct(
                cosine(F.col("embedding"), e["svec"]).alias("c"),
                (-e["sub"]).alias("negsub"),
            ),
        ),
        F.struct(
            F.lit(float("-inf")).cast("double").alias("c"),
            F.lit(-(10**9)).alias("negsub"),
        ),
        lambda acc, x: F.when(
            (x["c"] > acc["c"])
            | ((x["c"] == acc["c"]) & (x["negsub"] > acc["negsub"])),
            x,
        ).otherwise(acc),
    )
    # Checkpoint: the assign table feeds THREE consumers (the cell
    # centroid recompute, the members table, and — through cells — the
    # query-side probe), and without a materialization barrier Spark
    # recomputes the full seed-build + argmax chain once per consumer
    # (measured at sf25: the face cost ~3x the single-pass quantizer).
    assign = cache.checkpoint(
        emb.join(broadcast(seed_arr), "label")
        .withColumn("sub", (-best["negsub"]).cast("int"))
        .select("vec_id", "label", "sub", "embedding")
    )
    cell_id = (F.col("label").cast("long") * s + F.col("sub")).cast("int")
    cells = dim_means(assign, ["label", "sub"]).select(
        cell_id.alias("cell"), "cvec"
    )
    members = assign.select("vec_id", cell_id.alias("cell"), "embedding")
    return cells, members


@register(
    "sim_ivf_search",
    f"""
    WITH ex AS (SELECT label, unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings),
    cent AS (SELECT label, i,
                    CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS v
             FROM ex GROUP BY label, i),
    cvecs AS (SELECT label, list(v ORDER BY i) AS cvec FROM cent GROUP BY label),
    q AS (SELECT vec_id AS q_vec_id, embedding AS q_emb FROM embeddings
          WHERE vec_id < {N_QUERIES}),
    qc AS (SELECT q_vec_id, q_emb, label,
                  ROW_NUMBER() OVER (PARTITION BY q_vec_id
                                     ORDER BY {_SQL_COS_QC} DESC, label) AS rn
           FROM q CROSS JOIN cvecs),
    best AS (SELECT q_vec_id, q_emb, label AS probe_label FROM qc WHERE rn = 1)
    SELECT q_vec_id, probe_label, n_vec_id, cosine, rk FROM (
      SELECT best.q_vec_id, best.probe_label, m.vec_id AS n_vec_id,
             ROUND({_SQL_COS_QM}, 6) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY best.q_vec_id
                                ORDER BY ROUND({_SQL_COS_QM}, 6) DESC, m.vec_id) AS rk
      FROM best JOIN embeddings m
        ON m.label = best.probe_label AND m.vec_id <> best.q_vec_id)
    WHERE rk <= {TOP_K}
    """,
    doc="IVF-style ANN: coarse-quantize to the nearest label centroid, rerank inside that cell only.",
)
def sim_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search shape at scale: the centroid table is tiny (n_cells) and
    broadcast; each query probes ONE cell, so compared pairs scale with
    cell occupancy — |C|/n_cells per query instead of |C|. The quantizer
    SELF-SIZES (``_ivf_schedule``): at every correctness SF it IS the
    registered label-cell plan (s = 1, hashes bit-identical); past
    ~64·n_labels² vectors each label cell Lloyd-splits so n_cells tracks
    √n and per-query work grows as √n, not n."""
    emb = load_table(spark, sf_dir, "embeddings")
    cells, members = _coarse_cells(emb, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    w_c = Window.partitionBy("q_vec_id").orderBy(
        cosine(F.col("q_emb"), F.col("cvec")).desc(), F.col("cell")
    )
    best = (
        q.crossJoin(broadcast(cells))
        .withColumn("rn", F.row_number().over(w_c))
        .filter(F.col("rn") == 1)
        .select("q_vec_id", "q_emb", F.col("cell").alias("probe_label"))
    )
    m = members.select(
        F.col("vec_id").alias("n_vec_id"), F.col("cell"), F.col("embedding").alias("n_emb")
    )
    cos = F.round(cosine(F.col("q_emb"), F.col("n_emb")), 6)
    w_m = Window.partitionBy("q_vec_id").orderBy(F.col("cosine").desc(), F.col("n_vec_id"))
    return (
        m.join(
            broadcast(best),
            (m.cell == F.col("probe_label")) & (F.col("n_vec_id") != F.col("q_vec_id")),
        )
        .select("q_vec_id", "probe_label", "n_vec_id", cos.alias("cosine"))
        .withColumn("rk", F.row_number().over(w_m))
        .filter(F.col("rk") <= TOP_K)
    )


def ivf_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Write-once MATERIALIZED IVF index per (session, sf_dir): members
    land as parquet partitioned by cell, centroids beside them, behind a
    marker so repeated probes reuse the build. This is the amortization
    the r9 boundary measurement demands (BENCH_NOTES r9: the in-face
    quantizer rebuild is Θ(n) and dominates small fixed workloads; a
    production ANN deployment builds once and probes many): at 100 TB
    the same layout is the index table a serving job maintains, and the
    cell partitioning means a probe reads ONLY its cell's files."""
    import hashlib
    import os
    import shutil
    import tempfile

    path = os.path.join(
        tempfile.gettempdir(),
        f"trike_ivf_{spark.sparkContext.applicationId}",
        hashlib.md5(sf_dir.encode()).hexdigest()[:10],
    )
    marker = os.path.join(path, "_SUCCESS_INDEX")
    if os.path.exists(marker):
        return path
    shutil.rmtree(path, ignore_errors=True)
    emb = load_table(spark, sf_dir, "embeddings")
    cells, members = _coarse_cells(emb, sf_dir)
    members.write.partitionBy("cell").mode("overwrite").parquet(
        os.path.join(path, "members")
    )
    cells.write.mode("overwrite").parquet(os.path.join(path, "cells"))
    with open(marker, "w"):
        pass
    return path


def _ivf_search_oracle() -> str:
    """The index probe answers EXACTLY sim_ivf_search's question — reuse
    its oracle verbatim so any drift between the two physical postures is
    a driver-hash mismatch."""
    from trike_spark.registry import REGISTRY

    return REGISTRY["sim_ivf_search"].oracle


@register(
    "sim_ivf_index_probe",
    _ivf_search_oracle(),
    doc=(
        "IVF probe against a MATERIALIZED index: members parquet is "
        "partitioned by cell (built once per session per corpus, marker-"
        "guarded), so the probe is a partition-pruned scan of exactly the "
        "probed cell + the same top-k — amortizing the quantizer build "
        "the r9 boundary measurement showed dominating rebuild-per-query "
        "workloads. Results identical to sim_ivf_search (same oracle)."
    ),
)
def sim_ivf_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same query semantics as ``sim_ivf_search`` — the difference is the
    physical posture: the quantizer output is a TABLE (parquet
    partitioned by ``cell``), not a per-call subplan. The probe joins the
    tiny best-cell set (broadcast) against the members scan on the
    PARTITION column, so only the probed cells' files are read (at s=1
    that is 1 of n_labels directories; under the Lloyd split, 1 of ~√n).
    The driver hash certifies the round-trip through the index layout —
    a partition-column type drift or a write that dropped rows would
    mismatch ``sim_ivf_search``'s oracle."""
    path = ivf_index_dir(spark, sf_dir)
    cells = spark.read.parquet(f"{path}/cells")
    members = spark.read.parquet(f"{path}/members").select(
        F.col("vec_id").alias("n_vec_id"),
        F.col("cell").cast("int").alias("cell"),
        F.col("embedding").alias("n_emb"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    w_c = Window.partitionBy("q_vec_id").orderBy(
        cosine(F.col("q_emb"), F.col("cvec")).desc(), F.col("cell")
    )
    best = (
        q.crossJoin(broadcast(cells))
        .withColumn("rn", F.row_number().over(w_c))
        .filter(F.col("rn") == 1)
        .select("q_vec_id", "q_emb", F.col("cell").alias("probe_label"))
    )
    cos = F.round(cosine(F.col("q_emb"), F.col("n_emb")), 6)
    w_m = Window.partitionBy("q_vec_id").orderBy(
        F.col("cosine").desc(), F.col("n_vec_id")
    )
    return (
        members.join(
            broadcast(best),
            (members.cell == F.col("probe_label"))
            & (F.col("n_vec_id") != F.col("q_vec_id")),
        )
        .select("q_vec_id", "probe_label", "n_vec_id", cos.alias("cosine"))
        .withColumn("rk", F.row_number().over(w_m))
        .filter(F.col("rk") <= TOP_K)
    )


NPROBE = 3  # cells probed by the multiprobe IVF variant


@register(
    "sim_ivf_multiprobe",
    f"""
    WITH ex AS (SELECT label, unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings),
    cent AS (SELECT label, i,
                    CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS v
             FROM ex GROUP BY label, i),
    cvecs AS (SELECT label, list(v ORDER BY i) AS cvec FROM cent GROUP BY label),
    q AS (SELECT vec_id AS q_vec_id, embedding AS q_emb FROM embeddings
          WHERE vec_id < {N_QUERIES}),
    qc AS (SELECT q_vec_id, q_emb, label,
                  ROW_NUMBER() OVER (PARTITION BY q_vec_id
                                     ORDER BY {_SQL_COS_QC} DESC, label) AS rn
           FROM q CROSS JOIN cvecs),
    probes AS (SELECT q_vec_id, q_emb, label AS probe_label FROM qc WHERE rn <= {NPROBE})
    SELECT q_vec_id, n_vec_id, cosine, rk FROM (
      SELECT probes.q_vec_id, m.vec_id AS n_vec_id,
             ROUND({_SQL_COS_QM}, 6) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY probes.q_vec_id
                                ORDER BY ROUND({_SQL_COS_QM}, 6) DESC, m.vec_id) AS rk
      FROM probes JOIN embeddings m
        ON m.label = probes.probe_label AND m.vec_id <> probes.q_vec_id)
    WHERE rk <= {TOP_K}
    """,
    doc=f"IVF multiprobe ANN: probe the {NPROBE} nearest centroids and rerank "
    "their union — the standard recall lever when the true neighbor sits "
    "just across a cell boundary.",
)
def sim_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe IVF: identical coarse quantizer to :func:`sim_ivf_search`
    but the probe set is the NPROBE nearest centroids per query, and the
    rerank runs over the union of those cells. Scale shape is unchanged —
    the centroid table stays broadcast, compared pairs scale with
    NPROBE·(|C|/n_cells) per query — while recall strictly dominates
    single-probe (measure with sim_lsh_recall_at_k's methodology before
    tuning NPROBE down). Cells are disjoint, so the union needs no
    dedup and each neighbor row joins at most one probe row. Shares the
    self-sizing quantizer (``_coarse_cells``): label cells at every
    correctness SF, Lloyd-split √n cells past the schedule knee — with
    multiprobe the natural recall insurance once cells shrink."""
    emb = load_table(spark, sf_dir, "embeddings")
    cells, members = _coarse_cells(emb, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    w_c = Window.partitionBy("q_vec_id").orderBy(
        cosine(F.col("q_emb"), F.col("cvec")).desc(), F.col("cell")
    )
    probes = (
        q.crossJoin(broadcast(cells))
        .withColumn("rn", F.row_number().over(w_c))
        .filter(F.col("rn") <= NPROBE)
        .select("q_vec_id", "q_emb", F.col("cell").alias("probe_label"))
    )
    m = members.select(
        F.col("vec_id").alias("n_vec_id"), F.col("cell"), F.col("embedding").alias("n_emb")
    )
    cos = F.round(cosine(F.col("q_emb"), F.col("n_emb")), 6)
    w_m = Window.partitionBy("q_vec_id").orderBy(F.col("cosine").desc(), F.col("n_vec_id"))
    return (
        m.join(
            broadcast(probes),
            (m.cell == F.col("probe_label")) & (F.col("n_vec_id") != F.col("q_vec_id")),
        )
        .select("q_vec_id", "n_vec_id", cos.alias("cosine"))
        .withColumn("rk", F.row_number().over(w_m))
        .filter(F.col("rk") <= TOP_K)
    )


def _ivf_multiprobe_oracle() -> str:
    """The index-served multiprobe answers EXACTLY sim_ivf_multiprobe's
    question — reuse its oracle verbatim so drift between the rebuilt and
    materialized postures is a driver-hash mismatch."""
    from trike_spark.registry import REGISTRY

    return REGISTRY["sim_ivf_multiprobe"].oracle


@register(
    "sim_ivf_index_multiprobe",
    _ivf_multiprobe_oracle(),
    doc=(
        f"IVF multiprobe against the MATERIALIZED index: the {NPROBE} "
        "nearest centroids per query become a broadcast probe set joined "
        "on the cell partition column, so the members scan is dynamically "
        "pruned to exactly the probed cells' files — the production "
        "recall-vs-read-budget lever served from the write-once index. "
        "Results identical to sim_ivf_multiprobe (same oracle)."
    ),
)
def sim_ivf_index_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the serving matrix: single-probe and ADC both have
    index-served twins (``sim_ivf_index_probe``, ``sim_ivfpq_index_adc``);
    this is the nprobe>1 coarse path — what a production deployment
    actually runs, since shrinking cells (the Lloyd split's √n schedule)
    pushes true neighbors across cell boundaries and multiprobe is the
    recall insurance. Physically it is ``sim_ivf_index_probe`` with the
    best-cell filter widened to rn <= NPROBE: the probe set stays a
    broadcast (NPROBE rows per query), the members scan's dynamic-pruning
    subquery now admits NPROBE partitions per query instead of one, and
    cells are disjoint so the union needs no dedup. Per-query reads =
    NPROBE x cell occupancy — the multiplier is visible in the partition
    count, not in any shuffle."""
    path = ivf_index_dir(spark, sf_dir)
    cells = spark.read.parquet(f"{path}/cells")
    members = spark.read.parquet(f"{path}/members").select(
        F.col("vec_id").alias("n_vec_id"),
        F.col("cell").cast("int").alias("cell"),
        F.col("embedding").alias("n_emb"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    w_c = Window.partitionBy("q_vec_id").orderBy(
        cosine(F.col("q_emb"), F.col("cvec")).desc(), F.col("cell")
    )
    probes = (
        q.crossJoin(broadcast(cells))
        .withColumn("rn", F.row_number().over(w_c))
        .filter(F.col("rn") <= NPROBE)
        .select("q_vec_id", "q_emb", F.col("cell").alias("probe_label"))
    )
    cos = F.round(cosine(F.col("q_emb"), F.col("n_emb")), 6)
    w_m = Window.partitionBy("q_vec_id").orderBy(
        F.col("cosine").desc(), F.col("n_vec_id")
    )
    return (
        members.join(
            broadcast(probes),
            (members.cell == F.col("probe_label"))
            & (F.col("n_vec_id") != F.col("q_vec_id")),
        )
        .select("q_vec_id", "n_vec_id", cos.alias("cosine"))
        .withColumn("rk", F.row_number().over(w_m))
        .filter(F.col("rk") <= TOP_K)
    )


@register(
    "sim_norms_pandas_udf",
    """
    SELECT vec_id,
           ROUND(SQRT(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 6) AS l2_norm,
           CAST(len(embedding) AS INT) AS dim
    FROM embeddings
    """,
    doc="Vectorized pandas_udf (Arrow-batched) computing L2 norms — the UDF escape hatch, oracle-checked.",
)
def sim_norms_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one demonstration of a scalar ``pandas_udf``: Arrow batches in,
    numpy-free sequential accumulation so the fold order matches the
    engines' list folds bit-for-bit. Everything else in the engine stays
    JVM-side — this exists to prove the escape hatch works, not as a
    pattern to copy for expressible logic."""
    from trike_spark.functions.vector_udfs import l2_norm

    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        l2_norm(F.col("embedding")).alias("l2_norm"),
        F.size("embedding").alias("dim"),
    )


@register(
    "sim_centroids_by_label",
    """
    SELECT label, CAST(i - 1 AS INT) AS dim,
           ROUND(CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*), 6) AS centroid
    FROM (SELECT label, unnest(embedding) AS x,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings)
    GROUP BY label, i
    """,
    doc="IVF-flavored centroid build: per-label per-dimension mean (decimal-exact).",
)
def sim_centroids_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("dim", "x"))
    return (
        ex.groupBy("label", "dim")
        .agg(
            F.round(
                F.sum(F.col("x").cast("decimal(20,10)")).cast("double") / F.count(F.lit(1)), 6
            ).alias("centroid")
        )
    )


@register(
    "sim_lsh_recall_at_k",
    f"""
    WITH {_SQL_BUCKETED},
    {_SQL_CAND},
    truth AS (
      SELECT q_vec_id, n_vec_id FROM (
        SELECT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY ROUND({_SQL_COS}, 6) DESC, b.vec_id) AS rk
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < {N_QUERIES})
      WHERE rk <= {TOP_K})
    SELECT t.q_vec_id,
           CAST(COUNT(c.n_vec_id) AS BIGINT) AS n_found,
           CAST(COUNT(c.n_vec_id) AS DOUBLE) / {TOP_K} AS recall
    FROM truth t LEFT JOIN cand c
      ON t.q_vec_id = c.q_vec_id AND t.n_vec_id = c.n_vec_id
    GROUP BY t.q_vec_id
    """,
    doc=f"ANN quality metric: recall@{TOP_K} of the banded "
    f"({LSH_BANDS}×{LSH_BAND_W}-bit) LSH candidate set vs brute-force truth.",
)
def sim_lsh_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The self-evaluation face every ANN deployment needs: join the LSH
    candidate set against the exact top-k and measure recall per query —
    the number a user consults before trading the brute-force scan for the
    bucketed path. This gate is what exposed the single-table
    configuration as useless (recall 0.00 at sf0.01 — every query alone
    in its 12-bit bucket) and justified the banded rewrite (0.48 at ~20 %
    candidate rate; see the banding table at the top of the module).
    Recall = found/k is exact in double (small integers). At 100 TB this
    runs on a sampled query set — the truth leg is the expensive O(|Q|·n)
    scan, which is the point of measuring before switching."""
    truth = sim_topk_bruteforce(spark, sf_dir).select("q_vec_id", "n_vec_id")
    cand, _emb = _banded_candidates(spark, sf_dir)
    cand = cand.withColumnRenamed("n_vec_id", "c_vec_id")
    return (
        truth.join(
            cand,
            (truth.q_vec_id == cand.q_vec_id) & (truth.n_vec_id == cand.c_vec_id),
            "left",
        )
        .select(truth.q_vec_id.alias("q"), cand.c_vec_id)
        .groupBy(F.col("q").alias("q_vec_id"))
        .agg(
            F.count("c_vec_id").cast("bigint").alias("n_found"),
            (F.count("c_vec_id").cast("double") / TOP_K).alias("recall"),
        )
    )


_SQL_QDOT_AB = (
    "list_aggregate(list_transform(list_zip(a.qe, b.qe), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
)


def _sql_qnorm(alias: str) -> str:
    return (
        f"SQRT(list_aggregate(list_transform({alias}.qe, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    )


_SQL_QCOS = f"{_SQL_QDOT_AB} / ({_sql_qnorm('a')} * {_sql_qnorm('b')})"


@register(
    "sim_sq_int8_topk",
    f"""
    WITH m AS (
      SELECT MAX(list_aggregate(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE))), 'max')) AS maxabs
      FROM embeddings),
    q8 AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / maxabs, 0)
                         AS INTEGER)) AS qe
      FROM embeddings, m)
    SELECT q_vec_id, n_vec_id, qcos, rk FROM (
      SELECT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id,
             ROUND({_SQL_QCOS}, 6) AS qcos,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                ORDER BY ROUND({_SQL_QCOS}, 6) DESC, b.vec_id)
               AS rk
      FROM q8 a JOIN q8 b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES})
    WHERE rk <= {TOP_K}
    """,
    doc=f"Int8 scalar-quantized ANN: top-{TOP_K} by cosine over "
    "symmetric-int8-quantized vectors (4x memory/IO vs float32).",
)
def sim_sq_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar quantization — the workhorse compression every production
    vector store applies before IVF/HNSW: one global symmetric scale
    s = 127 / max|x| maps float32 dims to int8, cutting the candidate
    scan's memory traffic 4x. Cosine is scale-invariant, so the quantized
    distance needs NO dequantization — integer products straight into the
    fold. Recall loss is bounded by the quantization step (measured the
    same way as sim_lsh_recall_at_k measures the LSH path).

    Scale: the global max-abs is one scalar aggregate (map-side combine →
    1 row, broadcast back via crossJoin exactly like the corpus-stats
    idiom in curation.py); quantization is a narrow per-row transform. At
    100 TB the quantized corpus would be materialized once (write_parquet)
    and every subsequent scan reads a quarter of the bytes; here the
    pipeline is fused into one plan to stay oracle-comparable. The top-k
    itself is the audited brute-force shape: broadcast query set, narrow
    scan, per-query window over the k survivors.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    # 1-row scale scalar feeds the quantization of BOTH join sides —
    # checkpoint so the corpus max-abs aggregate runs once, not per side
    maxabs = cache.checkpoint(
        emb.agg(
            F.max(
                F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
            ).alias("maxabs")
        )
    )
    q8 = (
        emb.crossJoin(broadcast(maxabs))
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * 127.0 / F.col("maxabs")).cast("int"),
            ).alias("qe"),
        )
    )
    q = q8.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("qe").alias("q_qe")
    )
    c = q8.select(F.col("vec_id").alias("n_vec_id"), F.col("qe").alias("n_qe"))
    qcos = F.round(cosine(F.col("q_qe"), F.col("n_qe")), 6)
    w = Window.partitionBy("q_vec_id").orderBy(F.col("qcos").desc(), F.col("n_vec_id"))
    return (
        c.crossJoin(broadcast(q))
        .filter(F.col("n_vec_id") != F.col("q_vec_id"))
        .select("q_vec_id", "n_vec_id", qcos.alias("qcos"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


@register(
    "sim_sq_recall_at_k",
    f"""
    WITH m AS (
      SELECT MAX(list_aggregate(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE))), 'max')) AS maxabs
      FROM embeddings),
    q8 AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / maxabs, 0)
                         AS INTEGER)) AS qe
      FROM embeddings, m),
    truth AS (
      SELECT q_vec_id, n_vec_id FROM (
        SELECT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY ROUND({_SQL_COS}, 6) DESC, b.vec_id) AS rk
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < {N_QUERIES})
      WHERE rk <= {TOP_K}),
    sq AS (
      SELECT q_vec_id, n_vec_id FROM (
        SELECT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY ROUND({_SQL_QCOS}, 6) DESC, b.vec_id)
                 AS rk
        FROM q8 a JOIN q8 b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < {N_QUERIES})
      WHERE rk <= {TOP_K})
    SELECT t.q_vec_id,
           CAST(COUNT(s.n_vec_id) AS BIGINT) AS n_found,
           CAST(COUNT(s.n_vec_id) AS DOUBLE) / {TOP_K} AS recall
    FROM truth t LEFT JOIN sq s
      ON t.q_vec_id = s.q_vec_id AND t.n_vec_id = s.n_vec_id
    GROUP BY t.q_vec_id
    """,
    doc=f"Quantization quality metric: recall@{TOP_K} of the int8 "
    "scalar-quantized top-k against float32 brute-force ground truth.",
)
def sim_sq_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The measure-before-you-switch gate for the quantized path, exactly
    parallel to sim_lsh_recall_at_k: run the float32 exact top-k and the
    int8 top-k, join, and report per-query overlap/k. At 100 TB the truth
    leg runs on a sampled query set; the quantized leg is the 4x-cheaper
    scan being qualified. Counts are small integers so recall is exact in
    double and cross-engine hash-stable."""
    truth = sim_topk_bruteforce(spark, sf_dir).select("q_vec_id", "n_vec_id")
    sq = sim_sq_int8_topk(spark, sf_dir).select(
        F.col("q_vec_id").alias("s_q"), F.col("n_vec_id").alias("c_vec_id")
    )
    return (
        truth.join(
            sq,
            (truth.q_vec_id == F.col("s_q")) & (truth.n_vec_id == F.col("c_vec_id")),
            "left",
        )
        .select(truth.q_vec_id.alias("q"), F.col("c_vec_id"))
        .groupBy(F.col("q").alias("q_vec_id"))
        .agg(
            F.count("c_vec_id").cast("bigint").alias("n_found"),
            (F.count("c_vec_id").cast("double") / TOP_K).alias("recall"),
        )
    )


_SQL_COS_EC = (
    "(list_aggregate(list_transform(list_zip(e.embedding, c.cvec), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') / "
    "(SQRT(list_aggregate(list_transform(e.embedding, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) "
    "* SQRT(list_aggregate(list_transform(c.cvec, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))))"
)


@register(
    "sim_kmeans_refine",
    f"""
    WITH ex AS (SELECT label, unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings),
    cent AS (SELECT label, i,
                    CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS v
             FROM ex GROUP BY label, i),
    cvecs AS (SELECT label, list(v ORDER BY i) AS cvec FROM cent GROUP BY label),
    assign AS (
      SELECT vec_id, embedding, cluster FROM (
        SELECT e.vec_id, e.embedding, c.label AS cluster,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_SQL_COS_EC} DESC, c.label) AS rn
        FROM embeddings e CROSS JOIN cvecs c) WHERE rn = 1),
    rex AS (SELECT cluster, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM assign),
    refined AS (SELECT cluster, i,
                       CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS rv
                FROM rex GROUP BY cluster, i),
    dims AS (SELECT r.cluster, r.rv, c.v
             FROM refined r JOIN cent c ON c.label = r.cluster AND c.i = r.i),
    stats AS (SELECT cluster,
                     ROUND(SQRT(SUM((rv - v) * (rv - v))), 6) AS drift,
                     ROUND(SQRT(SUM(rv * rv)), 6) AS refined_norm
              FROM dims GROUP BY cluster),
    members AS (SELECT cluster, COUNT(*) AS n_members FROM assign GROUP BY cluster)
    SELECT s.cluster, m.n_members, s.drift, s.refined_norm
    FROM stats s JOIN members m ON m.cluster = s.cluster
    """,
    doc=(
        "One Lloyd (k-means) iteration: seed centroids = per-label means, "
        "reassign every vector to its nearest seed by cosine, recompute "
        "centroids; reports per-cluster size, drift and refined norm."
    ),
)
def sim_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The iterative-clustering building block (IVF training, semantic-
    dedup cell assignment): one full Lloyd step, deterministic end to end.

    Determinism across engines: centroid means use exact DECIMAL(20,10)
    sums (order-independent) before one double division, cosine uses the
    same left-to-right fold as the other sim_* ops, and ties break on
    cluster id — so assignment is bit-identical in Spark and DuckDB.

    Scale shape: the K centroid vectors are a broadcast (K·dim doubles);
    assignment is a narrow map over the embedding scan (no shuffle of the
    big side); the recompute shuffles (cluster, dim) partial decimal sums
    — K·dim rows of state, not n·dim. Iterating = repeating this stage;
    each round is one broadcast + one state-sized shuffle, the same plan
    a 100 TB IVF-training job wants."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select("label", F.posexplode("embedding").alias("i", "x"))
    # K·dim rows feeding the centroid pack AND the drift join — one pass
    cent = cache.checkpoint(
        ex.groupBy("label", "i").agg(
            (F.sum(F.col("x").cast("decimal(20,10)")).cast("double") / F.count(F.lit(1))).alias(
                "v"
            )
        )
    )
    cvecs = (
        cent.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "v"))).alias("iv"))
        .select(F.col("label").alias("cluster"), F.transform("iv", lambda e: e["v"]).alias("cvec"))
    )
    # assignment is an in-row argmax against the ONE-row centroid pack —
    # no corpus × K window shuffle; negating cosine turns the
    # (cosine DESC, cluster ASC) tie-break into one ascending struct sort
    packed = cvecs.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("cluster", "cvec"))).alias("cents")
    )
    best = F.element_at(
        F.array_sort(
            F.transform(
                F.col("cents"),
                lambda c: F.struct(
                    (-cosine(F.col("embedding"), c["cvec"])).alias("negcos"),
                    c["cluster"].alias("cluster"),
                ),
            )
        ),
        1,
    )["cluster"]
    assign = (
        emb.crossJoin(broadcast(packed))
        .select("embedding", best.alias("cluster"))
    )
    rex = assign.select("cluster", F.posexplode("embedding").alias("i", "x"))
    # count rides the refit aggregation: every member contributes exactly
    # one row per dimension, so n_members = the count at any fixed i —
    # the second corpus pass the members aggregate used to pay is gone
    refined = cache.checkpoint(
        rex.groupBy("cluster", "i").agg(
            (F.sum(F.col("x").cast("decimal(20,10)")).cast("double") / F.count(F.lit(1))).alias(
                "rv"
            ),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    dims = refined.join(
        cent.select(F.col("label").alias("cluster"), "i", "v"), on=["cluster", "i"]
    )
    stats = dims.groupBy("cluster").agg(
        F.round(F.sqrt(F.sum((F.col("rv") - F.col("v")) * (F.col("rv") - F.col("v")))), 6).alias(
            "drift"
        ),
        F.round(F.sqrt(F.sum(F.col("rv") * F.col("rv"))), 6).alias("refined_norm"),
    )
    members = refined.filter(F.col("i") == 0).select("cluster", F.col("cnt").alias("n_members"))
    return stats.join(members, on="cluster").select(
        "cluster", "n_members", "drift", "refined_norm"
    )


PQ_M = 8  # subspaces (DIM/PQ_M = 8 dims each)
_PQ_D = DIM // PQ_M


def _fold_sum(arr: Column) -> Column:
    """Sequential left fold over a double array — matches DuckDB
    list_aggregate(..., 'sum') bit-for-bit (same contract as :func:`dot`)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)


# --- PQ broadcast-pack helpers ---------------------------------------------
# The ADC faces used to assign codes with a (vec_id, s)-keyed argmin WINDOW
# over corpus × M × K candidate rows (a full shuffle + sort of the widest
# table in the family) and then re-derive dot(q_sub, cvec) per
# (query, neighbor, s) — a value that only depends on (query, s, code).
# These helpers replace both with broadcast lookup structures so the
# corpus-sized passes are narrow projections (guide §2.2 fewer/smaller
# shuffles, §2.3 shuffle narrow ints not centroid arrays, §3.1 broadcast the
# small side):
#   * the whole codebook packs into ONE (s, key)-sorted row — code
#     assignment becomes an in-row argmin fold, zero exchanges;
#   * per-query ADC dot tables (|Q| rows) and the centroid self-dot table
#     (1 row) broadcast next to the code arrays, so scoring shuffles
#     nothing but the final top-k window.
# Codes are stored as POSITIONS in the key-ascending centroid list (the
# key↔position map is a bijection shared by every pack below), so the
# argmin tie-break "smaller key wins" and every lookup stay bit-identical
# to the windowed form the oracle SQL still spells out.


def _pq_sq_l2(sub: Column, cvec: Column) -> Column:
    """Order-pinned squared L2 between a subvector and a centroid."""
    return _fold_sum(
        F.zip_with(
            sub,
            cvec,
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        )
    )


def _pq_centroid_pack(cbv: DataFrame, key: str) -> DataFrame:
    """The whole codebook as ONE row: an (s, key)-sorted struct array."""
    return cbv.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("s"), F.col(key).alias("k"), F.col("cvec")))
        ).alias("cb")
    )


def _pq_winner_array() -> Column:
    """winners[s] = the argmin-d2 centroid of subspace s as
    struct(d2, j, cvec) — j is the 0-based key-ascending position —
    evaluated narrowly against the broadcast ``cb`` pack; ties take the
    first (= smallest key) exactly like the
    ``ROW_NUMBER() ... ORDER BY d2, key`` window it replaces. Carrying
    the winning cvec lets the caller fold rnorm2 in the same pass."""

    def win_at(s: Column) -> Column:
        sub = F.slice(F.col("embedding"), s * _PQ_D + 1, _PQ_D)
        cands = F.filter(F.col("cb"), lambda e: e["s"] == s)
        scored = F.transform(
            cands,
            lambda e, j: F.struct(
                _pq_sq_l2(sub, e["cvec"]).alias("d2"), j.alias("j"), e["cvec"].alias("cvec")
            ),
        )
        return F.element_at(F.array_sort(scored), 1)

    return F.transform(F.sequence(F.lit(0), F.lit(PQ_M - 1)), win_at)


def _pq_query_dps() -> Column:
    """dps[s][j] = dot(q_sub_s, cvec_{s,j}) — the per-query ADC lookup
    table, computed from ``embedding`` against the broadcast ``cb`` pack
    in one narrow projection (no joins, no groupBys)."""

    def dps_at(s: Column) -> Column:
        sub = F.slice(F.col("embedding"), s * _PQ_D + 1, _PQ_D)
        return F.transform(
            F.filter(F.col("cb"), lambda e: e["s"] == s), lambda e: dot(sub, e["cvec"])
        )

    return F.transform(F.sequence(F.lit(0), F.lit(PQ_M - 1)), dps_at)


def _adc_lookup_fold(mat: str) -> Column:
    """Σ_s mat[s][codes[s]] as a sequential s-ordered fold — the same
    addition order as ``list_aggregate(list(x ORDER BY s), 'sum')``."""
    return _fold_sum(
        F.transform(
            F.sequence(F.lit(0), F.lit(PQ_M - 1)),
            lambda s: F.element_at(
                F.element_at(F.col(mat), s + 1), F.element_at(F.col("codes"), s + 1) + 1
            ),
        )
    )


@register(
    "sim_pq_adc_topk",
    f"""
    WITH sub AS (
      SELECT vec_id, label, g.s,
             embedding[g.s * {_PQ_D} + 1 : g.s * {_PQ_D} + {_PQ_D}] AS subv
      FROM embeddings,
           (SELECT unnest(generate_series(0, {PQ_M - 1})) AS s) g),
    spx AS (SELECT label, s, unnest(subv) AS x,
                   generate_subscripts(subv, 1) AS i
            FROM sub),
    cb AS (SELECT label, s, i,
                  CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS v
           FROM spx GROUP BY label, s, i),
    cbv AS (SELECT label, s, list(v ORDER BY i) AS cvec FROM cb GROUP BY label, s),
    dist AS (
      SELECT sub.vec_id, sub.s, cbv.label, cbv.cvec,
             list_aggregate(list_transform(list_zip(sub.subv, cbv.cvec),
               p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                    * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), 'sum') AS d2
      FROM sub JOIN cbv ON cbv.s = sub.s),
    codes AS (
      SELECT vec_id, s, cvec FROM (
        SELECT vec_id, s, cvec,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, label) AS rn
        FROM dist) WHERE rn = 1),
    q AS (SELECT vec_id AS q_vec_id, s, subv AS q_sub FROM sub
          WHERE vec_id < {N_QUERIES}),
    qn AS (SELECT vec_id AS q_vec_id,
                  SQRT(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS q_norm
           FROM embeddings WHERE vec_id < {N_QUERIES}),
    parts AS (
      SELECT q.q_vec_id, c.vec_id AS n_vec_id, q.s,
             list_aggregate(list_transform(list_zip(q.q_sub, c.cvec),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') AS dotp,
             list_aggregate(list_transform(list_zip(c.cvec, c.cvec),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') AS np
      FROM q JOIN codes c ON c.s = q.s AND c.vec_id <> q.q_vec_id),
    folded AS (
      SELECT q_vec_id, n_vec_id,
             list_aggregate(list(dotp ORDER BY s), 'sum') AS adc_dot,
             list_aggregate(list(np ORDER BY s), 'sum') AS rnorm2
      FROM parts GROUP BY q_vec_id, n_vec_id),
    scored AS (
      SELECT f.q_vec_id, f.n_vec_id,
             ROUND(f.adc_dot / (qn.q_norm * SQRT(f.rnorm2)), 6) AS adc_score
      FROM folded f JOIN qn ON qn.q_vec_id = f.q_vec_id)
    SELECT q_vec_id, n_vec_id, adc_score, rk FROM (
      SELECT q_vec_id, n_vec_id, adc_score,
             ROW_NUMBER() OVER (PARTITION BY q_vec_id
                                ORDER BY adc_score DESC, n_vec_id) AS rk
      FROM scored) WHERE rk <= {TOP_K}
    """,
    doc=(
        f"Product-quantization ANN: {PQ_M}×{_PQ_D}-dim subspace codebooks "
        "(per-label centroids), asymmetric-distance (ADC) cosine top-k."
    ),
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """PQ completes the ANN family (brute / LSH / IVF / SQ-int8 / PQ):
    each vector is stored as M=8 codebook codes; queries score candidates
    by ADC — exact query subvectors against the candidate's reconstructed
    centroids — so candidate vectors are never read at query time, only
    their codes (M bytes vs dim·4 bytes, a 32× read reduction at 100 TB).

    Determinism: codebooks use exact-decimal means, code assignment folds
    the L2 distance with the engines' shared sequential-fold contract
    (bit-exact), and the final ADC score is a fold over per-subspace
    partials collected in subspace order — every float op is order-pinned,
    so the score and ranking hash-match DuckDB with no tolerance games.

    Scale shape: the codebook packs into ONE broadcast row, so code
    assignment is an in-row argmin over the corpus — no exchange at all;
    scoring looks ADC partials up in broadcast per-query dot tables (the
    dot only depends on (query, s, code), so it is computed |Q|·M·K times
    total instead of once per corpus row) and the centroid self-dots fold
    into rnorm2 once per VECTOR, not once per (query, vector). The only
    wide exchange left is the final per-query top-k window on
    (q, n, score) rows — never raw embeddings, never centroid arrays."""
    emb = load_table(spark, sf_dir, "embeddings")
    subs = emb.select(
        "vec_id",
        "label",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("s"),
        "embedding",
    ).select(
        "vec_id", "label", "s", F.expr(f"slice(embedding, s * {_PQ_D} + 1, {_PQ_D})").alias("subv")
    )
    spx = subs.select("label", "s", F.posexplode("subv").alias("i", "x"))
    cb = spx.groupBy("label", "s", "i").agg(
        (F.sum(F.col("x").cast("decimal(20,10)")).cast("double") / F.count(F.lit(1))).alias("v")
    )
    cbv = (
        cb.groupBy("label", "s")
        .agg(F.array_sort(F.collect_list(F.struct("i", "v"))).alias("iv"))
        .select("label", "s", F.transform("iv", lambda e: e["v"]).alias("cvec"))
    )
    # train the codebook once: the ONE-row pack is the only thing the
    # corpus-derived training subtree feeds, and both consumers (code
    # assignment, query LUTs) read it from the checkpoint
    pack = cache.checkpoint(_pq_centroid_pack(cbv, "label"))
    win = (
        emb.select("vec_id", "embedding")
        .crossJoin(broadcast(pack))
        .select("vec_id", _pq_winner_array().alias("w"))
    )
    rscored = win.select(
        "vec_id",
        F.transform("w", lambda x: x["j"]).alias("codes"),
        _fold_sum(F.transform("w", lambda x: dot(x["cvec"], x["cvec"]))).alias("rnorm2"),
    )
    qpack = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .crossJoin(broadcast(pack))
        .select(
            F.col("vec_id").alias("q_vec_id"),
            _pq_query_dps().alias("dps"),
            F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("q_norm"),
        )
    )
    scored = (
        rscored.crossJoin(broadcast(qpack))
        .filter(F.col("vec_id") != F.col("q_vec_id"))
        .select(
            "q_vec_id",
            F.col("vec_id").alias("n_vec_id"),
            F.round(
                _adc_lookup_fold("dps") / (F.col("q_norm") * F.sqrt(F.col("rnorm2"))), 6
            ).alias("adc_score"),
        )
    )
    w_rank = Window.partitionBy("q_vec_id").orderBy(F.col("adc_score").desc(), F.col("n_vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= k)
        .select("q_vec_id", "n_vec_id", "adc_score", "rk")
    )


@register(
    "sim_knn_classify",
    f"""
    WITH nn AS (
      SELECT q_vec_id, n_label FROM (
        SELECT a.vec_id AS q_vec_id, b.label AS n_label,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY ROUND({_SQL_COS}, 6) DESC, b.vec_id) AS rk
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < {N_QUERIES})
      WHERE rk <= {TOP_K}),
    votes AS (SELECT q_vec_id, n_label, COUNT(*) AS n_votes
              FROM nn GROUP BY q_vec_id, n_label),
    pred AS (
      SELECT q_vec_id, n_label AS predicted_label, n_votes FROM (
        SELECT q_vec_id, n_label, n_votes,
               ROW_NUMBER() OVER (PARTITION BY q_vec_id
                                  ORDER BY n_votes DESC, n_label) AS rn
        FROM votes) WHERE rn = 1)
    SELECT p.q_vec_id, p.predicted_label, p.n_votes,
           e.label AS true_label,
           CASE WHEN p.predicted_label = e.label THEN 1 ELSE 0 END AS correct
    FROM pred p JOIN embeddings e ON e.vec_id = p.q_vec_id
    """,
    doc=(
        f"k-NN classification: majority label among the top-{TOP_K} cosine "
        "neighbors (tie → smaller label), scored against the true label."
    ),
)
def sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space label propagation — the weak-labeling /
    auto-annotation face on top of the ANN stack. Same scale shape as the
    brute baseline it builds on (broadcast query set, per-query top-k
    window, only k·|Q| survivors shuffle); swap the neighbor source for
    any of the ANN variants (LSH/IVF/SQ/PQ) and the voting stage is
    unchanged. Ties break on label id so the vote is deterministic."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(
        F.col("vec_id").alias("n_vec_id"),
        F.col("label").alias("n_label"),
        F.col("embedding").alias("n_emb"),
    )
    cos = F.round(cosine(F.col("q_emb"), F.col("n_emb")), 6)
    w_k = Window.partitionBy("q_vec_id").orderBy(F.col("cosine").desc(), F.col("n_vec_id"))
    nn = (
        c.crossJoin(broadcast(q))
        .filter(F.col("n_vec_id") != F.col("q_vec_id"))
        .select("q_vec_id", "n_vec_id", "n_label", cos.alias("cosine"))
        .withColumn("rk", F.row_number().over(w_k))
        .filter(F.col("rk") <= TOP_K)
    )
    votes = nn.groupBy("q_vec_id", "n_label").agg(F.count(F.lit(1)).alias("n_votes"))
    w_v = Window.partitionBy("q_vec_id").orderBy(F.col("n_votes").desc(), F.col("n_label"))
    pred = (
        votes.withColumn("rn", F.row_number().over(w_v))
        .filter(F.col("rn") == 1)
        .select("q_vec_id", F.col("n_label").alias("predicted_label"), "n_votes")
    )
    truth = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("label").alias("true_label")
    )
    return pred.join(broadcast(truth), on="q_vec_id").select(
        "q_vec_id",
        "predicted_label",
        "n_votes",
        "true_label",
        F.when(F.col("predicted_label") == F.col("true_label"), 1).otherwise(0).alias("correct"),
    )


def _pq_recall_oracle() -> str:
    from trike_spark.registry import REGISTRY

    pq_sql = REGISTRY["sim_pq_adc_topk"].oracle
    return f"""
    WITH pqr AS ({pq_sql}),
    truth AS (
      SELECT q_vec_id, n_vec_id FROM (
        SELECT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY ROUND({_SQL_COS}, 6) DESC, b.vec_id) AS rk
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < {N_QUERIES})
      WHERE rk <= {TOP_K})
    SELECT t.q_vec_id,
           CAST(COUNT(s.n_vec_id) AS BIGINT) AS n_found,
           CAST(COUNT(s.n_vec_id) AS DOUBLE) / {TOP_K} AS recall
    FROM truth t LEFT JOIN pqr s
      ON t.q_vec_id = s.q_vec_id AND t.n_vec_id = s.n_vec_id
    GROUP BY t.q_vec_id
    """


@register(
    "sim_pq_recall_at_k",
    _pq_recall_oracle(),
    doc=f"Quantization quality metric: recall@{TOP_K} of the PQ-ADC top-k "
    "against float32 brute-force ground truth.",
)
def sim_pq_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The measure-before-you-switch gate for the PQ path, same contract
    as the LSH and int8-SQ recall gates: compression choices ship with
    their measured accuracy cost, never assumed. The truth leg is the
    brute pass over the sampled query set — the explicit price of
    measuring; the PQ leg reuses the production plan unchanged.

    Measured: mean recall@5 = 0.14 at sf0.01 — deliberately honest. The
    codebooks here are K=|labels|=10 label-derived codes per subspace
    (chosen so the DuckDB oracle reproduces training exactly); production
    PQ uses K=256 k-means-trained codes, and the accuracy lever is
    exactly one sim_kmeans_refine pass per subspace — executed and
    re-measured in sim_pq_trained_recall (0.14 → 0.26 with K doubled).
    The gate exists so that switch is made on a measured number, not on
    hope."""
    truth = sim_topk_bruteforce(spark, sf_dir).select("q_vec_id", "n_vec_id")
    pq = sim_pq_adc_topk(spark, sf_dir).select(
        F.col("q_vec_id").alias("p_q"), F.col("n_vec_id").alias("p_n")
    )
    return (
        truth.join(
            pq,
            (F.col("q_vec_id") == F.col("p_q")) & (F.col("n_vec_id") == F.col("p_n")),
            "left",
        )
        .groupBy("q_vec_id")
        .agg(
            F.count("p_n").cast("bigint").alias("n_found"),
            (F.count("p_n").cast("double") / TOP_K).alias("recall"),
        )
    )


def _pq_trained_oracle() -> str:
    """PQ with one Lloyd refinement per subspace codebook, then the same
    ADC top-k + recall contract — the documented accuracy lever of
    sim_pq_recall_at_k, built from the proven kmeans/PQ SQL pieces."""
    return f"""
    WITH sub AS (
      SELECT vec_id, label, g.s,
             embedding[g.s * {_PQ_D} + 1 : g.s * {_PQ_D} + {_PQ_D}] AS subv
      FROM embeddings,
           (SELECT unnest(generate_series(0, {PQ_M - 1})) AS s) g),
    spx AS (SELECT label * 2 + vec_id % 2 AS cl, s, unnest(subv) AS x,
                   generate_subscripts(subv, 1) AS i
            FROM sub),
    cb AS (SELECT cl, s, i,
                  CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS v
           FROM spx GROUP BY cl, s, i),
    cbv AS (SELECT cl, s, list(v ORDER BY i) AS cvec FROM cb GROUP BY cl, s),
    dist1 AS (
      SELECT sub.vec_id, sub.s, cbv.cl,
             list_aggregate(list_transform(list_zip(sub.subv, cbv.cvec),
               p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                    * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), 'sum') AS d2
      FROM sub JOIN cbv ON cbv.s = sub.s),
    assign1 AS (
      SELECT vec_id, s, cluster FROM (
        SELECT vec_id, s, cl AS cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, cl) AS rn
        FROM dist1) WHERE rn = 1),
    rex AS (
      SELECT a.s, a.cluster, unnest(sub.subv) AS x,
             generate_subscripts(sub.subv, 1) AS i
      FROM assign1 a JOIN sub ON sub.vec_id = a.vec_id AND sub.s = a.s),
    rcb AS (SELECT s, cluster, i,
                   CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS rv
            FROM rex GROUP BY s, cluster, i),
    rcbv AS (SELECT s, cluster, list(rv ORDER BY i) AS rvec FROM rcb GROUP BY s, cluster),
    dist2 AS (
      SELECT sub.vec_id, sub.s, rcbv.cluster, rcbv.rvec,
             list_aggregate(list_transform(list_zip(sub.subv, rcbv.rvec),
               p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                    * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), 'sum') AS d2
      FROM sub JOIN rcbv ON rcbv.s = sub.s),
    codes AS (
      SELECT vec_id, s, rvec FROM (
        SELECT vec_id, s, rvec,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, cluster) AS rn
        FROM dist2) WHERE rn = 1),
    q AS (SELECT vec_id AS q_vec_id, s, subv AS q_sub FROM sub
          WHERE vec_id < {N_QUERIES}),
    qn AS (SELECT vec_id AS q_vec_id,
                  SQRT(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS q_norm
           FROM embeddings WHERE vec_id < {N_QUERIES}),
    parts AS (
      SELECT q.q_vec_id, c.vec_id AS n_vec_id, q.s,
             list_aggregate(list_transform(list_zip(q.q_sub, c.rvec),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') AS dotp,
             list_aggregate(list_transform(list_zip(c.rvec, c.rvec),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') AS np
      FROM q JOIN codes c ON c.s = q.s AND c.vec_id <> q.q_vec_id),
    folded AS (
      SELECT q_vec_id, n_vec_id,
             list_aggregate(list(dotp ORDER BY s), 'sum') AS adc_dot,
             list_aggregate(list(np ORDER BY s), 'sum') AS rnorm2
      FROM parts GROUP BY q_vec_id, n_vec_id),
    scored AS (
      SELECT f.q_vec_id, f.n_vec_id,
             ROUND(f.adc_dot / (qn.q_norm * SQRT(f.rnorm2)), 6) AS adc_score
      FROM folded f JOIN qn ON qn.q_vec_id = f.q_vec_id),
    pqr AS (
      SELECT q_vec_id, n_vec_id FROM (
        SELECT q_vec_id, n_vec_id,
               ROW_NUMBER() OVER (PARTITION BY q_vec_id
                                  ORDER BY adc_score DESC, n_vec_id) AS rk
        FROM scored) WHERE rk <= {TOP_K}),
    truth AS (
      SELECT q_vec_id, n_vec_id FROM (
        SELECT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY ROUND({_SQL_COS}, 6) DESC, b.vec_id) AS rk
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < {N_QUERIES})
      WHERE rk <= {TOP_K})
    SELECT t.q_vec_id,
           CAST(COUNT(s2.n_vec_id) AS BIGINT) AS n_found,
           CAST(COUNT(s2.n_vec_id) AS DOUBLE) / {TOP_K} AS recall
    FROM truth t LEFT JOIN pqr s2
      ON t.q_vec_id = s2.q_vec_id AND t.n_vec_id = s2.n_vec_id
    GROUP BY t.q_vec_id
    """


@register(
    "sim_pq_trained_recall",
    _pq_trained_oracle(),
    doc=(
        "PQ accuracy lever, executed: one Lloyd refinement per subspace "
        f"codebook, then ADC top-{TOP_K} recall vs float32 truth."
    ),
)
def sim_pq_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Executes the lever sim_pq_recall_at_k documents: double the
    codebook (K=2·|labels| parity-split seeds) and refit each subspace
    with one Lloyd step (assign subvectors to seeds, recompute means over
    the actual assignment — the per-subspace instance of
    sim_kmeans_refine), then re-measure recall.

    Measured: 0.14 → 0.26 mean recall@5 at sf0.01. Also measured: with
    the original K=10 label seeds, one Lloyd step changes NOTHING (label
    seeds are already Lloyd-stationary on this corpus) — K is the binding
    constraint, which is why this variant moves K first. Training adds
    one broadcast-assign pass plus one state-sized (s, cluster, dim)
    decimal-mean shuffle per iteration — the 100 TB PQ training loop is
    literally this stage repeated. All float ops stay order-pinned, so
    codebooks, codes, scores, and recall hash-match the oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    subs = emb.select(
        "vec_id",
        "label",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("s"),
        "embedding",
    ).select(
        "vec_id", "label", "s", F.expr(f"slice(embedding, s * {_PQ_D} + 1, {_PQ_D})").alias("subv")
    )
    spx = subs.select(
        (F.col("label") * 2 + F.col("vec_id") % 2).alias("cl"),
        "s",
        F.posexplode("subv").alias("i", "x"),
    )
    cb = spx.groupBy("cl", "s", "i").agg(
        (F.sum(F.col("x").cast("decimal(20,10)")).cast("double") / F.count(F.lit(1))).alias("v")
    )
    cbv = (
        cb.groupBy("cl", "s")
        .agg(F.array_sort(F.collect_list(F.struct("i", "v"))).alias("iv"))
        .select("cl", "s", F.transform("iv", lambda e: e["v"]).alias("cvec"))
    )

    # Pass 1 (assign to the parity-split seeds) runs as an in-row argmin
    # against the ONE-row seed pack — the (vec, s)-keyed window and its
    # corpus × M × K shuffle are gone. Cluster identity flows as the
    # POSITION in the cl-sorted seed list (a bijection, cl is a key), so
    # tie-breaks and the refit grouping are bit-identical.
    a1 = (
        emb.select("vec_id", "embedding")
        .crossJoin(broadcast(_pq_centroid_pack(cbv, "cl")))
        .select(
            "vec_id", "embedding", F.transform(_pq_winner_array(), lambda x: x["j"]).alias("codes")
        )
    )
    rex = (
        a1.select(
            "embedding",
            "codes",
            F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("s"),
        )
        .select(
            "s",
            F.element_at(F.col("codes"), F.col("s") + 1).alias("cluster"),
            F.expr(f"slice(embedding, s * {_PQ_D} + 1, {_PQ_D})").alias("subv"),
        )
        .select("s", "cluster", F.posexplode("subv").alias("i", "x"))
    )
    rcb = rex.groupBy("s", "cluster", "i").agg(
        (F.sum(F.col("x").cast("decimal(20,10)")).cast("double") / F.count(F.lit(1))).alias("rv")
    )
    rcbv = (
        rcb.groupBy("s", "cluster")
        .agg(F.array_sort(F.collect_list(F.struct("i", "rv"))).alias("iv"))
        .select("s", "cluster", F.transform("iv", lambda e: e["rv"]).alias("cvec"))
    )
    # the refit codebook's pack is the only thing the corpus-sized refit
    # subtree feeds — checkpoint it once for both consumers
    pack2 = cache.checkpoint(_pq_centroid_pack(rcbv, "cluster"))
    win = (
        emb.select("vec_id", "embedding")
        .crossJoin(broadcast(pack2))
        .select("vec_id", _pq_winner_array().alias("w"))
    )
    rscored = win.select(
        "vec_id",
        F.transform("w", lambda x: x["j"]).alias("codes"),
        _fold_sum(F.transform("w", lambda x: dot(x["cvec"], x["cvec"]))).alias("rnorm2"),
    )
    qpack = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .crossJoin(broadcast(pack2))
        .select(
            F.col("vec_id").alias("q_vec_id"),
            _pq_query_dps().alias("dps"),
            F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("q_norm"),
        )
    )
    scored = (
        rscored.crossJoin(broadcast(qpack))
        .filter(F.col("vec_id") != F.col("q_vec_id"))
        .select(
            "q_vec_id",
            F.col("vec_id").alias("n_vec_id"),
            F.round(
                _adc_lookup_fold("dps") / (F.col("q_norm") * F.sqrt(F.col("rnorm2"))), 6
            ).alias("adc_score"),
        )
    )
    w_rank = Window.partitionBy("q_vec_id").orderBy(F.col("adc_score").desc(), F.col("n_vec_id"))
    pqr = (
        scored.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= TOP_K)
        .select(F.col("q_vec_id").alias("p_q"), F.col("n_vec_id").alias("p_n"))
    )
    truth = sim_topk_bruteforce(spark, sf_dir).select("q_vec_id", "n_vec_id")
    return (
        truth.join(
            pqr,
            (F.col("q_vec_id") == F.col("p_q")) & (F.col("n_vec_id") == F.col("p_n")),
            "left",
        )
        .groupBy("q_vec_id")
        .agg(
            F.count("p_n").cast("bigint").alias("n_found"),
            (F.count("p_n").cast("double") / TOP_K).alias("recall"),
        )
    )


# --- maximum inner product search (the third FAISS metric) ------------------


@register(
    "sim_topk_inner_product",
    f"""
    SELECT q_vec_id, n_vec_id, ip, rk FROM (
      SELECT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id,
             ROUND({_SQL_DOT_AB}, 6) AS ip,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                ORDER BY ROUND({_SQL_DOT_AB}, 6) DESC, b.vec_id) AS rk
      FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES})
    WHERE rk <= {TOP_K}
    """,
    doc=(
        f"Maximum-inner-product top-{TOP_K} for {N_QUERIES} queries — "
        "MIPS, the retrieval metric of un-normalized two-tower models; "
        "same broadcast + per-query window shape as the cosine baseline."
    ),
)
def sim_topk_inner_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIPS completes the cosine/range/IP metric set (FAISS's three): raw
    dot product ranking, used when embedding magnitude carries signal
    (recommender two-tower scores, unnormalized retrieval heads). No
    norm division — cheaper than cosine — but NOT bucketable by the
    angular LSH family (hyperplane buckets are magnitude-blind); the
    standard scale path is the MIPS→cosine reduction (augment each
    vector with sqrt(M²−‖x‖²) then run any cosine ANN index) or IP-IVF.
    Plan shape is the audited brute-force baseline: query set broadcast,
    corpus scan stays put, per-query top-k via the rank window, dot
    product in the bit-exact JVM fold."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.select(F.col("vec_id").alias("n_vec_id"), F.col("embedding").alias("n_emb"))
    ip = F.round(dot(F.col("q_emb"), F.col("n_emb")), 6)
    w = Window.partitionBy("q_vec_id").orderBy(F.col("ip").desc(), F.col("n_vec_id"))
    return (
        c.crossJoin(broadcast(q))
        .filter(F.col("n_vec_id") != F.col("q_vec_id"))
        .select("q_vec_id", "n_vec_id", ip.alias("ip"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


# --- IVF index occupancy report ---------------------------------------------


@register(
    "sim_ivf_cell_stats",
    """
    WITH kc AS (SELECT label, COUNT(*) AS cnt FROM embeddings GROUP BY label),
    stats AS (SELECT COUNT(*) AS n_cells, CAST(SUM(cnt) AS BIGINT) AS n_vecs FROM kc)
    SELECT k.label, k.cnt, s.n_cells, s.n_vecs,
           ROUND(CAST(k.cnt AS DOUBLE) * s.n_cells / s.n_vecs, 6) AS occupancy_ratio
    FROM kc k CROSS JOIN stats s
    """,
    doc=(
        "IVF cell-occupancy report (count + multiple-of-mean per cell) — "
        "the index-balance check that decides whether the coarse quantizer "
        "needs retraining before probe latency goes bimodal."
    ),
)
def sim_ivf_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN analog of ``scan_skew_report``: IVF probe cost is the size
    of the probed cell, so a hot cell makes query latency bimodal and a
    near-empty cell wastes its centroid. This face reports per-cell
    occupancy and its ratio to the mean (two exact BIGINTs through one
    pinned double division). Ratios far from 1 are the signal to re-run
    ``sim_kmeans_refine`` (balancing the quantizer) or to split hot cells
    — same remedy family as salting a skewed join key. One keyed count
    with map-side combine + a 1-row stat broadcast."""
    from pyspark.sql.functions import broadcast

    emb = load_table(spark, sf_dir, "embeddings")
    kc = emb.groupBy("label").agg(F.count(F.lit(1)).alias("cnt"))
    stats = kc.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("cnt").cast("bigint").alias("n_vecs"),
    )
    ratio = F.round(
        F.col("cnt").cast("double") * F.col("n_cells") / F.col("n_vecs"), 6
    )
    return (
        kc.crossJoin(broadcast(stats))
        .select("label", "cnt", "n_cells", "n_vecs", ratio.alias("occupancy_ratio"))
    )


# --- recall-vs-nprobe curve (the IVF tuning instrument) ---------------------

PROBE_GRID = (1, 2, 3, 5)


@register(
    "sim_ivf_recall_curve",
    f"""
    WITH ex AS (SELECT label, unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings),
    cent AS (SELECT label, i,
                    CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS v
             FROM ex GROUP BY label, i),
    cvecs AS (SELECT label, list(v ORDER BY i) AS cvec FROM cent GROUP BY label),
    q AS (SELECT vec_id AS q_vec_id, embedding AS q_emb FROM embeddings
          WHERE vec_id < {N_QUERIES}),
    qc AS (SELECT q_vec_id, label,
                  ROW_NUMBER() OVER (PARTITION BY q_vec_id
                                     ORDER BY {_SQL_COS_QC} DESC, label) AS cent_rank
           FROM q CROSS JOIN cvecs),
    truth AS (
      SELECT q_vec_id, n_vec_id FROM (
        SELECT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY ROUND({_SQL_COS}, 6) DESC, b.vec_id) AS rk
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < {N_QUERIES})
      WHERE rk <= {TOP_K}),
    covered AS (
      SELECT t.q_vec_id, t.n_vec_id, qc.cent_rank
      FROM truth t
      JOIN embeddings n ON n.vec_id = t.n_vec_id
      JOIN qc ON qc.q_vec_id = t.q_vec_id AND qc.label = n.label)
    {' UNION ALL '.join(
        f"SELECT {p} AS nprobe, "
        f"CAST(SUM(CASE WHEN cent_rank <= {p} THEN 1 ELSE 0 END) AS BIGINT) AS n_found, "
        f"CAST({N_QUERIES * TOP_K} AS BIGINT) AS n_truth, "
        f"ROUND(CAST(SUM(CASE WHEN cent_rank <= {p} THEN 1 ELSE 0 END) AS DOUBLE) / {N_QUERIES * TOP_K}, 6) AS recall "
        "FROM covered"
        for p in PROBE_GRID
    )}
    """,
    doc=(
        f"IVF recall ceiling vs nprobe ∈ {PROBE_GRID}: fraction of the exact "
        f"top-{TOP_K} lying within the n nearest cells per query — the "
        "curve that picks the nprobe/latency trade."
    ),
)
def sim_ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tuning instrument for the IVF path: for each candidate nprobe,
    what fraction of the exact top-k is even REACHABLE (lies in the n
    nearest cells)? Rerank inside probed cells is exact, so this is the
    achievable-recall ceiling per nprobe — read the curve, pick the
    smallest nprobe above your recall target, and you have sized the
    query cost (nprobe·cell_size compares) from data instead of folklore.
    One centroid-rank table (queries × cells, both tiny sides broadcast)
    joined to the truth set; each curve point is an integer count over
    the same covered table — integer/pinned-division end to end."""
    emb = load_table(spark, sf_dir, "embeddings")
    truth = sim_topk_bruteforce(spark, sf_dir).select("q_vec_id", "n_vec_id")
    ex = emb.select("label", F.posexplode("embedding").alias("i", "x"))
    cent = ex.groupBy("label", "i").agg(
        (F.sum(F.col("x").cast("decimal(20,10)")).cast("double") / F.count(F.lit(1))).alias("v")
    )
    cvecs = (
        cent.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "v"))).alias("iv"))
        .select("label", F.transform("iv", lambda e: e["v"]).alias("cvec"))
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    wq = Window.partitionBy("q_vec_id").orderBy(
        cosine(F.col("q_emb"), F.col("cvec")).desc(), F.col("label")
    )
    qc = (
        q.crossJoin(broadcast(cvecs))
        .withColumn("cent_rank", F.row_number().over(wq))
        .select("q_vec_id", "label", "cent_rank")
    )
    nlab = emb.select(F.col("vec_id").alias("n_vec_id"), F.col("label").alias("n_label"))
    covered = (
        truth.join(broadcast(nlab), "n_vec_id")
        .join(
            broadcast(qc),
            (truth.q_vec_id == qc.q_vec_id) & (F.col("n_label") == qc.label),
        )
        .select(truth.q_vec_id, "n_vec_id", "cent_rank")
    )
    covered = cache.checkpoint(covered)
    denom = N_QUERIES * TOP_K
    pts = []
    for p in PROBE_GRID:
        hit = F.sum(F.when(F.col("cent_rank") <= p, 1).otherwise(0))
        pts.append(
            covered.agg(
                hit.cast("bigint").alias("n_found"),
            ).select(
                F.lit(p).alias("nprobe"),
                "n_found",
                F.lit(denom).cast("bigint").alias("n_truth"),
                F.round(F.col("n_found").cast("double") / denom, 6).alias("recall"),
            )
        )
    out = pts[0]
    for d in pts[1:]:
        out = out.unionAll(d)
    return out


# --- two-stage ANN: PQ shortlist + exact re-rank ----------------------------

RERANK_POOL = 25  # ADC shortlist size; 5x the served k


def _sql_pq_pool() -> str:
    """The registered PQ oracle with its rank cutoff widened to the
    re-rank pool size (single, asserted substitution — the oracle string
    is the one source of truth for the PQ pipeline)."""
    from trike_spark.registry import REGISTRY

    base = REGISTRY["sim_pq_adc_topk"].oracle
    needle = f"WHERE rk <= {TOP_K}"
    assert base.count(needle) == 1, "PQ oracle changed; update _sql_pq_pool"
    return base.replace(needle, f"WHERE rk <= {RERANK_POOL}")


@register(
    "sim_pq_rerank_topk",
    f"""
    WITH pool AS ({_sql_pq_pool()})
    SELECT q_vec_id, n_vec_id, cosine, rk FROM (
      SELECT p.q_vec_id, p.n_vec_id,
             ROUND({_SQL_COS}, 6) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY p.q_vec_id
                                ORDER BY ROUND({_SQL_COS}, 6) DESC, p.n_vec_id) AS rk
      FROM pool p
      JOIN embeddings a ON a.vec_id = p.q_vec_id
      JOIN embeddings b ON b.vec_id = p.n_vec_id)
    WHERE rk <= {TOP_K}
    """,
    doc=(
        f"Two-stage ANN serving: PQ-ADC shortlist (pool {RERANK_POOL}) "
        f"re-ranked by EXACT cosine to top-{TOP_K} — the standard "
        "compressed-index + refine pattern."
    ),
)
def sim_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving pattern every production ANN system uses (FAISS
    IndexIVFPQ + refine, ScaNN's reorder stage): a cheap compressed-domain
    shortlist (PQ-ADC over M-byte codes — never touches raw vectors),
    then exact scoring of ONLY pool=|Q|·{RERANK_POOL} candidates. ADC's
    quantization error costs ranking fidelity; the re-rank recovers it
    for the price of {RERANK_POOL} full-vector reads per query
    (tests/test_pq_rerank.py measures recall@{TOP_K} strictly above the
    raw PQ ranking on the same codes). Scale shape: stage 1 is the
    audited PQ plan unchanged; stage 2 joins the tiny pool against
    embeddings by vec_id — a point-lookup join (broadcast pool), so the
    100 TB cost is the shortlist's, not the corpus's."""
    pool = sim_pq_adc_topk(spark, sf_dir, k=RERANK_POOL).select(
        "q_vec_id", "n_vec_id"
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.select(F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb"))
    nv = emb.select(F.col("vec_id").alias("n_vec_id"), F.col("embedding").alias("n_emb"))
    scored = (
        broadcast(pool)
        .join(qv, on="q_vec_id")
        .join(nv, on="n_vec_id")
        .select(
            "q_vec_id",
            "n_vec_id",
            F.round(cosine(F.col("q_emb"), F.col("n_emb")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.col("cosine").desc(), F.col("n_vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("q_vec_id", "n_vec_id", "cosine", "rk")
    )


# --- dimension-truncation (Matryoshka-style) recall -------------------------

PREFIX_DIM = 32  # serve on the first half of the embedding


def _sql_prefix_cos(a: str, b: str) -> str:
    za = f"list_zip({a}.embedding[1:{PREFIX_DIM}], {b}.embedding[1:{PREFIX_DIM}])"
    dot = (
        f"list_aggregate(list_transform({za}, "
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
    )
    nrm = (
        "SQRT(list_aggregate(list_transform({v}.embedding[1:%d], "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))" % PREFIX_DIM
    )
    return f"{dot} / ({nrm.format(v=a)} * {nrm.format(v=b)})"


@register(
    "sim_prefix_dim_recall",
    f"""
    WITH truth AS (
      SELECT q_vec_id, n_vec_id FROM (
        SELECT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY ROUND({_SQL_COS}, 6) DESC, b.vec_id) AS rk
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < {N_QUERIES})
      WHERE rk <= {TOP_K}),
    pref AS (
      SELECT q_vec_id, n_vec_id FROM (
        SELECT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY ROUND({_sql_prefix_cos('a', 'b')}, 6) DESC,
                                           b.vec_id) AS rk
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < {N_QUERIES})
      WHERE rk <= {TOP_K})
    SELECT t.q_vec_id,
           CAST(COUNT(p.n_vec_id) AS BIGINT) AS n_found,
           CAST(COUNT(p.n_vec_id) AS DOUBLE) / {TOP_K} AS recall
    FROM truth t LEFT JOIN pref p
      ON t.q_vec_id = p.q_vec_id AND t.n_vec_id = p.n_vec_id
    GROUP BY t.q_vec_id
    """,
    doc=(
        f"Dimension-truncation recall: top-{TOP_K} served on the first "
        f"{PREFIX_DIM} of {DIM} dims vs full-dim truth — the Matryoshka "
        "half-cost/half-bandwidth trade, measured per query."
    ),
)
def sim_prefix_dim_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The newest lever in the ANN cost menu (Matryoshka representation
    learning): serve on a PREFIX of the embedding — half the dims is half
    the scan bytes, half the dot-product FLOPs, and (unlike PQ) needs no
    trained codebook, just truncation. This face measures what that buys
    on THIS corpus: recall@{TOP_K} of prefix-cosine ranking against the
    full-dim truth. (Random embeddings have no Matryoshka structure, so
    the measured recall is the pessimistic floor; MRL-trained vectors
    front-load variance and score far higher — the face is the measure,
    not the claim.) Same audited scale shape as every recall face:
    broadcast query set, per-query top-k window, |Q|·k survivors."""
    emb = load_table(spark, sf_dir, "embeddings")
    pre = F.expr(f"slice(embedding, 1, {PREFIX_DIM})")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_full"),
        pre.alias("q_pre"),
    )
    c = emb.select(
        F.col("vec_id").alias("n_vec_id"),
        F.col("embedding").alias("n_full"),
        pre.alias("n_pre"),
    )
    pairs = c.crossJoin(broadcast(q)).filter(F.col("n_vec_id") != F.col("q_vec_id"))

    def topk(scored, col):
        w = Window.partitionBy("q_vec_id").orderBy(F.col(col).desc(), F.col("n_vec_id"))
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOP_K)
            .select("q_vec_id", "n_vec_id")
        )

    truth = topk(
        pairs.select(
            "q_vec_id", "n_vec_id",
            F.round(cosine(F.col("q_full"), F.col("n_full")), 6).alias("s"),
        ),
        "s",
    )
    pref = topk(
        pairs.select(
            "q_vec_id", "n_vec_id",
            F.round(cosine(F.col("q_pre"), F.col("n_pre")), 6).alias("s"),
        ),
        "s",
    )
    return (
        truth.alias("t")
        .join(
            pref.alias("p"),
            (F.col("t.q_vec_id") == F.col("p.q_vec_id"))
            & (F.col("t.n_vec_id") == F.col("p.n_vec_id")),
            "left",
        )
        .groupBy(F.col("t.q_vec_id").alias("q_vec_id"))
        .agg(
            F.count(F.col("p.n_vec_id")).alias("n_found"),
            (F.count(F.col("p.n_vec_id")).cast("double") / TOP_K).alias("recall"),
        )
    )


# --- triplet mining (contrastive-training data) ------------------------------


@register(
    "sim_triplet_mining",
    f"""
    WITH sc AS (
      SELECT a.vec_id AS q_vec_id, a.label AS q_label,
             b.vec_id AS n_vec_id, b.label AS n_label,
             ROUND({_SQL_COS}, 6) AS cosine
      FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}),
    pos AS (
      SELECT q_vec_id, n_vec_id AS pos_vec_id, cosine AS cos_pos FROM (
        SELECT q_vec_id, n_vec_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY q_vec_id
                                  ORDER BY cosine DESC, n_vec_id) AS rk
        FROM sc WHERE n_label = q_label) WHERE rk = 1),
    neg AS (
      SELECT q_vec_id, n_vec_id AS neg_vec_id, cosine AS cos_neg FROM (
        SELECT q_vec_id, n_vec_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY q_vec_id
                                  ORDER BY cosine DESC, n_vec_id) AS rk
        FROM sc WHERE n_label <> q_label) WHERE rk = 1)
    SELECT p.q_vec_id, pos_vec_id, cos_pos, neg_vec_id, cos_neg,
           ROUND(cos_pos - cos_neg, 6) AS margin
    FROM pos p JOIN neg n ON p.q_vec_id = n.q_vec_id
    """,
    doc=(
        "Triplet mining for contrastive training: per anchor, the nearest "
        "same-label positive and the nearest WRONG-label (hard) negative, "
        "with the cos_pos - cos_neg margin."
    ),
)
def sim_triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor, positive, hard-negative) triplet generation — the data a
    contrastive embedding-training run consumes. Hard negatives are the
    highest-cosine wrong-label neighbors (the ones the current embedding
    most confuses), which is the standard mining rule.

    Scale shape: one scored pass (broadcast anchor set, corpus streams),
    then ONE window partitioned by (anchor, same-label?) picks both the
    positive and the negative — the candidate stream is ranked once, not
    once per role. Only the two rk=1 survivors per (anchor, side) reach
    the final pivot; anchors lacking either side drop (inner-join parity
    with the oracle)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
    )
    c = emb.select(
        F.col("vec_id").alias("n_vec_id"),
        F.col("label").alias("n_label"),
        F.col("embedding").alias("n_emb"),
    )
    sc = (
        c.crossJoin(broadcast(q))
        .filter(F.col("n_vec_id") != F.col("q_vec_id"))
        .select(
            "q_vec_id",
            "n_vec_id",
            (F.col("n_label") == F.col("q_label")).alias("same"),
            F.round(cosine(F.col("q_emb"), F.col("n_emb")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_vec_id", "same").orderBy(
        F.col("cosine").desc(), F.col("n_vec_id")
    )
    best = sc.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    out = best.groupBy("q_vec_id").agg(
        F.max(F.when(F.col("same"), F.col("n_vec_id"))).alias("pos_vec_id"),
        F.max(F.when(F.col("same"), F.col("cosine"))).alias("cos_pos"),
        F.max(F.when(~F.col("same"), F.col("n_vec_id"))).alias("neg_vec_id"),
        F.max(F.when(~F.col("same"), F.col("cosine"))).alias("cos_neg"),
    )
    return (
        out.filter(F.col("pos_vec_id").isNotNull() & F.col("neg_vec_id").isNotNull())
        .select(
            "q_vec_id",
            "pos_vec_id",
            "cos_pos",
            "neg_vec_id",
            "cos_neg",
            F.round(F.col("cos_pos") - F.col("cos_neg"), 6).alias("margin"),
        )
    )


# --- MIPS → cosine reduction check -------------------------------------------

_SQL_NORM2_B = (
    "list_aggregate(list_transform(b.embedding, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')"
)


@register(
    "sim_mips_reduction_check",
    f"""
    WITH m AS (
      SELECT MAX(list_aggregate(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS m2
      FROM embeddings),
    truth AS (
      SELECT q_vec_id, n_vec_id FROM (
        SELECT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY ROUND({_SQL_DOT_AB}, 6) DESC, b.vec_id) AS rk
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < {N_QUERIES})
      WHERE rk <= {TOP_K}),
    red AS (
      SELECT q_vec_id, n_vec_id FROM (
        SELECT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY ROUND(({_SQL_DOT_AB} + 0.0 * SQRT(m.m2 - {_SQL_NORM2_B}))
                                                 / ({_sql_norm('a')} * SQRT(m.m2)), 6) DESC,
                                           b.vec_id) AS rk
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
             CROSS JOIN m
        WHERE a.vec_id < {N_QUERIES})
      WHERE rk <= {TOP_K})
    SELECT t.q_vec_id,
           CAST(COUNT(r.n_vec_id) AS BIGINT) AS n_found,
           CAST(COUNT(r.n_vec_id) AS DOUBLE) / {TOP_K} AS recall
    FROM truth t LEFT JOIN red r
      ON t.q_vec_id = r.q_vec_id AND t.n_vec_id = r.n_vec_id
    GROUP BY t.q_vec_id
    """,
    doc=(
        "MIPS→cosine reduction proof: augmenting each vector with "
        "sqrt(M² − ‖x‖²) makes cosine ranking reproduce inner-product "
        "ranking; recall@k vs MIPS truth (must be 1.0)."
    ),
)
def sim_mips_reduction_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Executes the reduction `sim_topk_inner_product`'s docstring merely
    cites: append sqrt(M² − ‖x‖²) to every corpus vector (M = max norm)
    and 0 to the query — then every augmented vector has norm exactly M,
    so cosine(q̂, x̂) = dot(q, x) / (‖q‖·M) and the cosine RANKING equals
    the inner-product ranking. That is what lets the MIPS workload ride
    any cosine ANN index (LSH buckets, IVF cells) unchanged. The face
    ranks both ways and reports recall@k of the reduction against the
    MIPS truth — a structural identity, so the driver hash pins it at
    exactly 1.0 (the augmented term enters the score expression with
    weight 0 · sqrt(·), mirroring the algebra while keeping the pinned
    float path identical in both engines).

    Scale shape: both legs are the audited brute-force shape (broadcast
    query set, per-query rank window); M is a 1-row broadcast."""
    m2df = emb_norms_m2(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    c = e.select(F.col("vec_id").alias("n_vec_id"), F.col("embedding").alias("n_emb"))
    pairs = (
        c.crossJoin(broadcast(q))
        .filter(F.col("n_vec_id") != F.col("q_vec_id"))
        .crossJoin(broadcast(m2df))
    )
    ip = dot(F.col("q_emb"), F.col("n_emb"))
    norm2_b = dot(F.col("n_emb"), F.col("n_emb"))
    aug_cos = (ip + F.lit(0.0) * F.sqrt(F.col("m2") - norm2_b)) / (
        F.sqrt(dot(F.col("q_emb"), F.col("q_emb"))) * F.sqrt(F.col("m2"))
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.col("score").desc(), F.col("n_vec_id"))

    def topk(score_col):
        return (
            pairs.select("q_vec_id", "n_vec_id", score_col.alias("score"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOP_K)
            .select("q_vec_id", "n_vec_id")
        )

    truth = topk(F.round(ip, 6))
    red = topk(F.round(aug_cos, 6)).select(
        F.col("q_vec_id").alias("r_q"), F.col("n_vec_id").alias("r_n")
    )
    return (
        truth.join(
            red,
            (F.col("q_vec_id") == F.col("r_q")) & (F.col("n_vec_id") == F.col("r_n")),
            "left",
        )
        .groupBy("q_vec_id")
        .agg(
            F.count("r_n").cast("bigint").alias("n_found"),
            (F.count("r_n").cast("double") / TOP_K).alias("recall"),
        )
    )


def emb_norms_m2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row (m2,) frame: the corpus max squared norm — the constant the
    MIPS augmentation needs; broadcast wherever used."""
    e = load_table(spark, sf_dir, "embeddings")
    n2 = dot(F.col("embedding"), F.col("embedding"))
    return e.agg(F.max(n2).alias("m2"))


# --- MMR diversified rerank ---------------------------------------------------

MMR_CANDIDATES = 20
MMR_K = 5
MMR_LAMBDA = 0.7  # relevance weight; (1 - λ) penalizes redundancy


def _mmr_oracle_sql() -> str:
    """Unrolled greedy MMR in plain SQL: pick1 is argmax relevance; each
    later pick maximizes λ·rel − (1−λ)·max-sim-to-chosen over the not-yet-
    chosen candidates. Unrolling (k−1 chained CTEs) sidesteps recursive-CTE
    restrictions and keeps every step a vanilla window query."""
    head = f"""
    WITH cand AS (
      SELECT q_vec_id, vec_id, embedding, rel FROM (
        SELECT a.vec_id AS q_vec_id, b.vec_id, b.embedding,
               ROUND({_SQL_COS}, 6) AS rel,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY ROUND({_SQL_COS}, 6) DESC, b.vec_id) AS rk
        FROM embeddings a JOIN embeddings b
          ON a.vec_id < {N_QUERIES} AND b.vec_id >= {N_QUERIES})
      WHERE rk <= {MMR_CANDIDATES}),
    psim AS (
      SELECT a.q_vec_id, a.vec_id AS i, b.vec_id AS j, {_SQL_COS} AS sim
      FROM cand a JOIN cand b
        ON a.q_vec_id = b.q_vec_id AND a.vec_id <> b.vec_id),
    pick1 AS (
      SELECT q_vec_id, vec_id, {MMR_LAMBDA} * rel AS mmr FROM (
        SELECT q_vec_id, vec_id, rel,
               ROW_NUMBER() OVER (PARTITION BY q_vec_id
                                  ORDER BY rel DESC, vec_id) AS rn
        FROM cand) WHERE rn = 1),
    chosen1 AS (SELECT q_vec_id, vec_id FROM pick1)"""
    steps = []
    for n in range(2, MMR_K + 1):
        steps.append(f""",
    pick{n} AS (
      SELECT q_vec_id, vec_id, mmr FROM (
        SELECT c.q_vec_id, c.vec_id,
               {MMR_LAMBDA} * c.rel - {round(1 - MMR_LAMBDA, 6)} * m.msim AS mmr,
               ROW_NUMBER() OVER (
                 PARTITION BY c.q_vec_id
                 ORDER BY {MMR_LAMBDA} * c.rel - {round(1 - MMR_LAMBDA, 6)} * m.msim DESC,
                          c.vec_id) AS rn
        FROM cand c
        JOIN (SELECT p.q_vec_id, p.i AS vec_id, MAX(p.sim) AS msim
              FROM psim p JOIN chosen{n - 1} ch
                ON ch.q_vec_id = p.q_vec_id AND ch.vec_id = p.j
              GROUP BY p.q_vec_id, p.i) m
          ON m.q_vec_id = c.q_vec_id AND m.vec_id = c.vec_id
        WHERE NOT EXISTS (SELECT 1 FROM chosen{n - 1} ch2
                          WHERE ch2.q_vec_id = c.q_vec_id
                            AND ch2.vec_id = c.vec_id)
      ) WHERE rn = 1),
    chosen{n} AS (SELECT q_vec_id, vec_id FROM chosen{n - 1}
                  UNION ALL SELECT q_vec_id, vec_id FROM pick{n})""")
    unions = "\n    UNION ALL ".join(
        f"SELECT q_vec_id, {n} AS step, vec_id, mmr FROM pick{n}"
        for n in range(1, MMR_K + 1)
    )
    return head + "".join(steps) + f"\n    {unions}"


@register(
    "sim_mmr_rerank",
    _mmr_oracle_sql(),
    doc=(
        f"Maximal-marginal-relevance rerank: greedy top-{MMR_K} from "
        f"{MMR_CANDIDATES} candidates per query, trading relevance against "
        "redundancy (λ=0.7) — the diversity-aware second stage of retrieval."
    ),
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval with a diversity-aware second stage (Carbonell &
    Goldstein's MMR): stage 1 fetches each query's top candidates by
    cosine; stage 2 greedily picks k, each pick maximizing
    λ·rel(d) − (1−λ)·max_{s∈chosen} sim(d, s) — near-duplicates of an
    already-chosen result are penalized out, which is exactly the
    redundancy control a training-data retrieval loop needs.

    Execution shape: candidate generation is the broadcast brute-force
    pass (swap in the LSH/IVF faces at scale — the rerank is agnostic to
    how candidates arrived); the greedy stage is ``applyInPandas`` over
    q_vec_id groups of ≤ {MMR_CANDIDATES} rows — per-query work is O(k·C)
    on a C-row group, embarrassingly parallel across queries, and the
    only shuffle is the candidate regroup.

    Cross-engine determinism: rel is rounded-6 by BOTH engines before the
    greedy stage; candidate-candidate similarity folds left-to-right in
    float64 in BOTH engines (Python loop ↔ DuckDB list_aggregate — same
    IEEE op order as the JVM ``aggregate`` fold, proven by the brute-force
    faces); the MMR score is the same pinned double expression; argmax
    ties break on vec_id. Output mmr is raw double — identical bits on
    both sides, no rounding needed."""
    import math

    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES)
    rel = F.round(cosine(F.col("q_emb"), F.col("embedding")), 6)
    w = Window.partitionBy("q_vec_id").orderBy(F.col("rel").desc(), F.col("vec_id"))
    cand = (
        c.crossJoin(broadcast(q))
        .select("q_vec_id", "vec_id", "embedding", rel.alias("rel"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= MMR_CANDIDATES)
        .drop("rk")
    )

    def _fold_cos(x: list[float], y: list[float]) -> float:
        dxy = 0.0
        dxx = 0.0
        dyy = 0.0
        for a, b in zip(x, y):
            dxy = dxy + a * b
        for a in x:
            dxx = dxx + a * a
        for b in y:
            dyy = dyy + b * b
        return dxy / (math.sqrt(dxx) * math.sqrt(dyy))

    def _mmr(pdf: "pd.DataFrame") -> "pd.DataFrame":
        qid = int(pdf["q_vec_id"].iloc[0])
        cands = sorted(
            (
                (-float(r.rel), int(r.vec_id), [float(v) for v in r.embedding])
                for r in pdf.itertuples()
            ),
        )
        # (−rel, vec_id) sort order = the oracle's (rel DESC, vec_id) pick1
        ids = [t[1] for t in cands]
        rels = {t[1]: -t[0] for t in cands}
        embs = {t[1]: t[2] for t in cands}
        lam, mu = MMR_LAMBDA, round(1 - MMR_LAMBDA, 6)
        first = ids[0]
        out = [(qid, 1, first, lam * rels[first])]
        chosen = [first]
        remaining = [i for i in ids if i != first]
        simcache: dict[tuple[int, int], float] = {}

        def sim(i: int, j: int) -> float:
            k = (i, j) if i < j else (j, i)
            if k not in simcache:
                simcache[k] = _fold_cos(embs[i], embs[j])
            return simcache[k]

        for step in range(2, MMR_K + 1):
            best = None
            for i in remaining:
                msim = max(sim(i, j) for j in chosen)
                score = lam * rels[i] - mu * msim
                key = (score, -i)
                if best is None or key > best[0]:
                    best = (key, i, score)
            _, pick, score = best
            out.append((qid, step, pick, score))
            chosen.append(pick)
            remaining.remove(pick)
        return pd.DataFrame(out, columns=["q_vec_id", "step", "vec_id", "mmr"])

    return cand.groupBy("q_vec_id").applyInPandas(
        _mmr, schema="q_vec_id long, step int, vec_id long, mmr double"
    )


@register(
    "sim_lsh_ndcg_at_k",
    f"""
    WITH {_SQL_BUCKETED},
    {_SQL_CAND},
    truth AS (
      SELECT q_vec_id, n_vec_id, rk FROM (
        SELECT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY ROUND({_SQL_COS}, 6) DESC, b.vec_id) AS rk
        FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < {N_QUERIES})
      WHERE rk <= {TOP_K}),
    ranked AS (
      SELECT q_vec_id, n_vec_id, ark FROM (
        SELECT c.q_vec_id, c.n_vec_id,
               ROW_NUMBER() OVER (PARTITION BY c.q_vec_id
                                  ORDER BY ROUND({_SQL_COS}, 6) DESC, c.n_vec_id) AS ark
        FROM cand c JOIN embeddings a ON a.vec_id = c.q_vec_id
                    JOIN embeddings b ON b.vec_id = c.n_vec_id)
      WHERE ark <= {TOP_K}),
    graded AS (
      SELECT r.q_vec_id,
             CASE WHEN t.rk IS NULL THEN 0 ELSE {TOP_K + 1} - t.rk END AS rel,
             ROUND(CAST(CASE WHEN t.rk IS NULL THEN 0
                             ELSE {TOP_K + 1} - t.rk END AS DOUBLE)
                   / LOG2(CAST(r.ark + 1 AS DOUBLE)), 6) AS contrib
      FROM ranked r LEFT JOIN truth t
        ON t.q_vec_id = r.q_vec_id AND t.n_vec_id = r.n_vec_id),
    dcg AS (
      SELECT q_vec_id,
             CAST(SUM(CAST(contrib AS DECIMAL(18,6))) AS DOUBLE) AS dcg,
             SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS n_graded
      FROM graded GROUP BY q_vec_id),
    idcg AS (
      SELECT q_vec_id,
             CAST(SUM(CAST(ROUND(CAST({TOP_K + 1} - rk AS DOUBLE)
                                 / LOG2(CAST(rk + 1 AS DOUBLE)), 6)
                           AS DECIMAL(18,6))) AS DOUBLE) AS idcg
      FROM truth GROUP BY q_vec_id)
    SELECT i.q_vec_id,
           CAST(COALESCE(d.n_graded, 0) AS BIGINT) AS n_graded,
           ROUND(COALESCE(d.dcg, 0.0) / i.idcg, 6) AS ndcg
    FROM idcg i LEFT JOIN dcg d ON d.q_vec_id = i.q_vec_id
    """,
    doc=(
        f"ANN ranking quality: NDCG@{TOP_K} of the LSH-bucket ranking vs "
        "brute-force truth (graded 5..1 by true rank) — position-aware, "
        "unlike recall."
    ),
)
def sim_lsh_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@k for the bucketed path — the graded companion to recall@k:
    recall only asks IF the true neighbors were found, NDCG also asks
    WHERE the delivered ranking put them (grade k+1−true_rank, discounted
    by log2(position+1)). A path can score recall 1.0 and still serve a
    shuffled ranking; NDCG catches that.

    Determinism: grades are integers from tie-broken windows; each
    position's contribution is one pinned double division rounded to 6
    then DECIMAL-summed (≤k terms, order-independent); IDCG comes from
    the truth ranking by the same fold. Scale shape mirrors recall@k —
    the truth leg is the sampled-query-set cost, the ANN leg reuses the
    banded candidate join; both rankings end in per-query top-k windows.
    Measured at sf0.01 with the 3×4-bit banding: mean NDCG 0.53 at mean
    recall 0.48 — NDCG sits above recall because the candidates the
    banding does find are reranked by exact cosine, so they land in the
    right order (the single-table predecessor scored 0.00 — no
    candidates at all)."""
    truth = sim_topk_bruteforce(spark, sf_dir).select("q_vec_id", "n_vec_id", "rk")
    cand, emb = _banded_candidates(spark, sf_dir)
    qe = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    ce = emb.select(F.col("vec_id").alias("n_vec_id"), F.col("embedding").alias("n_emb"))
    scored = (
        cand.join(ce, "n_vec_id")
        .join(broadcast(qe), "q_vec_id")
        .select(
            "q_vec_id",
            "n_vec_id",
            F.round(cosine(F.col("q_emb"), F.col("n_emb")), 6).alias("cos"),
        )
    )
    wr = Window.partitionBy("q_vec_id").orderBy(F.col("cos").desc(), "n_vec_id")
    ranked = (
        scored.withColumn("ark", F.row_number().over(wr))
        .filter(F.col("ark") <= TOP_K)
        .select("q_vec_id", "n_vec_id", "ark")
    )
    graded = ranked.join(
        truth.withColumnRenamed("rk", "trk"), ["q_vec_id", "n_vec_id"], "left"
    ).select(
        "q_vec_id",
        F.coalesce(F.lit(TOP_K + 1) - F.col("trk"), F.lit(0)).alias("rel"),
        "ark",
    )
    contrib = F.round(
        F.col("rel").cast("double") / F.log2((F.col("ark") + 1).cast("double")), 6
    )
    dcg = graded.select("q_vec_id", "rel", contrib.alias("c")).groupBy("q_vec_id").agg(
        F.sum(F.col("c").cast("decimal(18,6)")).cast("double").alias("dcg"),
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).alias("n_graded"),
    )
    icontrib = F.round(
        (F.lit(TOP_K + 1) - F.col("rk")).cast("double")
        / F.log2((F.col("rk") + 1).cast("double")),
        6,
    )
    idcg = truth.select("q_vec_id", icontrib.alias("ic")).groupBy("q_vec_id").agg(
        F.sum(F.col("ic").cast("decimal(18,6)")).cast("double").alias("idcg")
    )
    return idcg.join(dcg, "q_vec_id", "left").select(
        "q_vec_id",
        F.coalesce(F.col("n_graded"), F.lit(0)).alias("n_graded"),
        F.round(F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"), 6).alias("ndcg"),
    )


# --- pseudo-relevance feedback (Rocchio) ---------------------------------------

PRF_SEED_K = 3  # neighbors folded into the expanded query


@register(
    "sim_prf_query_expansion",
    f"""
    WITH seed AS (
      SELECT q_vec_id, n_vec_id FROM (
        SELECT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY ROUND({_SQL_COS}, 6) DESC, b.vec_id) AS rk
        FROM embeddings a JOIN embeddings b
          ON a.vec_id < {N_QUERIES} AND b.vec_id >= {N_QUERIES})
      WHERE rk <= {PRF_SEED_K}),
    members AS (
      SELECT vec_id AS q_vec_id, embedding FROM embeddings
      WHERE vec_id < {N_QUERIES}
      UNION ALL
      SELECT s.q_vec_id, e.embedding FROM seed s
      JOIN embeddings e ON e.vec_id = s.n_vec_id),
    mex AS (
      SELECT q_vec_id, generate_subscripts(embedding, 1) AS dim,
             unnest(embedding) AS x
      FROM members),
    expq AS (
      SELECT q_vec_id, dim,
             CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DECIMAL(12,10)) AS e
      FROM mex GROUP BY q_vec_id, dim),
    norme AS (
      SELECT q_vec_id, CAST(SUM(e * e) AS DOUBLE) AS ne
      FROM expq GROUP BY q_vec_id),
    cex AS (
      SELECT vec_id AS n_vec_id, generate_subscripts(embedding, 1) AS dim,
             CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(12,10)) AS x
      FROM embeddings WHERE vec_id >= {N_QUERIES}),
    normc AS (
      SELECT n_vec_id, CAST(SUM(x * x) AS DOUBLE) AS nc
      FROM cex GROUP BY n_vec_id),
    dots AS (
      SELECT q.q_vec_id, c.n_vec_id, CAST(SUM(q.e * c.x) AS DOUBLE) AS dp
      FROM expq q JOIN cex c ON q.dim = c.dim
      GROUP BY q.q_vec_id, c.n_vec_id),
    ranked AS (
      SELECT d.q_vec_id, d.n_vec_id,
             ROUND(d.dp / (SQRT(ne.ne) * SQRT(nc.nc)), 6) AS cos_expanded,
             ROW_NUMBER() OVER (PARTITION BY d.q_vec_id
                                ORDER BY ROUND(d.dp / (SQRT(ne.ne) * SQRT(nc.nc)), 6)
                                           DESC, d.n_vec_id) AS rk
      FROM dots d JOIN norme ne ON ne.q_vec_id = d.q_vec_id
                  JOIN normc nc ON nc.n_vec_id = d.n_vec_id)
    SELECT r.q_vec_id, r.n_vec_id, r.rk, r.cos_expanded,
           (s.n_vec_id IS NOT NULL) AS was_in_seed
    FROM ranked r LEFT JOIN seed s
      ON s.q_vec_id = r.q_vec_id AND s.n_vec_id = r.n_vec_id
    WHERE r.rk <= {TOP_K}
    """,
    doc=(
        f"Pseudo-relevance feedback (Rocchio): fold the top-{PRF_SEED_K} "
        "neighbors into an expanded query centroid, re-rank the corpus "
        f"against it, top-{TOP_K} — the zero-supervision recall booster."
    ),
)
def sim_prf_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rocchio query expansion with uniform weights: the expanded query is
    the exact-decimal mean of the original vector and its top-3 initial
    neighbors, and the corpus is re-ranked against that centroid — the
    classic zero-supervision recall booster (neighbors vote on what the
    query 'meant'). ``was_in_seed`` marks which final hits are new versus
    carried from the seed round.

    Engine notes: scoring runs DIMENSION-EXPLODED — candidate components
    quantized to DECIMAL(12,10) (both engines round the same double bits
    the same way) and the expanded query kept as the exact decimal SUM of
    its members (cosine is scale-invariant, so the unnormalized Rocchio
    sum ranks identically to the mean and skips a lossy double
    round-trip); dot products and norms are exact decimal SUMs, order-
    independent with map-side combine, and the one cosine division is
    pinned. This is the pure-relational formulation of vector scoring —
    the shape a SQL warehouse without array folds would use, and at scale
    it turns the similarity search into ordinary (dim)-keyed join/agg
    traffic. Expanded-query build is a 4-member per-dimension mean on the
    (queries×dim) dimension table."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES)
    rel = F.round(cosine(F.col("q_emb"), F.col("embedding")), 6)
    w0 = Window.partitionBy("q_vec_id").orderBy(F.col("rel").desc(), F.col("n_vec_id"))
    # Q·K-row seed set feeds BOTH the Rocchio members and the final
    # was_in_seed join — checkpoint so the corpus-wide seed scoring pass
    # (cross-join + per-query window) runs once
    seed = cache.checkpoint(
        c.crossJoin(broadcast(q))
        .select("q_vec_id", F.col("vec_id").alias("n_vec_id"), rel.alias("rel"))
        .withColumn("rk", F.row_number().over(w0))
        .filter(F.col("rk") <= PRF_SEED_K)
        .select("q_vec_id", "n_vec_id")
    )
    members = q.select("q_vec_id", F.col("q_emb").alias("embedding")).unionByName(
        seed.join(
            emb.select(F.col("vec_id").alias("n_vec_id"), "embedding"), "n_vec_id"
        ).select("q_vec_id", "embedding")
    )
    mex = members.select("q_vec_id", F.posexplode("embedding").alias("dim0", "x")).select(
        "q_vec_id", (F.col("dim0") + 1).alias("dim"), "x"
    )
    # Q·D-row expanded query feeds its norm AND the dot products —
    # checkpoint so the members build (emb scan + seed join + explode)
    # runs once
    expq = cache.checkpoint(
        mex.groupBy("q_vec_id", "dim").agg(
            F.sum(F.col("x").cast("decimal(20,10)")).cast("decimal(12,10)").alias("e")
        )
    )
    norme = expq.groupBy("q_vec_id").agg(
        F.sum(F.col("e") * F.col("e")).cast("double").alias("ne")
    )
    cex = c.select(
        F.col("vec_id").alias("n_vec_id"), F.posexplode("embedding").alias("dim0", "x0")
    ).select(
        "n_vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.col("x0").cast("double").cast("decimal(12,10)").alias("x"),
    )
    normc = cex.groupBy("n_vec_id").agg(
        F.sum(F.col("x") * F.col("x")).cast("double").alias("nc")
    )
    dots = (
        expq.join(cex, "dim")
        .groupBy("q_vec_id", "n_vec_id")
        .agg(F.sum(F.col("e") * F.col("x")).cast("double").alias("dp"))
    )
    cosx = F.round(F.col("dp") / (F.sqrt(F.col("ne")) * F.sqrt(F.col("nc"))), 6)
    wr = Window.partitionBy("q_vec_id").orderBy(F.col("cos_expanded").desc(), "n_vec_id")
    ranked = (
        dots.join(broadcast(norme), "q_vec_id")
        .join(normc, "n_vec_id")
        .select("q_vec_id", "n_vec_id", cosx.alias("cos_expanded"))
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= TOP_K)
    )
    return ranked.join(
        seed.withColumn("was_in_seed", F.lit(True)), ["q_vec_id", "n_vec_id"], "left"
    ).select(
        "q_vec_id",
        "n_vec_id",
        "rk",
        "cos_expanded",
        F.coalesce(F.col("was_in_seed"), F.lit(False)).alias("was_in_seed"),
    )


# --- 1-bit binary quantization -------------------------------------------------


def _sql_bq_half(lo_bit: int) -> str:
    """Pack embedding sign bits [lo_bit, lo_bit+32) into a BIGINT."""
    return (
        f"list_aggregate(list_transform(generate_series(0, 31), "
        f"j -> CASE WHEN embedding[j + {lo_bit} + 1] > 0 "
        f"THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END), 'sum')"
    )


@register(
    "sim_bq_hamming_topk",
    f"""
    WITH packed AS (
      SELECT vec_id,
             {_sql_bq_half(0)} AS lo,
             {_sql_bq_half(32)} AS hi
      FROM embeddings),
    truth AS (
      SELECT q_vec_id, n_vec_id FROM (
        SELECT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY ROUND({_SQL_COS}, 6) DESC, b.vec_id) AS rk
        FROM embeddings a JOIN embeddings b
          ON a.vec_id < {N_QUERIES} AND b.vec_id >= {N_QUERIES})
      WHERE rk <= {TOP_K}),
    ranked AS (
      SELECT q_vec_id, n_vec_id, hamming, rk FROM (
        SELECT a.vec_id AS q_vec_id, b.vec_id AS n_vec_id,
               CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
                    AS INT) AS hamming,
               ROW_NUMBER() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)),
                          b.vec_id) AS rk
        FROM packed a JOIN packed b
          ON a.vec_id < {N_QUERIES} AND b.vec_id >= {N_QUERIES})
      WHERE rk <= {TOP_K})
    SELECT r.q_vec_id, r.n_vec_id, r.hamming, r.rk,
           (t.n_vec_id IS NOT NULL) AS in_exact_topk
    FROM ranked r LEFT JOIN truth t
      ON t.q_vec_id = r.q_vec_id AND t.n_vec_id = r.n_vec_id
    """,
    doc=(
        f"1-bit binary quantization: 64-dim float32 packed into two BIGINTs "
        f"(32× less memory/IO), Hamming-distance top-{TOP_K} with an "
        "in-exact-topk flag per hit — the most aggressive point on the "
        "quantization curve next to SQ-int8 and PQ."
    ),
)
def sim_bq_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit quantization, the extreme end of the compression ladder
    this engine already walks (float32 → SQ-int8 → PQ codes → 1 bit):
    each vector becomes 8 bytes, distance becomes two XOR+popcounts, and
    for angular similarity E[hamming] is monotone in the true angle
    (the SimHash identity: P[sign differs] = θ/π) — so Hamming ranking
    approximates cosine ranking at 32× less memory traffic. The
    ``in_exact_topk`` flag makes each hit's quality visible next to the
    recall gates of the other quantizers (measured at sf0.01: 0.24 —
    between PQ's 0.26 and the raw-LSH floor, consistent with 1 bit/dim
    on near-isotropic vectors; the standard remedy is BQ-shortlist →
    exact rerank, the sim_pq_rerank_topk pattern).

    Engine notes: packing is a per-row JVM fold (transform-with-index →
    integer sum — exact, order-free); two 32-bit halves per vector dodge
    the int64 sign bit in both engines. The scan side of the join carries
    16 bytes per vector — at 100 TB of embeddings the Hamming pass reads
    ~3 TB, which is the whole point."""
    emb = load_table(spark, sf_dir, "embeddings")

    def half(lo_bit: int) -> Column:
        sliced = F.slice(F.col("embedding"), lo_bit + 1, 32)
        bits = F.transform(
            sliced,
            # shiftleft needs a literal shift amount; 2.0**i is exact in
            # double for i < 32, so pow→long equals (1 << i) bit-for-bit
            lambda x, i: F.when(
                x > 0, F.pow(F.lit(2.0), i).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        )
        return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)

    packed = emb.select("vec_id", half(0).alias("lo"), half(32).alias("hi"))
    a = packed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("lo").alias("qlo"),
        F.col("hi").alias("qhi"),
    )
    b = packed.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("n_vec_id"), "lo", "hi"
    )
    ham = (
        F.bit_count(F.col("qlo").bitwiseXOR(F.col("lo")))
        + F.bit_count(F.col("qhi").bitwiseXOR(F.col("hi")))
    ).cast("int")
    w = Window.partitionBy("q_vec_id").orderBy("hamming", "n_vec_id")
    ranked = (
        b.crossJoin(broadcast(a))
        .select("q_vec_id", "n_vec_id", ham.alias("hamming"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )
    truth = sim_topk_bruteforce(spark, sf_dir).select(
        "q_vec_id", "n_vec_id", F.lit(True).alias("in_exact_topk")
    )
    return ranked.join(truth, ["q_vec_id", "n_vec_id"], "left").select(
        "q_vec_id",
        "n_vec_id",
        "hamming",
        "rk",
        F.coalesce(F.col("in_exact_topk"), F.lit(False)).alias("in_exact_topk"),
    )


# --- out-of-distribution scoring ----------------------------------------------


@register(
    "sim_ood_mahalanobis_diag",
    f"""
    WITH ex AS (
      SELECT label, generate_subscripts(embedding, 1) AS dim,
             CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(12,10)) AS x
      FROM embeddings WHERE vec_id >= {N_QUERIES}),
    sums AS (
      SELECT label, dim, COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(x * x) AS DOUBLE) AS sxx
      FROM ex GROUP BY label, dim),
    stats AS (
      SELECT label, dim, sx / n AS mu,
             sxx / n - (sx / n) * (sx / n) AS var
      FROM sums),
    q AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings WHERE vec_id < {N_QUERIES}),
    terms AS (
      SELECT q.vec_id, s.label,
             ROUND((q.x - s.mu) * (q.x - s.mu) / (s.var + 1e-6), 6) AS t
      FROM q JOIN stats s ON s.dim = q.dim),
    md AS (
      SELECT vec_id, label,
             CAST(SUM(CAST(t AS DECIMAL(18,6))) AS DOUBLE) AS md2
      FROM terms GROUP BY vec_id, label),
    ranked AS (
      SELECT vec_id, label, md2,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY md2, label) AS rn,
             MAX(md2) OVER (PARTITION BY vec_id) AS md2_max
      FROM md)
    SELECT vec_id, label AS nearest_label,
           ROUND(md2, 4) AS md2_min, ROUND(md2_max, 4) AS md2_max
    FROM ranked WHERE rn = 1
    """,
    doc=(
        "Out-of-distribution scoring: diagonal Mahalanobis distance to "
        "each class's (mean, variance) profile; min over classes is the "
        "OOD score, argmin the nearest class — the embedding-drift and "
        "outlier gate in front of a training mix."
    ),
)
def sim_ood_mahalanobis_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic OOD detector (Lee et al. 2018, diagonal form): model
    each class as an axis-aligned Gaussian over embedding dimensions;
    a query's score is its minimum Mahalanobis distance across classes —
    far from EVERY class means out-of-distribution, and the gap between
    md2_min and md2_max shows how decisively a class claims the point.
    In a data pipeline this gates new batches: a drifting source's
    min-distance distribution shifts before downstream metrics do.

    Engine notes: class stats come from exact DECIMAL sums (Σx, Σx² per
    (label, dim)) with mean/variance as pinned double expressions;
    per-dimension distance terms are rounded-6 then DECIMAL-summed, so
    the 64-term fold is order-independent (the PRF discipline). Scale
    shape: stats = one (label, dim)-keyed rollup (K·dim rows, map-side
    combined); scoring joins queries to the broadcast stats on dim —
    |Q|·K·dim narrow rows, then a (vec, label) rollup."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        "label", F.posexplode("embedding").alias("dim0", "x0")
    ).select(
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.col("x0").cast("double").cast("decimal(12,10)").alias("x"),
    )
    sums = ex.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    mu = F.col("sx") / F.col("n")
    stats = sums.select(
        "label", "dim", mu.alias("mu"), (F.col("sxx") / F.col("n") - mu * mu).alias("var")
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        "vec_id", F.posexplode("embedding").alias("dim0", "x0")
    ).select("vec_id", (F.col("dim0") + 1).alias("dim"), F.col("x0").cast("double").alias("x"))
    terms = q.join(broadcast(stats), "dim").select(
        "vec_id",
        "label",
        F.round(
            (F.col("x") - F.col("mu")) * (F.col("x") - F.col("mu"))
            / (F.col("var") + F.lit(1e-6)),
            6,
        ).alias("t"),
    )
    md = terms.groupBy("vec_id", "label").agg(
        F.sum(F.col("t").cast("decimal(18,6)")).cast("double").alias("md2")
    )
    wv = Window.partitionBy("vec_id")
    ranked = md.select(
        "vec_id",
        "label",
        "md2",
        F.row_number().over(wv.orderBy("md2", "label")).alias("rn"),
        F.max("md2").over(wv).alias("md2_max"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "vec_id",
        F.col("label").alias("nearest_label"),
        F.round(F.col("md2"), 4).alias("md2_min"),
        F.round(F.col("md2_max"), 4).alias("md2_max"),
    )


@register(
    "sim_ivfpq_adc_topk",
    f"""
    WITH sub AS (
      SELECT vec_id, label, g.s,
             embedding[g.s * {_PQ_D} + 1 : g.s * {_PQ_D} + {_PQ_D}] AS subv
      FROM embeddings,
           (SELECT unnest(generate_series(0, {PQ_M - 1})) AS s) g),
    spx AS (SELECT label, s, unnest(subv) AS x,
                   generate_subscripts(subv, 1) AS i
            FROM sub),
    cb AS (SELECT label, s, i,
                  CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS v
           FROM spx GROUP BY label, s, i),
    cbv AS (SELECT label, s, list(v ORDER BY i) AS cvec FROM cb GROUP BY label, s),
    codes AS (
      SELECT vec_id, mlabel, s, cvec FROM (
        SELECT sub.vec_id, sub.label AS mlabel, sub.s, cbv.label, cbv.cvec,
               ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
                 ORDER BY list_aggregate(list_transform(
                   list_zip(sub.subv, cbv.cvec),
                   p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                        * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
                   'sum'), cbv.label) AS rn
        FROM sub JOIN cbv ON cbv.s = sub.s) WHERE rn = 1),
    ex AS (SELECT label, unnest(embedding) AS x,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings),
    cent AS (SELECT label, i,
                    CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS v
             FROM ex GROUP BY label, i),
    coarse AS (SELECT label, list(v ORDER BY i) AS cvec FROM cent GROUP BY label),
    q AS (SELECT vec_id AS q_vec_id, embedding AS q_emb FROM embeddings
          WHERE vec_id < {N_QUERIES}),
    qc AS (SELECT q_vec_id, label,
                  ROW_NUMBER() OVER (PARTITION BY q_vec_id
                                     ORDER BY {_SQL_COS_QC} DESC, label) AS rn
           FROM q CROSS JOIN coarse),
    best AS (SELECT q_vec_id, label AS probe_label FROM qc WHERE rn = 1),
    qsub AS (SELECT vec_id AS q_vec_id, s, subv AS q_sub FROM sub
             WHERE vec_id < {N_QUERIES}),
    qn AS (SELECT vec_id AS q_vec_id,
                  SQRT(list_aggregate(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS q_norm
           FROM embeddings WHERE vec_id < {N_QUERIES}),
    parts AS (
      SELECT qsub.q_vec_id, best.probe_label, c.vec_id AS n_vec_id, qsub.s,
             list_aggregate(list_transform(list_zip(qsub.q_sub, c.cvec),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') AS dotp,
             list_aggregate(list_transform(list_zip(c.cvec, c.cvec),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') AS np
      FROM qsub
      JOIN best ON best.q_vec_id = qsub.q_vec_id
      JOIN codes c ON c.s = qsub.s AND c.mlabel = best.probe_label
                   AND c.vec_id <> qsub.q_vec_id),
    folded AS (
      SELECT q_vec_id, probe_label, n_vec_id,
             list_aggregate(list(dotp ORDER BY s), 'sum') AS adc_dot,
             list_aggregate(list(np ORDER BY s), 'sum') AS rnorm2
      FROM parts GROUP BY q_vec_id, probe_label, n_vec_id),
    scored AS (
      SELECT f.q_vec_id, f.probe_label, f.n_vec_id,
             ROUND(f.adc_dot / (qn.q_norm * SQRT(f.rnorm2)), 6) AS adc_score
      FROM folded f JOIN qn ON qn.q_vec_id = f.q_vec_id)
    SELECT q_vec_id, probe_label, n_vec_id, adc_score, rk FROM (
      SELECT q_vec_id, probe_label, n_vec_id, adc_score,
             ROW_NUMBER() OVER (PARTITION BY q_vec_id
                                ORDER BY adc_score DESC, n_vec_id) AS rk
      FROM scored) WHERE rk <= {TOP_K}
    """,
    doc=(
        "IVF+PQ compound ANN (the FAISS IVFADC architecture): coarse-probe "
        "ONE centroid cell, then ADC-score only that cell's PQ codes — "
        "candidate count divides by n_cells AND bytes-per-candidate "
        "divides by dim·4/M, multiplicatively."
    ),
)
def sim_ivfpq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compound index every production vector store runs: IVF routing
    and PQ compression compose multiplicatively. The standalone IVF face
    reads full vectors inside the probed cell; the standalone PQ face
    ADC-scores every code in the corpus; this face does neither — per
    query it touches |C|/n_cells candidates × M bytes each, which is the
    only read budget that survives a 100 TB embedding corpus.

    Determinism is inherited unchanged from the two parents: exact-decimal
    codebooks/centroids, order-pinned fold for every distance, rounded
    score, unique tie-breaks. (Production IVFPQ trains PQ on RESIDUALS
    q − centroid; with per-label codebooks this corpus's residual step is
    a subtraction away and doesn't change any plan shape.)

    Scale shape: the PQ codebook packs into ONE broadcast row (code
    assignment is an in-row argmin — no exchange), the coarse centroids
    are the per-subspace centroids CONCATENATED (same exact-decimal
    coordinate means over the same groups, so bit-identical doubles —
    the second full-corpus explode the coarse layer used to pay is gone),
    and ADC partials come from broadcast per-query lookup tables keyed by
    (s, code). The scoring join carries the cell filter
    ``mlabel = probe_label`` so the scored row count per query is cell
    occupancy, not corpus size; the only wide exchange is the final
    top-k window."""
    emb = load_table(spark, sf_dir, "embeddings")
    subs = emb.select(
        "vec_id",
        "label",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("s"),
        "embedding",
    ).select(
        "vec_id",
        "label",
        "s",
        F.expr(f"slice(embedding, s * {_PQ_D} + 1, {_PQ_D})").alias("subv"),
    )
    spx = subs.select("label", "s", F.posexplode("subv").alias("i", "x"))
    cb = spx.groupBy("label", "s", "i").agg(
        (
            F.sum(F.col("x").cast("decimal(20,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("v")
    )
    cbv = cache.checkpoint(
        cb.groupBy("label", "s")
        .agg(F.array_sort(F.collect_list(F.struct("i", "v"))).alias("iv"))
        .select("label", "s", F.transform("iv", lambda e: e["v"]).alias("cvec"))
    )  # |labels|·M rows; feeds the pack AND the coarse layer
    pack = cache.checkpoint(_pq_centroid_pack(cbv, "label"))
    win = (
        emb.select("vec_id", F.col("label").alias("mlabel"), "embedding")
        .crossJoin(broadcast(pack))
        .select("vec_id", "mlabel", _pq_winner_array().alias("w"))
    )
    # coarse quantizer: full-dim per-label centroids. Coordinate i of the
    # coarse centroid and coordinate i mod D of subspace i div D average
    # the SAME value multiset with the SAME decimal formula — so the
    # coarse vector is the s-ordered concatenation of the PQ centroids,
    # no second corpus pass needed.
    coarse = (
        cbv.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("s", "cvec"))).alias("sc"))
        .select("label", F.flatten(F.transform("sc", lambda e: e["cvec"])).alias("cvec"))
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    w_c = Window.partitionBy("q_vec_id").orderBy(
        cosine(F.col("q_emb"), F.col("cvec")).desc(), F.col("label")
    )
    best = (
        q.crossJoin(broadcast(coarse))
        .withColumn("rn", F.row_number().over(w_c))
        .filter(F.col("rn") == 1)
        .select("q_vec_id", F.col("label").alias("probe_label"))
    )
    rscored = win.select(
        "vec_id",
        "mlabel",
        F.transform("w", lambda x: x["j"]).alias("codes"),
        _fold_sum(F.transform("w", lambda x: dot(x["cvec"], x["cvec"]))).alias("rnorm2"),
    )
    qpack = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .crossJoin(broadcast(pack))
        .select(
            F.col("vec_id").alias("q_vec_id"),
            _pq_query_dps().alias("dps"),
            F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("q_norm"),
        )
        .join(broadcast(best), on="q_vec_id")
    )
    scored = rscored.join(
        broadcast(qpack),
        (F.col("mlabel") == F.col("probe_label"))
        & (F.col("vec_id") != F.col("q_vec_id")),
    ).select(
        "q_vec_id",
        "probe_label",
        F.col("vec_id").alias("n_vec_id"),
        F.round(
            _adc_lookup_fold("dps") / (F.col("q_norm") * F.sqrt(F.col("rnorm2"))), 6
        ).alias("adc_score"),
    )
    w_rank = Window.partitionBy("q_vec_id").orderBy(
        F.col("adc_score").desc(), F.col("n_vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= TOP_K)
        .select("q_vec_id", "probe_label", "n_vec_id", "adc_score", "rk")
    )


def ivfpq_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Extend the materialized IVF index (``ivf_index_dir``) with the PQ
    layer a production IVFADC deployment serves from: ``pq_codes``
    parquet PARTITIONED BY cell holding (vec_id, s, code) — M small ints
    per vector, the compressed posting lists — and ``pq_codebook``
    (code, s, cvec), the tiny decode table a prober broadcasts. Built
    once per (session, corpus) behind its own marker; the coarse layer is
    reused from the IVF build, so the two probes amortize ONE quantizer.

    This is the round-10 companion to the r9 boundary measurement: the
    IVF index probe showed the serving posture (probe-only α ≈ 0.36);
    the PQ layer multiplies it — bytes-per-candidate drops from dim·8 to
    M codes + one broadcast codebook, which is the only read budget that
    survives a 100 TB embedding corpus."""
    import os

    path = ivf_index_dir(spark, sf_dir)  # ensures coarse layer exists
    marker = os.path.join(path, "_SUCCESS_PQ")
    if os.path.exists(marker):
        return path
    emb = load_table(spark, sf_dir, "embeddings")
    subs = emb.select(
        "vec_id",
        "label",
        F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("s"),
        F.col("embedding"),
    ).select(
        "vec_id",
        "label",
        "s",
        F.expr(f"slice(embedding, s * {_PQ_D} + 1, {_PQ_D})").alias("subv"),
    )
    # per-(label, s) codebook — identical construction to the
    # sim_ivfpq_adc_topk face (exact-decimal subvector means)
    spx = subs.select("label", "s", F.posexplode("subv").alias("i", "x"))
    cb = spx.groupBy("label", "s", "i").agg(
        (
            F.sum(F.col("x").cast("decimal(20,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("v")
    )
    cbv = (
        cb.groupBy("label", "s")
        .agg(F.array_sort(F.collect_list(F.struct("i", "v"))).alias("iv"))
        .select(
            F.col("label").alias("code"),
            "s",
            F.transform("iv", lambda e: e["v"]).alias("cvec"),
        )
    )
    d2 = _fold_sum(
        F.zip_with(
            F.col("subv"),
            F.col("cvec"),
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        )
    )
    w_code = Window.partitionBy("vec_id", "s").orderBy(F.col("d2").asc(), F.col("code"))
    codes = (
        subs.join(broadcast(cbv), on="s")
        .withColumn("d2", d2)
        .withColumn("rn", F.row_number().over(w_code))
        .filter(F.col("rn") == 1)
        .select("vec_id", "s", "code")
    )
    cell_of = spark.read.parquet(os.path.join(path, "members")).select(
        "vec_id", F.col("cell").cast("int").alias("cell")
    )
    codes.join(cell_of, on="vec_id").write.partitionBy("cell").mode(
        "overwrite"
    ).parquet(os.path.join(path, "pq_codes"))
    cbv.write.mode("overwrite").parquet(os.path.join(path, "pq_codebook"))
    with open(marker, "w"):
        pass
    return path


def _ivfpq_adc_oracle() -> str:
    """The index-served ADC probe answers EXACTLY sim_ivfpq_adc_topk's
    question — reuse its oracle verbatim so drift between the rebuilt and
    materialized postures is a driver-hash mismatch."""
    from trike_spark.registry import REGISTRY

    return REGISTRY["sim_ivfpq_adc_topk"].oracle


@register(
    "sim_ivfpq_index_adc",
    _ivfpq_adc_oracle(),
    doc=(
        "IVFADC probe against the MATERIALIZED index: cell-partitioned PQ "
        "code parquet + a broadcast codebook — the probe reads only the "
        "probed cell's code files (dynamic partition pruning) and decodes "
        "them through the (n_codes x M)-row codebook, so per-query bytes "
        "are cell-occupancy x M codes instead of full vectors. Results "
        "identical to sim_ivfpq_adc_topk (same oracle)."
    ),
)
def sim_ivfpq_index_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving shape of ``sim_ivfpq_adc_topk``: quantizer + code
    assignment are a TABLE built once (``ivfpq_index_dir``), the probe is
    (1) broadcast best-cell selection against the materialized centroids,
    (2) a partition-pruned scan of that cell's PQ codes, (3) a broadcast
    codebook decode + the same order-pinned ADC fold. At s=1 (every
    correctness SF) cell == label and the codebook is the per-label
    subvector-mean table, so the parent face's oracle certifies the whole
    round-trip through the index layout — a dropped code row, a partition
    type drift, or a codebook mis-join all break the driver hash.

    Scale: per query the scan reads 1 of ~√n cell directories (DPP
    asserted in tests/test_plan_shape.py), each row M ints wide; the
    codebook broadcast is O(n_cells · M · dim/M · 8) = O(n_cells · dim)
    bytes — the FAISS IVFADC memory budget."""
    import os

    path = ivfpq_index_dir(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    cells = spark.read.parquet(os.path.join(path, "cells"))
    codebook = spark.read.parquet(os.path.join(path, "pq_codebook"))
    codes = spark.read.parquet(os.path.join(path, "pq_codes")).select(
        F.col("vec_id").alias("n_vec_id"),
        "s",
        "code",
        F.col("cell").cast("int").alias("cell"),
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_emb")
    )
    w_c = Window.partitionBy("q_vec_id").orderBy(
        cosine(F.col("q_emb"), F.col("cvec")).desc(), F.col("cell")
    )
    best = (
        q.crossJoin(broadcast(cells))
        .withColumn("rn", F.row_number().over(w_c))
        .filter(F.col("rn") == 1)
        .select("q_vec_id", F.col("cell").alias("probe_label"))
    )
    qsub = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"),
        F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("qs"),
        "embedding",
    ).select(
        "q_vec_id",
        "qs",
        F.expr(f"slice(embedding, qs * {_PQ_D} + 1, {_PQ_D})").alias("q_sub"),
    )
    qn = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"),
        F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("q_norm"),
    )
    probe = qsub.join(broadcast(best), on="q_vec_id")
    cb = codebook.select(
        F.col("code").alias("cb_code"),
        F.col("s").alias("cb_s"),
        F.col("cvec"),
    )
    parts = (
        codes.join(
            broadcast(probe),
            (F.col("s") == F.col("qs"))
            & (F.col("cell") == F.col("probe_label"))
            & (F.col("n_vec_id") != F.col("q_vec_id")),
        )
        .join(
            broadcast(cb),
            (F.col("cb_s") == F.col("s")) & (F.col("cb_code") == F.col("code")),
        )
        .select(
            "q_vec_id",
            "probe_label",
            "n_vec_id",
            "s",
            dot(F.col("q_sub"), F.col("cvec")).alias("dotp"),
            dot(F.col("cvec"), F.col("cvec")).alias("np"),
        )
    )
    folded = (
        parts.groupBy("q_vec_id", "probe_label", "n_vec_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("s", "dotp"))).alias("dps"),
            F.array_sort(F.collect_list(F.struct("s", "np"))).alias("nps"),
        )
        .select(
            "q_vec_id",
            "probe_label",
            "n_vec_id",
            _fold_sum(F.transform("dps", lambda e: e["dotp"])).alias("adc_dot"),
            _fold_sum(F.transform("nps", lambda e: e["np"])).alias("rnorm2"),
        )
    )
    scored = folded.join(broadcast(qn), on="q_vec_id").select(
        "q_vec_id",
        "probe_label",
        "n_vec_id",
        F.round(
            F.col("adc_dot") / (F.col("q_norm") * F.sqrt(F.col("rnorm2"))), 6
        ).alias("adc_score"),
    )
    w_rank = Window.partitionBy("q_vec_id").orderBy(
        F.col("adc_score").desc(), F.col("n_vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= TOP_K)
        .select("q_vec_id", "probe_label", "n_vec_id", "adc_score", "rk")
    )


# --- mutual-NN bitext-style mining (margin criterion) --------------------------------

BITEXT_CAP = 500  # bound the candidate grid at every SF
BITEXT_K = 4  # margin denominator: mean cosine of the top-K neighbors


def _sql_margin_side(side: str, other: str) -> str:
    """Per-{side} ranking of {other} candidates with the margin score."""
    return f"""
    r_{side} AS (
      SELECT {side}.vec_id AS src, {other}.vec_id AS dst,
             ROUND({{cos}}, 6) AS c,
             ROW_NUMBER() OVER (PARTITION BY {side}.vec_id
                                ORDER BY ROUND({{cos}}, 6) DESC,
                                         {other}.vec_id) AS rn
      FROM {side} CROSS JOIN {other}),
    m_{side} AS (
      SELECT src, dst, c, rn,
             CAST(SUM(CAST(c AS DECIMAL(9,6))) OVER (PARTITION BY src)
                  AS DOUBLE) / {BITEXT_K} AS topk_avg
      FROM r_{side} WHERE rn <= {BITEXT_K}),
    best_{side} AS (
      SELECT src, dst, c,
             FLOOR(c / topk_avg * 1000000) / 1000000.0 AS margin
      FROM m_{side} WHERE rn = 1)
    """.replace(
        "{cos}",
        f"list_aggregate(list_transform(list_zip({side}.embedding, "
        f"{other}.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS "
        f"DOUBLE)), 'sum') / (SQRT(list_aggregate(list_transform("
        f"{side}.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        f"'sum')) * SQRT(list_aggregate(list_transform({other}.embedding, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))",
    )


@register(
    "sim_mutual_nn_margin_pairs",
    f"""
    WITH x AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id < {BITEXT_CAP} AND vec_id % 2 = 0),
    y AS (SELECT vec_id, embedding FROM embeddings
          WHERE vec_id < {BITEXT_CAP} AND vec_id % 2 = 1),
    {_sql_margin_side('x', 'y')},
    {_sql_margin_side('y', 'x')}
    SELECT bx.src AS x_id, bx.dst AS y_id, bx.c AS cosine,
           FLOOR((bx.margin + by.margin) / 2.0 * 1000000) / 1000000.0 AS margin
    FROM best_x bx
    JOIN best_y by ON by.src = bx.dst AND by.dst = bx.src
    """,
    doc=(
        "Bitext-style mutual-NN mining (margin criterion): each side's "
        f"1-NN across the parity split, margin = cos / mean(top-{BITEXT_K} "
        "cos), pairs kept only when BOTH directions agree — the "
        "parallel-corpus mining primitive."
    ),
)
def sim_mutual_nn_margin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The parallel-data mining shape (Artetxe & Schwenk's margin-based
    bitext mining, the method behind the big public translation corpora):
    embed both languages in one space, take cross-lingual nearest
    neighbors, score by the MARGIN — cosine relative to the mean of the
    top-k neighborhood, which cancels hubness (a vector close to
    everything gets margin ≈ 1 and drops) — and keep a pair only when
    the match is MUTUAL. The parity split on vec_id stands in for the
    two languages; the plan is identical with a real second embedding
    table.

    Determinism: cosines round to 6 dp BEFORE ranking (ULP-safe order,
    id tie-break); the top-k mean is a running AVG over the rank-ordered
    frame (frame-order accumulation, the running-total contract); the
    mutual join is exact on ids.

    Scale shape: at production scale both 1-NN legs route through the
    audited ANN indexes (LSH buckets / IVF cells) instead of the capped
    brute grid — margin and mutuality are post-processing on candidate
    sets either way; the mutual filter is one self-join of two
    |side|-row best-match tables."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < BITEXT_CAP
    )
    x = emb.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("x_id"), F.col("embedding").alias("x_emb")
    )
    y = emb.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("y_id"), F.col("embedding").alias("y_emb")
    )

    def best_side(a: DataFrame, b: DataFrame, a_id: str, b_id: str, a_emb: str, b_emb: str) -> DataFrame:
        c = F.round(cosine(F.col(a_emb), F.col(b_emb)), 6)
        ranked = a.crossJoin(broadcast(b)).select(
            F.col(a_id).alias("src"), F.col(b_id).alias("dst"), c.alias("c")
        )
        w = Window.partitionBy("src").orderBy(F.col("c").desc(), "dst")
        ranked = ranked.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= BITEXT_K
        )
        # exact decimal sum of the (already 6-dp-rounded) top-K cosines:
        # order-free, so the margin denominator hash-matches cross-engine
        wk = Window.partitionBy("src")
        ranked = ranked.withColumn(
            "topk_avg",
            F.sum(F.col("c").cast("decimal(9,6)")).over(wk).cast("double")
            / BITEXT_K,
        )
        return ranked.filter(F.col("rn") == 1).select(
            "src",
            "dst",
            "c",
            # FLOOR quantization: no round-half tie to break, so identical
            # doubles quantize identically in both engines
            (F.floor(F.col("c") / F.col("topk_avg") * 1000000) / 1e6).alias(
                "margin"
            ),
        )

    bx = best_side(x, y, "x_id", "y_id", "x_emb", "y_emb")
    by = best_side(y, x, "y_id", "x_id", "y_emb", "x_emb").select(
        F.col("src").alias("y_src"),
        F.col("dst").alias("y_dst"),
        F.col("margin").alias("y_margin"),
    )
    return bx.join(
        by, (by.y_src == bx.dst) & (by.y_dst == bx.src)
    ).select(
        F.col("src").alias("x_id"),
        F.col("dst").alias("y_id"),
        F.col("c").alias("cosine"),
        (F.floor((F.col("margin") + F.col("y_margin")) / 2.0 * 1000000) / 1e6).alias("margin"),
    )


# --- metadata-filtered ANN: pre-filter vs post-filter ------------------------------

FILT_LABEL = 3  # ~10% selectivity in the synthetic label distribution
FILT_TOP_K = 10
FILT_SHORTLIST = 25  # the unfiltered ANN shortlist the post-filter leg prunes


@register(
    "sim_filtered_topk",
    f"""
    WITH scored AS (
      SELECT b.vec_id, b.label, ROUND({_SQL_COS}, 6) AS cosine
      FROM (SELECT * FROM embeddings WHERE vec_id = 0) a
      JOIN embeddings b ON b.vec_id <> 0),
    pre AS (
      SELECT vec_id, cosine,
             ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS rk
      FROM scored WHERE label = {FILT_LABEL}),
    post AS (
      SELECT vec_id FROM (
        SELECT vec_id, label,
               ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS prk
        FROM scored)
      WHERE prk <= {FILT_SHORTLIST} AND label = {FILT_LABEL})
    SELECT pre.rk, pre.vec_id, pre.cosine,
           CAST(CASE WHEN post.vec_id IS NULL THEN 0 ELSE 1 END AS INT)
             AS in_postfilter
    FROM pre LEFT JOIN post ON post.vec_id = pre.vec_id
    WHERE pre.rk <= {FILT_TOP_K}
    """,
    doc=(
        f"Metadata-filtered ANN: exact top-{FILT_TOP_K} under label = "
        f"{FILT_LABEL} (predicate pushed into the scan) vs filtering an "
        f"unfiltered top-{FILT_SHORTLIST} shortlist after the fact — the "
        "in_postfilter flags show exactly which true neighbors "
        "post-filtering loses."
    ),
)
def sim_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN question nobody benchmarks until it bites:
    'nearest neighbors WHERE lang = en'. Two execution strategies exist
    and they are NOT equivalent. PRE-filtering pushes the predicate into
    the scan/index and ranks only qualifying vectors — exact under the
    filter, and with ~10 % selectivity it reads 10 % of the corpus
    (PushedFilters on the label column, plan-visible). POST-filtering
    takes the unfiltered shortlist an ANN index returns and filters it —
    cheap, but a selective filter decimates the shortlist: of the top-10
    true label-3 neighbors, only the few that also crack the GLOBAL
    top-25 survive, and the ``in_postfilter`` flag column shows exactly
    which (the rest are the recall the post-filter strategy silently
    loses). This face is the measure-before-you-choose gate for the
    filtered-search strategy, the same discipline as the recall@k gates
    on every approximate index in this family.

    Determinism: cosines rounded to 6 dp before ranking with vec_id
    tie-breaks (ULP rule); both legs are TakeOrdered pools, so the only
    rank windows run over ≤{FILT_SHORTLIST}-row bounded sets.

    Scale shape: both legs are one broadcast of the query vector + a
    TakeOrderedAndProject (per-partition heads, no global sort); the
    pre-filter leg's label predicate reaches the parquet scan. At 100 TB
    with an IVF/PQ index the same trade appears as filtered-posting-list
    traversal vs shortlist re-filtering — the flags here price it."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    cos = F.round(cosine(F.col("q_emb"), F.col("embedding")), 6)

    def scored(df):
        return (
            df.crossJoin(broadcast(q))
            .select("vec_id", "label", cos.alias("cosine"))
        )

    base = emb.filter(F.col("vec_id") != 0)
    w = Window.orderBy(F.col("cosine").desc(), F.col("vec_id"))
    pre = (
        scored(base.filter(F.col("label") == FILT_LABEL))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(FILT_TOP_K)
        .select(F.row_number().over(w).alias("rk"), "vec_id", "cosine")
    )
    post = (
        scored(base)
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(FILT_SHORTLIST)
        .filter(F.col("label") == FILT_LABEL)
        .select(F.col("vec_id").alias("post_id"))
    )
    return (
        pre.join(broadcast(post), pre.vec_id == F.col("post_id"), "left")
        .select(
            "rk",
            "vec_id",
            "cosine",
            F.col("post_id").isNotNull().cast("int").alias("in_postfilter"),
        )
    )
