"""Scan-format faces: CSV and JSON-lines round-trips surfaced as
driver-checkable queries (SURVEY.md §2.1 "+ CSV / JSON sources & sinks";
previously only pytest-covered via tests/test_io_formats.py).

Each query WRITES the table through the format under test, reads it back
with an explicit schema, and aggregates — so the driver's value-hash
proves the codec round-trips values bit-for-bit, not merely that a file
appeared. The oracle aggregates the original parquet: any encode/decode
drift (quoting, number formatting, type coercion) breaks the hash.

Scale notes: both formats are line-splittable, so reads parallelize per
HDFS block like parquet (minus pushdown/pruning — the docstrings are the
place users learn CSV scans re-read everything). Schemas are explicit:
inference would cost a full extra pass over 100 TB.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trike_spark.io import load_table
from trike_spark.queries._util import dsum, sql_dsum
from trike_spark.registry import register

# Lossless CSV codec contract, applied to BOTH write and read: Spark's
# writer defaults trim whitespace and its reader maps bare empty fields to
# null — any document text with leading/trailing spaces, embedded newlines
# (multiLine), or empty-vs-null distinction (nullValue sentinel vs quoted
# empty) would silently diverge from the oracle reading the original
# parquet. FAILFAST so a codec gap surfaces as an error, not a hash drift.
_CSV_WRITE_OPTS = {
    "header": "true",
    "quote": '"',
    "escape": '"',
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
    "nullValue": "\\N",
    "emptyValue": '""',
}
_CSV_READ_OPTS = {
    "header": "true",
    "quote": '"',
    "escape": '"',
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
    "nullValue": "\\N",
    "emptyValue": "",
    "multiLine": "true",
    "mode": "FAILFAST",
}


def _scan_tmp(spark: SparkSession, face: str) -> str:
    """Deterministic per-session scratch dir (overwritten on every call):
    round 2 used a fresh mkdtemp per invocation, which leaked a full table
    copy per bench/correctness run. One path per (session, face), written
    with mode=overwrite, bounds disk at one copy."""
    return os.path.join(
        tempfile.gettempdir(),
        f"trike_scan_{spark.sparkContext.applicationId}",
        face,
    )


@register(
    "scan_csv_roundtrip_documents",
    f"""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM documents GROUP BY lang
    """,
    doc="CSV scan face: documents → CSV → read with explicit schema → per-lang stats.",
)
def scan_csv_roundtrip_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang", "n_chars")
    path = _scan_tmp(spark, "csv_documents")
    d.write.mode("overwrite").options(**_CSV_WRITE_OPTS).csv(path)
    back = (
        spark.read.schema("doc_id bigint, text string, lang string, n_chars bigint")
        .options(**_CSV_READ_OPTS)
        .csv(path)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("total_tokens"),
    )


@register(
    "scan_json_roundtrip_events",
    f"""
    SELECT event_type, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           {sql_dsum('value')} AS total_value
    FROM events GROUP BY event_type
    """,
    doc="JSON-lines scan face: events → JSON → read with explicit schema → per-type stats.",
)
def scan_json_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubles survive the JSON round-trip because Spark writes them with
    round-trip precision (shortest string that parses back to the same
    IEEE value); the decimal-exact sum then matches the oracle run on the
    original parquet bit-for-bit."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    path = _scan_tmp(spark, "json_events")
    e.write.mode("overwrite").json(path)
    back = spark.read.schema(
        "event_id bigint, user_id bigint, event_type string, value double"
    ).json(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        dsum("value").alias("total_value"),
    )


@register(
    "scan_time_partitioned_pruned",
    """
    SELECT CAST(ts AS DATE) AS day,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(20,6))), 2) AS DOUBLE) AS sum_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-16'
    GROUP BY day
    """,
    doc=(
        "Time-layout archive face: events → day-partitioned parquet archive "
        "→ read back with a partition filter → per-day stats (pruned scan)."
    ),
)
def scan_time_partitioned_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The archive round-trip the trike ingest path replays from
    (``write_time_partitioned``), surfaced as a driver-checkable query:
    write the event log day-partitioned, read it back with a predicate on
    the partition column, aggregate. The value-hash proves the layout
    round-trips timestamps/values losslessly; the plan-shape test proves
    the week filter prunes to 7 of 30 partitions BEFORE any IO — the
    property that turns a 100 TB backfill into a per-day scan."""
    from trike_spark.io import write_time_partitioned

    e = load_table(spark, sf_dir, "events")
    path = _scan_tmp(spark, "events_day_archive")
    write_time_partitioned(e, path, "ts", granularity="day")
    from trike_spark.queries._util import dec

    archived = spark.read.parquet(path)
    return (
        archived.filter(F.col("_part").between("2024-01-10", "2024-01-16"))
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(dec("value")), 2).cast("double").alias("sum_value"),
        )
    )


# --- one-pass table profiling (ANALYZE-style column statistics) -------------

_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_orderpriority"]


@register(
    "scan_profile_orders",
    "\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS col_name,
           COUNT(*) - COUNT({c}) AS n_null,
           COUNT(DISTINCT {c}) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_value,
           CAST(MAX({c}) AS VARCHAR) AS max_value
    FROM orders
    """
        for c in _PROFILE_COLS
    ),
    doc=(
        "One-pass column profiler over orders (null count, exact distinct, "
        "min/max as strings) — the ANALYZE/data-quality report every "
        "pipeline runs before trusting a new drop."
    ),
)
def scan_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling face: per-column null count, exact distinct count and
    min/max, computed in ONE aggregation over one scan (the oracle's
    UNION ALL of per-column scans is the naive 5-scan shape; Spark plans
    the multi-count-distinct via a single Expand — one scan, one shuffle,
    5× less IO, and at 100 TB the scan IS the cost). The wide 1-row agg
    result is then unpivoted driver-free with an explode over structs.
    Min/max are surfaced as strings so one schema carries bigint, decimal,
    date and varchar columns; both engines render ISO dates and plain
    decimal digits, so the report hash-matches."""
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    row = o.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                (F.col("n_rows") - F.col(f"{c}__nn")).alias("n_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return row.select(F.explode(entries).alias("e")).select("e.*")

# --- Z-order (Morton) clustering cells --------------------------------------

from trike_spark.operators.zorder import z_expr_sql, z_expr_spark  # noqa: E402

_Z_BITS = 8
# quantizers: price [0, 512k) / 2000 and days-since-1995 / 10, both capped
# to the 8-bit range; integer + IEEE-exact double ops so engines agree.
_SQL_QP = "LEAST(255, CAST(FLOOR(o_totalprice / 2000) AS BIGINT))"
_SQL_QD_DUCK = "LEAST(255, date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) // 10)"
_SQL_QD_SPARK = "LEAST(255, CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS BIGINT) div 10)"


@register(
    "scan_zorder_cells",
    f"""
    WITH q AS (
      SELECT {_SQL_QP} AS qp, {_SQL_QD_DUCK} AS qd, o_totalprice, o_orderdate
      FROM orders),
    zz AS (
      SELECT {z_expr_sql('qp', 'qd', _Z_BITS)} AS z, o_totalprice, o_orderdate
      FROM q)
    SELECT z // 256 AS cell, COUNT(*) AS n_rows,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR) AS min_date,
           CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR) AS max_date
    FROM zz GROUP BY z // 256
    """,
    doc=(
        "Z-order (Morton) cell report over (price, date): each contiguous "
        "z-range bounds a RECTANGLE in both dims — the footer-stats "
        "locality that makes 2-D predicate skipping work."
    ),
)
def scan_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analysis face of the Z-order layout (`io.write_zorder` is the
    write side, `tests/test_zorder_layout.py` proves the row-group-stats
    win): quantize (o_totalprice, o_orderdate) to 8 bits each, interleave
    to a 16-bit Morton code, and report per 256-code cell the row count
    and the min/max BOUNDING BOX of both source dims. Tight boxes are
    precisely what parquet footer pruning consumes — a 2-D predicate
    reads only the cells whose box intersects it. Narrow quantize +
    interleave (pure integer bit math, zero Python), one ≤256-group
    aggregation with map-side combine."""
    o = load_table(spark, sf_dir, "orders")
    q = o.select(
        F.expr(_SQL_QP).alias("qp"),
        F.expr(_SQL_QD_SPARK).alias("qd"),
        "o_totalprice",
        "o_orderdate",
    )
    zz = q.select(
        z_expr_spark("qp", "qd", _Z_BITS).alias("z"), "o_totalprice", "o_orderdate"
    )
    return (
        zz.groupBy(F.expr("z div 256").alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.min(F.col("o_orderdate").cast("date")).cast("string").alias("min_date"),
            F.max(F.col("o_orderdate").cast("date")).cast("string").alias("max_date"),
        )
    )


# --- Hilbert-curve clustering cells ------------------------------------------

from trike_spark.operators.hilbert import hilbert_cte_sql, with_hilbert_key  # noqa: E402

# Same quantizers as the Z-order face, clamped to the Hilbert walk's
# [0, 2^bits) domain (dates before 1995 make qd negative; the Morton
# bit-interleave tolerates that, the Hilbert rotation arithmetic does not).
_SQL_HP = f"GREATEST(0, {_SQL_QP})"
_SQL_HD_DUCK = f"GREATEST(0, {_SQL_QD_DUCK})"
_SQL_HD_SPARK = f"GREATEST(0, {_SQL_QD_SPARK})"
_HILBERT_SRC_DUCK = (
    f"SELECT {_SQL_HP} AS qx, {_SQL_HD_DUCK} AS qy, o_totalprice, o_orderdate FROM orders"
)


@register(
    "scan_hilbert_cells",
    f"""
    SELECT hkey // 256 AS cell, COUNT(*) AS n_rows,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR) AS min_date,
           CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR) AS max_date
    FROM ({hilbert_cte_sql(_HILBERT_SRC_DUCK, "qx", "qy", _Z_BITS, carry=["o_totalprice", "o_orderdate"])})
    GROUP BY hkey // 256
    """,
    doc=(
        "Hilbert-curve cell report over (price, date): like the Z-order "
        "face but on the curve with NO long jumps — contiguous key ranges "
        "tile compact squares, so per-cell bounding boxes stay uniformly "
        "tight for 2-D predicate skipping."
    ),
)
def scan_hilbert_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analysis face of the Hilbert layout (`io.write_hilbert` is the
    write side; `tests/test_hilbert_layout.py` proves key parity with the
    classic xy→d walk and measures the bounding-box win over Morton on the
    same data). Quantize (o_totalprice, o_orderdate) to 8 bits each, map
    through `operators.hilbert.with_hilbert_key` — the unrolled walk is a
    chain of integer CASE projections, fused by whole-stage codegen, zero
    Python — and report per 256-key cell the row count and min/max
    BOUNDING BOX of both source dims, the exact stats parquet footers use
    to prune. The oracle runs the identical level expressions as a DuckDB
    CTE chain, so the driver's value-hash certifies the curve bit-for-bit
    (which is the property a layout must hold cluster-wide: every writer
    node must agree on the key)."""
    o = load_table(spark, sf_dir, "orders")
    q = o.select(
        F.expr(_SQL_HP).alias("qx"),
        F.expr(_SQL_HD_SPARK).alias("qy"),
        "o_totalprice",
        "o_orderdate",
    )
    h = with_hilbert_key(q, "qx", "qy", bits=_Z_BITS)
    return h.groupBy(F.expr("hkey div 256").alias("cell")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.min(F.col("o_orderdate").cast("date")).cast("string").alias("min_date"),
        F.max(F.col("o_orderdate").cast("date")).cast("string").alias("max_date"),
    )


# --- join-key skew report ---------------------------------------------------

SKEW_TOP_N = 10


@register(
    "scan_skew_report",
    f"""
    WITH kc AS (
      SELECT o_custkey AS key, COUNT(*) AS cnt
      FROM orders GROUP BY o_custkey),
    stats AS (
      SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows,
             MAX(cnt) AS max_cnt
      FROM kc)
    SELECT k.key, k.cnt,
           s.n_keys, s.n_rows,
           CAST(ROUND(CAST(k.cnt AS DOUBLE) * s.n_keys / s.n_rows, 6) AS DOUBLE)
             AS skew_ratio
    FROM kc k CROSS JOIN stats s
    ORDER BY k.cnt DESC, k.key
    LIMIT {SKEW_TOP_N}
    """,
    doc=(
        f"Join-key skew report: top-{SKEW_TOP_N} hottest o_custkey values "
        "with their multiple-of-mean skew ratio — the pre-flight check "
        "that decides whether a join needs salting/AQE skew handling."
    ),
)
def scan_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The diagnosis that motivates ``operators/skew.salted_join`` and
    AQE's skewedJoin: per-key row counts for the intended join key, the
    hottest keys, and each one's ratio to the mean (cnt·n_keys/n_rows —
    computed from two exact BIGINTs through one double division, so it
    hash-matches). A ratio ≫ spark.sql.adaptive.skewJoin thresholds says
    this key will straggle its shuffle partition; feed the hot list to a
    salted join or isolate-and-broadcast those keys. One keyed count
    (map-side combined), a 1-row global stat broadcast back, TakeOrdered
    top-k — runs on 100 TB for the cost of a count."""
    from pyspark.sql.functions import broadcast

    o = load_table(spark, sf_dir, "orders")
    kc = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = kc.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
    ).select("n_keys", "n_rows")
    ratio = F.round(
        F.col("cnt").cast("double") * F.col("n_keys") / F.col("n_rows"), 6
    )
    return (
        kc.crossJoin(broadcast(stats))
        .select("key", "cnt", "n_keys", "n_rows", ratio.alias("skew_ratio"))
        .orderBy(F.desc("cnt"), "key")
        .limit(SKEW_TOP_N)
    )


@register(
    "scan_schema_evolution",
    """
    WITH gen1 AS (
      SELECT n_nationkey, n_name FROM nation WHERE n_regionkey <= 2),
    gen2 AS (
      SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey > 2),
    merged AS (
      SELECT n_nationkey, n_name, NULL AS n_regionkey, 1 AS gen FROM gen1
      UNION ALL
      SELECT n_nationkey, n_name, n_regionkey, 2 AS gen FROM gen2)
    SELECT gen, COUNT(*) AS n_rows,
           COUNT(n_regionkey) AS n_with_new_col,
           MIN(n_name) AS first_name
    FROM merged GROUP BY gen
    """,
    doc=(
        "Schema evolution: two parquet generations (the newer adds a "
        "column) read as ONE table via mergeSchema; old files surface "
        "NULL for the added column — the additive-evolution contract."
    ),
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The additive schema-evolution contract every long-lived dataset
    relies on: generation 1 files lack a column that generation 2 adds;
    ``mergeSchema`` unifies them into one DataFrame where pre-evolution
    rows read NULL for the new column — no rewrite of old data, which at
    100 TB is the only affordable evolution mode (this is precisely what
    Delta/Iceberg 'add column' does at the metadata layer; plain parquet
    pays a footer-merge pass instead, which is why mergeSchema is opt-in).
    The face writes both generations (per-session scratch, one copy),
    reads them merged, and reports per-generation null accounting. Rename
    or type-change is NOT additive — that needs the versioned-table
    layer's logical overwrite (trike_spark/versioned.py)."""
    n = load_table(spark, sf_dir, "nation")
    path = _scan_tmp(spark, "schema_evo")
    g1 = n.filter(F.col("n_regionkey") <= 2).select(
        "n_nationkey", "n_name", F.lit(1).alias("gen")
    )
    g2 = n.filter(F.col("n_regionkey") > 2).select(
        "n_nationkey", "n_name", "n_regionkey", F.lit(2).alias("gen")
    )
    g1.write.mode("overwrite").parquet(os.path.join(path, "gen=1"))
    g2.write.mode("overwrite").parquet(os.path.join(path, "gen=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(path, "gen=1"), os.path.join(path, "gen=2")
    )
    return merged.groupBy("gen").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("n_regionkey").alias("n_with_new_col"),
        F.min("n_name").alias("first_name"),
    )


# --- referential-integrity audit --------------------------------------------

# (label, child table, fk col, parent table, pk col) — the star schema's
# declared foreign keys plus the doc↔embedding linkage.
_FKS = [
    ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation.n_nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region.r_regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
    ("embeddings.vec_id->documents.doc_id", "embeddings", "vec_id", "documents", "doc_id"),
]


def _sql_fk_row(label: str, child: str, fk: str, parent: str, pk: str) -> str:
    return f"""
    SELECT '{label}' AS fk, COUNT(*) AS child_rows,
           CAST(COALESCE(SUM(CASE WHEN c.{fk} IS NOT NULL AND p.{pk} IS NULL
                                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS orphans
    FROM {child} c
    LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p ON c.{fk} = p.{pk}
    """


@register(
    "scan_referential_integrity",
    "SELECT fk, child_rows, orphans, orphans = 0 AS ok FROM ("
    + " UNION ALL ".join(_sql_fk_row(*f) for f in _FKS)
    + ") ORDER BY fk",
    doc=(
        "Referential-integrity audit: orphan counts for every declared "
        "foreign key (6 relations) in one pass — the data-quality "
        "constraint suite run before any training-data release."
    ),
)
def scan_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint audit as a first-class face: each declared
    FK becomes (child_rows, orphans, ok). Per relation it is one LEFT
    join of the child's key column against the parent's distinct keys and
    one unconditional aggregation — NULL FKs are not orphans (SQL FK
    semantics). Scale shape: dimension-sized parents (nation, region,
    customer-at-sf, documents) broadcast; the one genuinely big parent
    (orders under lineitem) is a shuffle join ON THE KEY both tables
    already cluster by, and since only the key column is read, the scan
    is column-pruned to 8 bytes/row either side. The six per-FK one-row
    aggregates union into a single 6-row report — at 100 TB you run this
    as one job, not six."""
    rows = []
    for label, child, fk, parent, pk in _FKS:
        c = load_table(spark, sf_dir, child).select(F.col(fk).alias("_fk"))
        p = (
            load_table(spark, sf_dir, parent)
            .select(F.col(pk).alias("_pk"))
            .distinct()
        )
        joined = c.join(p, c._fk == p._pk, "left")
        rows.append(
            joined.agg(
                F.lit(label).alias("fk"),
                F.count(F.lit(1)).alias("child_rows"),
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("_fk").isNotNull() & F.col("_pk").isNull(), 1
                        ).otherwise(0)
                    ),
                    F.lit(0),
                ).cast("bigint").alias("orphans"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.select(
        "fk", "child_rows", "orphans", (F.col("orphans") == 0).alias("ok")
    ).orderBy("fk")


# --- dynamic partition pruning ----------------------------------------------


@register(
    "scan_dynamic_partition_pruning",
    """
    WITH ev AS (
      SELECT *, date_trunc('day', ts) AS ev_day FROM events),
    dim AS (
      SELECT DISTINCT date_trunc('day', ts) AS d_day FROM events
      WHERE event_type = 'signup'),
    top3 AS (SELECT d_day FROM dim ORDER BY d_day LIMIT 3)
    SELECT CAST(ev.ev_day AS DATE) AS day, COUNT(*) AS n_events,
           COUNT(DISTINCT ev.user_id) AS n_users
    FROM ev JOIN top3 ON ev.ev_day = top3.d_day
    GROUP BY 1
    ORDER BY 1
    """,
    doc=(
        "Dynamic partition pruning: a day-partitioned event archive joined "
        "to a filter-derived dim prunes partitions at RUNTIME from the "
        "dim's values — only 3 of ~30 day directories are read."
    ),
)
def scan_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale feature static pruning can't give you: the day filter is
    not a literal — it comes from ANOTHER table's rows (first 3 signup
    days), so no predicate exists at plan time. Spark's dynamic partition
    pruning broadcasts the dim's join keys into the fact scan as a
    runtime subquery filter, so only the matching day directories are
    listed and read — at 100 TB the difference between a 3-day scan and a
    full-archive scan. The face writes the archive day-partitioned
    (scratch, one copy), joins through the derived dim, and the plan test
    asserts `dynamicpruning` landed in the fact scan's partition filters
    (`tests/test_dynamic_pruning.py`). Oracle is the plain join on the
    unpartitioned table — layout must not change results."""
    e = load_table(spark, sf_dir, "events")
    path = _scan_tmp(spark, "dpp_events")
    (
        e.withColumn("ev_day", F.date_trunc("day", F.col("ts")).cast("date"))
        .write.mode("overwrite")
        .partitionBy("ev_day")
        .parquet(path)
    )
    fact = spark.read.parquet(path)
    dim = (
        e.filter(F.col("event_type") == "signup")
        .select(F.date_trunc("day", F.col("ts")).cast("date").alias("d_day"))
        .distinct()
        .orderBy("d_day")
        .limit(3)
    )
    return (
        fact.join(dim, fact.ev_day == dim.d_day)
        .groupBy(F.col("ev_day").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("day")
    )


@register(
    "scan_versioned_time_travel",
    """
    SELECT 'v1_snapshot' AS leg,
           (SELECT COUNT(*) FROM documents WHERE lang = 'en') AS n_rows
    UNION ALL
    SELECT 'v2_snapshot', (SELECT COUNT(*) FROM documents)
    UNION ALL
    SELECT 'incremental_v1_to_v2',
           (SELECT COUNT(*) FROM documents WHERE lang <> 'en')
    """,
    doc=(
        "Versioned-table face: commit v1 (en docs), append v2 (the rest), "
        "then time-travel-read both snapshots and the v1→v2 incremental "
        "delta — counts must reconcile with the source exactly."
    ),
)
def scan_versioned_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Puts the lakehouse layer (trike_spark/versioned.py: manifest
    commits, snapshot isolation, incremental consumption) under the
    driver's oracle gate, not just pytest: v1 = the English docs, v2
    appends the rest; reading v1 AFTER v2 exists must still see only v1's
    rows (snapshot isolation), latest sees all, and the incremental
    reader picks up exactly the appended delta. The scratch table is
    rebuilt from zero each run (manifests are append-only state — a stale
    chain would shift version numbers and break determinism).

    Scale note: the versioned reads plan from the manifest's file list —
    O(manifest) planning, no directory listing — and the incremental leg
    reads ONLY the delta directories; the counts here are the smallest
    faithful observation of those properties."""
    import shutil

    from trike_spark import versioned

    path = _scan_tmp(spark, "versioned_tt")
    shutil.rmtree(path, ignore_errors=True)
    d = load_table(spark, sf_dir, "documents")
    v1 = versioned.commit(d.filter(F.col("lang") == "en"), path, mode="append")
    versioned.commit(d.filter(F.col("lang") != "en"), path, mode="append")
    n_v1 = versioned.read_version(spark, path, v1).count()
    n_v2 = versioned.read_version(spark, path).count()
    inc_df, _hw = versioned.read_incremental(spark, path, since_version=v1)
    n_inc = 0 if inc_df is None else inc_df.count()
    return spark.createDataFrame(
        [
            ("v1_snapshot", n_v1),
            ("v2_snapshot", n_v2),
            ("incremental_v1_to_v2", n_inc),
        ],
        "leg string, n_rows long",
    )


@register(
    "scan_mor_delete_read",
    """
    SELECT 'after_delete' AS leg,
           (SELECT COUNT(*) FROM documents WHERE NOT (lang = 'en')) AS n_rows
    UNION ALL
    SELECT 'time_travel_pre_delete', (SELECT COUNT(*) FROM documents)
    UNION ALL
    SELECT 'after_reinsert',
           (SELECT COUNT(*) FROM documents WHERE NOT (lang = 'en'))
             + (SELECT COUNT(*) FROM documents WHERE lang = 'en' AND doc_id % 2 = 0)
    UNION ALL
    SELECT 'after_compaction',
           (SELECT COUNT(*) FROM documents WHERE NOT (lang = 'en'))
             + (SELECT COUNT(*) FROM documents WHERE lang = 'en' AND doc_id % 2 = 0)
    """,
    doc=(
        "Merge-on-read delete vectors under the oracle gate: equality-"
        "delete the English docs (a key-file commit, no rewrite), "
        "time-travel past it, re-insert half of them (vector scoping must "
        "not re-delete), then compact the vectors away — all four counts "
        "reconcile with the source."
    ),
)
def scan_mor_delete_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deletion-vector life cycle (versioned.py::delete_where_mor /
    compact_deletes) observed through counts: (1) a MOR delete hides the
    English docs at read time without touching data files; (2) the
    pre-delete snapshot still time-travels intact; (3) an append AFTER
    the delete re-inserts half the deleted keys and the vector's
    directory scoping leaves them alive (Iceberg sequence semantics);
    (4) compaction folds the vector into a clean snapshot with identical
    visible rows. The scratch table rebuilds from zero each run.

    Scale note: the delete commit writes |keys| rows, not the table —
    at 100 TB that's the difference between a kilobyte PUT and a multi-
    terabyte rewrite per erasure request; the read tax is one broadcast
    anti-join per vector until compaction."""
    import shutil

    from trike_spark import versioned

    path = _scan_tmp(spark, "versioned_mor")
    shutil.rmtree(path, ignore_errors=True)
    d = load_table(spark, sf_dir, "documents")
    v1 = versioned.commit(d, path, mode="append")
    versioned.delete_where_mor(spark, path, "lang = 'en'", key_cols=["doc_id"])
    n_after_delete = versioned.read_version(spark, path).count()
    n_tt = versioned.read_version(spark, path, v1).count()
    versioned.commit(
        d.filter((F.col("lang") == "en") & (F.col("doc_id") % 2 == 0)),
        path,
        mode="append",
    )
    n_after_reinsert = versioned.read_version(spark, path).count()
    versioned.compact_deletes(spark, path)
    n_after_compact = versioned.read_version(spark, path).count()
    return spark.createDataFrame(
        [
            ("after_delete", n_after_delete),
            ("time_travel_pre_delete", n_tt),
            ("after_reinsert", n_after_reinsert),
            ("after_compaction", n_after_compact),
        ],
        "leg string, n_rows long",
    )


@register(
    "scan_data_quality_rules",
    """
    SELECT 'orders.o_custkey not_null' AS rule,
           (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS n_violations
    UNION ALL
    SELECT 'orders.o_orderkey unique',
           (SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) FROM
             (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1))
    UNION ALL
    SELECT 'orders.o_totalprice positive',
           (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
    UNION ALL
    SELECT 'orders.o_orderstatus in_set',
           (SELECT COUNT(*) FROM orders WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
    UNION ALL
    SELECT 'orders.o_custkey referential',
           (SELECT COUNT(*) FROM orders o LEFT JOIN customer c
              ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
    UNION ALL
    SELECT 'lineitem.l_discount in_range',
           (SELECT COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 0.1)
    UNION ALL
    SELECT 'lineitem.l_orderkey referential',
           (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
              ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
    """,
    doc=(
        "Declarative data-quality rule pack (not-null, uniqueness, range, "
        "set membership, referential integrity): one violations row per "
        "rule — the expectations gate a pipeline runs before publishing."
    ),
)
def scan_data_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The expectations layer (Great-Expectations-shaped, engine-native):
    each rule compiles to a violation COUNT over the scan, the report is
    one row per rule, and a publish step gates on all-zeros. Rules
    deliberately compile to DIFFERENT plan shapes — narrow predicates
    (null/range/set), a keyed duplicate count, and two anti-join
    referential probes — showing each constraint type takes its cheapest
    plan, not a generic row-validator UDF.

    Scale shape: predicate rules are scan-adjacent narrow filters with
    pushdown; uniqueness is one map-side-combined groupBy on the key;
    referential checks broadcast the dimension side (customer) or
    equi-join on the fact key. At 100 TB you run the pack once per
    ingest batch, not per query — violations land in the run report the
    same way this face's rows do."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    from pyspark.sql.functions import broadcast

    def one(rule: str, n) -> DataFrame:
        return n.select(F.lit(rule).alias("rule"), F.col("n").alias("n_violations"))

    cnt = lambda df: df.agg(F.count(F.lit(1)).cast("bigint").alias("n"))  # noqa: E731
    dup = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).cast("bigint").alias("n"))
    )
    legs = [
        one("orders.o_custkey not_null", cnt(o.filter(F.col("o_custkey").isNull()))),
        one("orders.o_orderkey unique", dup),
        one("orders.o_totalprice positive", cnt(o.filter(F.col("o_totalprice") <= 0))),
        one(
            "orders.o_orderstatus in_set",
            cnt(o.filter(~F.col("o_orderstatus").isin("O", "F", "P"))),
        ),
        one(
            "orders.o_custkey referential",
            cnt(
                o.join(broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
            ),
        ),
        one(
            "lineitem.l_discount in_range",
            cnt(li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1))),
        ),
        one(
            "lineitem.l_orderkey referential",
            cnt(li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")),
        ),
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


@register(
    "scan_orc_roundtrip_orders",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,4))), 2) AS DOUBLE)
             AS sum_price
    FROM orders GROUP BY o_orderpriority
    """,
    doc=(
        "ORC round-trip: write orders as ORC, read back, aggregate — the "
        "third columnar format in the source/sink matrix (parquet, CSV, "
        "JSON, ORC), with predicate pushdown intact."
    ),
)
def scan_orc_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC is the other columnar format a lake inherits (Hive-era tables,
    Trino deployments); Spark reads/writes it natively with the same
    pushdown/pruning machinery as parquet. The face round-trips orders
    through ORC and aggregates FROM THE ORC COPY — the oracle aggregates
    the parquet source, so any loss, type drift, or row duplication in
    the format conversion hash-fails.

    Scale note: same columnar economics as parquet (stripe = row group,
    min/max indexes, dictionary encoding); the conversion cost is one
    scan + one write, which is why format migrations are routine
    maintenance jobs, not rewrites of the query layer."""
    import shutil

    path = _scan_tmp(spark, "orc_orders")
    shutil.rmtree(path, ignore_errors=True)
    load_table(spark, sf_dir, "orders").write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(38,4)")), 2)
        .cast("double")
        .alias("sum_price"),
    )


@register(
    "scan_bucketed_join_rollup",
    """
    SELECT o.o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(38,4))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    """,
    doc=(
        "Bucketed co-located fact-to-fact join under the oracle gate: both "
        "sides bucketed on the join key, the join runs with ZERO shuffle "
        "exchanges, and the rollup reconciles with the plain-join oracle."
    ),
)
def scan_bucketed_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recurring fact⋈fact join is THE shuffle a 100 TB deployment
    pays daily until both tables are bucketed the same way — then the
    join becomes a per-bucket zip with no exchange at all (the pytest
    plan assertion; this face puts the RESULT under the driver's hash
    gate so the layout provably changes nothing but the plan). Bucket
    count is the a-priori shuffle-partition choice — pick
    ~total_size/128 MB at deployment scale.

    Side effects: rebuilds the two managed bucketed tables per run
    (DROP + saveAsTable into the session warehouse — the scan-face
    scratch convention applied to tables)."""
    import shutil

    from trike_spark.io import write_bucketed

    spark.sql("DROP TABLE IF EXISTS face_b_orders")
    spark.sql("DROP TABLE IF EXISTS face_b_lineitem")
    for t in ("face_b_orders", "face_b_lineitem"):
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    write_bucketed(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus"),
        "face_b_orders",
        "o_orderkey",
        4,
        sort_col="o_orderkey",
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice"),
        "face_b_lineitem",
        "l_orderkey",
        4,
        sort_col="l_orderkey",
    )
    o = spark.table("face_b_orders")
    li = spark.table("face_b_lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(38,4)")), 2)
            .cast("double")
            .alias("revenue"),
        )
    )


# --- sampled ANALYZE (CBO statistics from a TABLESAMPLE) ----------------------------

ANALYZE_PCT = 10  # deterministic md5 sample rate


@register(
    "scan_analyze_sampled",
    f"""
    WITH keyed AS (
      SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
             CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_'
                                      || CAST(l_linenumber AS VARCHAR)), 1, 15))
                  AS BIGINT) % 100 AS draw
      FROM lineitem),
    samp AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_s,
             SUM(price) AS sum_price_s,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS ndv_s
      FROM keyed WHERE draw < {ANALYZE_PCT}),
    ex AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_x,
             SUM(price) AS sum_price_x,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS ndv_x
      FROM keyed)
    SELECT ex.n_x AS rows_exact,
           CAST(samp.n_s * (100 // {ANALYZE_PCT}) AS BIGINT) AS rows_est,
           ROUND(ABS(CAST(samp.n_s * (100 // {ANALYZE_PCT}) AS DOUBLE)
                     - ex.n_x) / ex.n_x, 6) AS rows_rel_err,
           ROUND(CAST(ex.sum_price_x AS DOUBLE) / ex.n_x, 4)
             AS price_mean_exact,
           ROUND(CAST(samp.sum_price_s AS DOUBLE) / samp.n_s, 4)
             AS price_mean_sampled,
           ex.ndv_x AS ndv_partkey_exact,
           samp.ndv_s AS ndv_partkey_in_sample
    FROM samp CROSS JOIN ex
    """,
    doc=(
        f"ANALYZE from a deterministic {ANALYZE_PCT} % md5 TABLESAMPLE: "
        "sampled row count / mean scale up with measured relative error; "
        "the in-sample NDV is reported raw beside the exact NDV — the "
        "statistic that does NOT scale linearly (why engines sketch it)."
    ),
)
def scan_analyze_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CBO-statistics pattern: planners don't scan 100 TB to cost a
    join — they ANALYZE a sample. Counts and means scale by 1/p with
    √(1/np) relative error (measured here beside the exact control);
    distinct counts famously do NOT (every estimator that multiplies
    in-sample NDV by 1/p is catastrophically wrong on skewed columns —
    Charikar et al.'s lower bound), which this face makes visible by
    reporting the raw in-sample NDV next to the exact one; the engine's
    production answer for NDV is the HLL/KMV sketch family, built in one
    full pass instead.

    Determinism: the sample is an md5 draw on the row key — the same
    deterministic TABLESAMPLE mechanism as every sampling face, so both
    engines pick the identical subset; sums fold in exact DECIMAL.

    Scale shape: one narrow draw predicate fused into the scan feeds the
    sampled leg (a real deployment persists the sample once and runs all
    column stats on it); both legs are map-side-combined scalar
    aggregations; 1-row output."""
    li = load_table(spark, sf_dir, "lineitem")
    from trike_spark.queries.dedup import _h60

    keyed = li.select(
        "l_partkey",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        (
            _h60(
                F.concat(
                    F.col("l_orderkey").cast("string"),
                    F.lit("_"),
                    F.col("l_linenumber").cast("string"),
                )
            )
            % 100
        ).alias("draw"),
    )
    samp = keyed.filter(F.col("draw") < ANALYZE_PCT).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_s"),
        F.sum("price").alias("sum_price_s"),
        F.count_distinct("l_partkey").cast("bigint").alias("ndv_s"),
    )
    ex = keyed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_x"),
        F.sum("price").alias("sum_price_x"),
        F.count_distinct("l_partkey").cast("bigint").alias("ndv_x"),
    )
    scale = 100 // ANALYZE_PCT
    return samp.crossJoin(F.broadcast(ex)).select(
        F.col("n_x").alias("rows_exact"),
        (F.col("n_s") * scale).cast("bigint").alias("rows_est"),
        F.round(
            F.abs((F.col("n_s") * scale).cast("double") - F.col("n_x"))
            / F.col("n_x"),
            6,
        ).alias("rows_rel_err"),
        F.round(F.col("sum_price_x").cast("double") / F.col("n_x"), 4).alias(
            "price_mean_exact"
        ),
        F.round(F.col("sum_price_s").cast("double") / F.col("n_s"), 4).alias(
            "price_mean_sampled"
        ),
        F.col("ndv_x").alias("ndv_partkey_exact"),
        F.col("ndv_s").alias("ndv_partkey_in_sample"),
    )
