"""Window-function operators: ranking, lag/lead, running frames, range
frames, ntile (SURVEY.md §2.6 "Window functions").

Scale notes: every window partitions by a high-cardinality key (custkey),
so state is distributed evenly; no global (unpartitioned) windows appear
anywhere in the engine — those serialize onto one task at 100 TB. ORDER BY
inside each window always carries a unique tie-break column so results are
deterministic and cross-engine comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trike_spark.io import load_table
from trike_spark.queries._util import dec, dsum
from trike_spark.registry import register

_BY_CUST = ["o_orderdate", "o_orderkey"]  # deterministic within customer


@register(
    "window_rownum_first_orders",
    """
    SELECT o_custkey, o_orderkey, o_orderdate, rn FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    """,
    doc="row_number: first 3 orders per customer (per-group top-k).",
)
def window_rownum_first_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(*_BY_CUST)
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_rank_price_in_priority",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rnk, drnk FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             RANK()       OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk,
             DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS drnk
      FROM orders) WHERE rnk <= 5
    """,
    doc="rank + dense_rank (value-based, tie-stable across engines).",
)
def window_rank_price_in_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rnk") <= 5)
    )


@register(
    "window_lag_lead_order_gaps",
    """
    SELECT o_custkey, o_orderkey,
           LAG(o_orderdate)  OVER w AS prev_date,
           LEAD(o_orderdate) OVER w AS next_date,
           DATE_DIFF('day', LAG(o_orderdate) OVER w, o_orderdate) AS gap_days
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="lag/lead navigation + day gap between consecutive orders.",
)
def window_lag_lead_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(*_BY_CUST)
    prev = F.lag("o_orderdate").over(w)
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        prev.alias("prev_date"),
        F.lead("o_orderdate").over(w).alias("next_date"),
        F.datediff(F.col("o_orderdate"), prev).alias("gap_days"),
    )


@register(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_spend
    FROM orders
    """,
    doc="Running sum with ROWS frame; decimal-exact so prefix sums match bit-for-bit.",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(*_BY_CUST)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(dec("o_totalprice")).over(w), 2).cast("double").alias("running_spend"),
    )


@register(
    "window_range_30d_activity",
    """
    SELECT o_custkey, o_orderkey,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
                          RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS n_orders_30d
    FROM orders
    """,
    doc="RANGE frame over event-time seconds: orders in the trailing 30 days per customer.",
)
def window_range_30d_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", F.count(F.lit(1)).over(w).alias("n_orders_30d")
    )


@register(
    "window_distribution_funcs",
    """
    SELECT o_orderkey,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume,
           first_value(o_orderkey) OVER wf AS first_key,
           last_value(o_orderkey) OVER wf AS last_key,
           nth_value(o_orderkey, 2) OVER wf AS second_key,
           lag(o_orderkey, 1, -1) OVER w AS prev_key_or_neg1
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey),
           wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="Distribution + navigation window fns: percent_rank, cume_dist, first/last/nth_value, lag-with-default.",
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(wf).alias("first_key"),
        F.last("o_orderkey").over(wf).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_key"),
        F.lag("o_orderkey", 1, -1).over(w).alias("prev_key_or_neg1"),
    )


@register(
    "window_ntile_spend_quartiles",
    f"""
    SELECT o_orderpriority, quartile, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price
    FROM (SELECT o_orderpriority, o_totalprice,
                 NTILE(4) OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS quartile
          FROM orders)
    GROUP BY o_orderpriority, quartile
    """,
    doc="ntile quartiles (unique tie-break → positional assignment is stable).",
)
def window_ntile_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_totalprice", F.ntile(4).over(w).alias("quartile"))
        .groupBy("o_orderpriority", "quartile")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("sum_price"))
    )


@register(
    "window_gap_fill_forward",
    """
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(*) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
    bounds AS (
      SELECT CAST(date_trunc('day', MIN(ts)) AS DATE) AS d0,
             CAST(date_trunc('day', MAX(ts)) AS DATE) AS d1
      FROM events),
    spine AS (
      SELECT u.user_id, CAST(gs.s AS DATE) AS day
      FROM (SELECT DISTINCT user_id FROM events) u
      CROSS JOIN bounds
      CROSS JOIN LATERAL (SELECT unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                 CAST(d1 AS TIMESTAMP), INTERVAL '1 day')) AS s) gs)
    SELECT s.user_id, s.day,
           COALESCE(d.n, 0) AS n,
           last_value(d.n IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS UNBOUNDED PRECEDING) AS n_filled
    FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    """,
    doc="Time-spine gap fill + forward fill: dense daily series per user with "
    "last-known-value carry-forward (the hypertable rollup shape).",
)
def window_gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling a sparse per-key time series against a generated date
    spine, then forward-filling with last_value(IGNORE NULLS). Scale shape:
    the spine is |keys| x |days| rows built by a narrow sequence-explode
    (no shuffle); the left join shuffles on (user_id, day) = evenly
    distributed; the fill window partitions by user_id. Nothing global."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bounds = e.agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("d0"),
        F.to_date(F.date_trunc("day", F.max("ts"))).alias("d1"),
    )
    users = e.select("user_id").distinct()
    spine = (
        users.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.last("n", ignorenulls=True).over(w).alias("n_filled"),
        )
    )


# --- exact equi-depth histogram without a single-partition sort -------------

EQUIDEPTH_K = 8
_EQ_BAND_WIDTH = 5000  # price band for the distributed-rank first pass


@register(
    "window_equidepth_histogram",
    f"""
    WITH ranked AS (
      SELECT o_totalprice,
             NTILE({EQUIDEPTH_K}) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders)
    SELECT bucket, COUNT(*) AS n_orders,
           MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
    FROM ranked GROUP BY bucket
    """,
    doc=(
        f"Exact equi-depth (NTILE-{EQUIDEPTH_K}) price histogram computed "
        "WITHOUT a global single-partition sort: band-count offsets + "
        "per-band row_number give the exact global rank distributedly."
    ),
)
def window_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram with EXACT NTILE semantics, but scale-correct:
    a bare ``NTILE() OVER (ORDER BY …)`` collapses the whole table into
    one partition (the classic global-window trap). Instead:

      1. bucket rows into monotone price bands (narrow, no shuffle);
      2. aggregate per-band counts (one tiny shuffle) and turn them into
         exclusive running offsets + the total N (window over the ~120
         band rows — single-partition, but over band COUNTS, not data);
      3. broadcast the offsets back and compute each row's exact global
         rank as offset + row_number within its band — the heavy window
         runs partitioned BY BAND, so parallelism is #bands, not 1;
      4. apply NTILE's allocation rule (first N mod k buckets get
         ⌈N/k⌉) as a closed-form integer expression over (rank, N).

    Ties of o_totalprice can't straddle bands (bands are functions of the
    price), and (price, orderkey) is a total order, so the distributed
    rank equals the oracle's NTILE input rank exactly — integer math end
    to end, hash-identical. The same skeleton yields exact percentiles,
    medians, and global row_number at 100 TB; band width plays the role
    of the range-partitioner's split points."""
    from pyspark.sql.functions import broadcast

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    banded = o.withColumn(
        "band", F.floor(F.col("o_totalprice") / _EQ_BAND_WIDTH).cast("long")
    )
    stats = banded.groupBy("band").agg(F.count(F.lit(1)).alias("bn"))
    wcum = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = stats.select(
        "band",
        F.coalesce(F.sum("bn").over(wcum), F.lit(0)).alias("offset"),
        F.sum("bn").over(wall).alias("N"),
    )
    ranked = banded.join(broadcast(offsets), "band").withColumn(
        "rk",
        F.col("offset")
        + F.row_number().over(
            Window.partitionBy("band").orderBy("o_totalprice", "o_orderkey")
        ),
    )
    k = EQUIDEPTH_K
    bucket = F.expr(
        f"""CASE WHEN rk <= (N % {k}) * (N div {k} + 1)
                 THEN (rk - 1) div (N div {k} + 1) + 1
                 ELSE (N % {k}) + (rk - (N % {k}) * (N div {k} + 1) - 1) div (N div {k}) + 1
            END"""
    )
    return (
        ranked.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


# --- exponentially-weighted trailing average (integer fixed-point) ----------

EWMA_LAGS = 15  # trailing window: current row + 15 predecessors
# weight for lag k is 2^(EWMA_LAGS - k) — a halving decay whose tail
# beyond 16 lags would contribute < 2^-16 of the mass, hence truncation.


@register(
    "window_ewma_trailing",
    f"""
    WITH x AS (
      SELECT o_custkey, o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(38,4)) * 100 AS BIGINT)
               AS total_cents,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders)
    SELECT a.o_custkey AS custkey, a.o_orderkey AS orderkey, a.rn,
           a.total_cents,
           CAST(SUM(b.total_cents * (CAST(1 AS BIGINT) << ({EWMA_LAGS} - (a.rn - b.rn))))
                // SUM(CAST(1 AS BIGINT) << ({EWMA_LAGS} - (a.rn - b.rn)))
                AS BIGINT) AS ewma_cents
    FROM x a JOIN x b
      ON b.o_custkey = a.o_custkey AND b.rn BETWEEN a.rn - {EWMA_LAGS} AND a.rn
    GROUP BY 1, 2, 3, 4
    """,
    doc=(
        f"EWMA (halving decay, {EWMA_LAGS + 1}-lag truncation) of each "
        "customer's order totals in BIGINT fixed-point via a bounded band "
        "self-join — hash-exact, no float recursion."
    ),
)
def window_ewma_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted trailing average without floats: weight for
    lag k is the exact integer 2^({EWMA_LAGS}-k), the average is
    Σ(x·w) div Σ(w) in BIGINT (cents ≤ 5.5e7 × weight ≤ 2^15 × 16 rows
    ≈ 2.9e13 — far inside 2^63). The recursive EWMA definition is not
    window-expressible (the weight depends on the distance to the CURRENT
    row, not the row itself); the standard distributed shape is this
    bounded band self-join: both sides shuffle once on the partition key,
    and the band predicate caps amplification at {EWMA_LAGS + 1}× — O(n)
    state, no per-key recursion, works identically at 100 TB. Early rows
    (< {EWMA_LAGS + 1} predecessors) normalize by the weights actually
    present, so the face has no warm-up NULLs."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (dec("o_totalprice") * 100).cast("bigint").alias("total_cents"),
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    x = o.withColumn("rn", F.row_number().over(w)).drop("o_orderdate")
    a, b = x.alias("a"), x.alias("b")
    return (
        a.join(
            b,
            (F.col("b.o_custkey") == F.col("a.o_custkey"))
            & (F.col("b.rn") >= F.col("a.rn") - EWMA_LAGS)
            & (F.col("b.rn") <= F.col("a.rn")),
        )
        .groupBy(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("orderkey"),
            F.col("a.rn").alias("rn"),
            F.col("a.total_cents").alias("total_cents"),
        )
        .agg(
            F.expr(
                f"sum(b.total_cents * shiftleft(cast(1 as bigint), {EWMA_LAGS} - (a.rn - b.rn)))"
                f" div sum(shiftleft(cast(1 as bigint), {EWMA_LAGS} - (a.rn - b.rn)))"
            ).alias("ewma_cents")
        )
    )


# --- rolling correlation ------------------------------------------------------

CORR_WIN = 7  # trailing days


@register(
    "window_rolling_corr",
    f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY CAST(ts AS DATE)),
    roll AS (
      SELECT d,
             CAST(SUM(x) OVER w AS DOUBLE) AS sx,
             CAST(SUM(y) OVER w AS DOUBLE) AS sy,
             CAST(SUM(x * y) OVER w AS DOUBLE) AS sxy,
             CAST(SUM(x * x) OVER w AS DOUBLE) AS sxx,
             CAST(SUM(y * y) OVER w AS DOUBLE) AS syy,
             CAST(COUNT(*) OVER w AS DOUBLE) AS n
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN {CORR_WIN - 1} PRECEDING AND CURRENT ROW))
    SELECT d, CAST(n AS BIGINT) AS n_days,
           ROUND((n * sxy - sx * sy) /
                 (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6) AS rolling_corr
    FROM roll WHERE n = {CORR_WIN}
    """,
    doc=(
        f"Trailing-{CORR_WIN}-day Pearson correlation between daily click and "
        "purchase counts — integer window sums, one pinned double expression."
    ),
)
def window_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling cross-metric correlation — the co-movement monitor behind
    'did purchases decouple from clicks this week' dashboards and feature
    drift checks between paired signals.

    Determinism: every moment (Σx, Σy, Σxy, Σx², Σy², n) is an exact
    BIGINT window sum; the Pearson formula is ONE pinned double
    expression over those exact sums (same discipline as text_zipf_slope,
    in rolling form). No stddev/corr aggregate is used — engine-specific
    accumulation orders would break the cross-engine hash.

    Scale shape: the corpus-wide shuffle is the daily rollup (map-side
    combined, |days|·|types| output); the rolling frame then runs over
    the DAY dimension — bounded by the calendar, never by event volume
    (the sanctioned dimension-sized window, same as the equi-depth
    histogram)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("y"),
    )
    w = Window.orderBy("d").rowsBetween(-(CORR_WIN - 1), Window.currentRow)
    roll = daily.select(
        "d",
        F.sum("x").over(w).cast("double").alias("sx"),
        F.sum("y").over(w).cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("double").alias("syy"),
        F.count(F.lit(1)).over(w).cast("double").alias("n"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return (
        roll.filter(n == CORR_WIN)
        .select("d", n.cast("bigint").alias("n_days"), F.round(corr, 6).alias("rolling_corr"))
    )


# --- CUSUM drawdown (change detection) ---------------------------------------


@register(
    "window_cusum_drawdown",
    """
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
             SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS rev
      FROM orders GROUP BY 1),
    tot AS (SELECT CAST(SUM(rev) AS DOUBLE) AS total,
                   CAST(COUNT(*) AS DOUBLE) AS n FROM monthly),
    series AS (
      SELECT m,
             CAST(SUM(rev) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               AS cum_rev,
             CAST(ROW_NUMBER() OVER (ORDER BY m) AS DOUBLE) AS t,
             tot.total, tot.n
      FROM monthly CROSS JOIN tot),
    cusum AS (SELECT m, cum_rev - t * (total / n) AS s FROM series),
    dd AS (
      SELECT m, s,
             MAX(s) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING) AS peak
      FROM cusum)
    SELECT m, ROUND(s, 2) AS cusum, ROUND(peak - s, 2) AS drawdown
    FROM dd
    """,
    doc=(
        "CUSUM control chart over monthly revenue: cumulative deviation "
        "from the mean-rate line, running peak, and drawdown per month — "
        "the classic change-point/regime-shift detector."
    ),
)
def window_cusum_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's CUSUM, the change-detection chart: S_t = Σrev − t·mean
    drifts near zero while the process is stationary and runs away when
    the rate shifts; peak − S_t (the drawdown) is the evidence of a
    downshift since the best point. The same statistic monitors corpus
    ingest rates or per-source token mix at 100 TB.

    Determinism: the cumulative is an EXACT decimal window sum cast to
    double once per row; the drift line t·(total/n) and every subtraction
    are pinned double expressions; peak is a running MAX (no re-fold).

    Scale shape: one map-side-combined monthly rollup; all windows run
    over the MONTH dimension (calendar-bounded — the sanctioned
    dimension-sized global window)."""
    from pyspark.sql.functions import broadcast

    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("m")
    ).agg(F.sum(dec("o_totalprice")).alias("rev"))
    tot = monthly.agg(
        F.sum("rev").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    w_cum = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    series = monthly.crossJoin(broadcast(tot)).select(
        "m",
        F.sum("rev").over(w_cum).cast("double").alias("cum_rev"),
        F.row_number().over(Window.orderBy("m")).cast("double").alias("t"),
        "total",
        "n",
    )
    s = F.col("cum_rev") - F.col("t") * (F.col("total") / F.col("n"))
    dd = series.select("m", s.alias("s")).select(
        "m",
        "s",
        F.max("s").over(w_cum.orderBy("m")).alias("peak"),
    )
    return dd.select(
        "m",
        F.round(F.col("s"), 2).alias("cusum"),
        F.round(F.col("peak") - F.col("s"), 2).alias("drawdown"),
    )


@register(
    "window_rolling_median",
    """
    WITH fr AS (
      SELECT o_orderkey, o_custkey,
             list_sort(list_filter(
               [LAG(o_totalprice, 3) OVER w, LAG(o_totalprice, 2) OVER w,
                LAG(o_totalprice, 1) OVER w, o_totalprice],
               x -> x IS NOT NULL)) AS frame
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
    SELECT o_orderkey, o_custkey,
           ROUND((frame[CAST(FLOOR((len(frame) + 1) / 2) AS INT)]
                  + frame[CAST(FLOOR(len(frame) / 2 + 1) AS INT)]) / 2,
                 3) AS med4
    FROM fr
    """,
    doc=(
        "Exact rolling median of order value over the trailing 4 orders "
        "per customer — the robust-smoothing companion to the EWMA face."
    ),
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT median over the trailing-4 row frame — the robust
    alternative to a trailing mean (one outlier order can't drag it).
    Median is a selection statistic, so unlike float sums it carries no
    accumulation-order hazard: odd frames pick one value, even frames
    average the two middle values with a single (a+b)/2 that both engines
    evaluate identically in IEEE double.

    Spark's ``median`` aggregate rejects window frames, so the frame is
    materialized explicitly: three LAGs + the current value into an
    array, null-compacted (partition head rows have short frames),
    sorted, and indexed — all JVM-side array expressions inside one
    Window over (custkey, date). Constant per-row state (≤ 4 doubles);
    one shuffle on o_custkey; the frame never grows with data volume."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = load_table(spark, sf_dir, "orders")
    frame = F.array_sort(
        F.array_compact(
            F.array(
                F.lag("o_totalprice", 3).over(w),
                F.lag("o_totalprice", 2).over(w),
                F.lag("o_totalprice", 1).over(w),
                F.col("o_totalprice"),
            )
        )
    )
    n = F.size(frame)
    lo = F.element_at(frame, ((n + 1) / 2).cast("int"))
    hi = F.element_at(frame, (n / 2 + 1).cast("int"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round((lo + hi) / 2.0, 3).alias("med4"),
    )


@register(
    "window_mom_growth",
    """
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS m,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,4))), 2) AS DOUBLE)
               AS revenue
      FROM orders GROUP BY date_trunc('month', o_orderdate)),
    g AS (
      SELECT m, revenue,
             LAG(revenue) OVER (ORDER BY m) AS prev_rev,
             ROUND((CAST(revenue AS DECIMAL(18,2))
                    + COALESCE(LAG(CAST(revenue AS DECIMAL(18,2)), 1) OVER (ORDER BY m), CAST(0 AS DECIMAL(18,2)))
                    + COALESCE(LAG(CAST(revenue AS DECIMAL(18,2)), 2) OVER (ORDER BY m), CAST(0 AS DECIMAL(18,2))))
                   / LEAST(3, ROW_NUMBER() OVER (ORDER BY m)), 2) AS ma3
      FROM monthly)
    SELECT CAST(m AS DATE) AS m, revenue,
           ROUND((revenue - prev_rev) / prev_rev, 6) AS mom_growth,
           CAST(ma3 AS DOUBLE) AS ma3
    FROM g
    """,
    doc=(
        "Month-over-month revenue growth + 3-month moving average — the "
        "boardroom trend report, decimal-exact."
    ),
)
def window_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MoM growth rate and a trailing 3-month moving average over the
    monthly revenue rollup. The moving average is built from explicit
    decimal LAGs (not an AVG frame) so partial leading windows divide an
    EXACT decimal sum by the true member count — both engines fold
    identical decimals, no float accumulation anywhere before the two
    pinned final divisions.

    Scale shape: one map-side-combined monthly rollup, then windows over
    the MONTH dimension (calendar-bounded — the sanctioned global
    window)."""
    monthly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(F.round(F.sum(dec("o_totalprice")), 2).cast("double").alias("revenue"))
    )
    w = Window.orderBy("m")
    rev_dec = F.col("revenue").cast("decimal(18,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    ma3 = F.round(
        (
            rev_dec
            + F.coalesce(F.lag(rev_dec, 1).over(w), zero)
            + F.coalesce(F.lag(rev_dec, 2).over(w), zero)
        )
        / F.least(F.lit(3), F.row_number().over(w)),
        2,
    )
    prev = F.lag("revenue").over(w)
    return monthly.select(
        F.col("m").cast("date").alias("m"),
        "revenue",
        F.round((F.col("revenue") - prev) / prev, 6).alias("mom_growth"),
        ma3.cast("double").alias("ma3"),
    )


@register(
    "window_rolling_percentile_bands",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY CAST(ts AS DATE)),
    fr AS (
      SELECT day, n,
             list_sort(list_filter(
               [LAG(n, 6) OVER w, LAG(n, 5) OVER w, LAG(n, 4) OVER w,
                LAG(n, 3) OVER w, LAG(n, 2) OVER w, LAG(n, 1) OVER w, n],
               x -> x IS NOT NULL)) AS frame
      FROM daily WINDOW w AS (ORDER BY day))
    SELECT day, CAST(n AS BIGINT) AS n,
           frame[1] AS band_min,
           frame[CAST(FLOOR((len(frame) + 1) / 2) AS INT)] AS band_p50_lo,
           frame[len(frame)] AS band_max,
           n < frame[1] OR n > frame[len(frame)] AS outside_band
    FROM fr
    """,
    doc=(
        "Trailing-7-day control bands around the daily event count "
        "(min / lower-median / max of the frame) with an outside-band "
        "flag — the robust anomaly envelope for a metric series."
    ),
)
def window_rolling_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-statistic control bands: for each day, the trailing week's
    min, lower median, and max bound the 'normal' range — a distribution-
    free envelope (no Gaussian assumption like the z-score face, no
    global baseline like the MAD face; the band adapts to local level
    shifts within a week). The current day compares against a frame that
    INCLUDES it, so outside_band only fires when today sets the week's
    extreme — the conservative form that never flags a repeat of recent
    behavior.

    Engine notes: the frame materializes via the lag-array construction
    (Spark's order-statistic aggregates reject window frames — the
    rolling-median precedent), so both engines index the same sorted
    array. Integer counts end to end. The window runs over the CALENDAR
    dimension; per-row state is ≤ 7 integers."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("day")
    frame = F.array_sort(
        F.array_compact(
            F.array(
                *[F.lag("n", i).over(w) for i in range(6, 0, -1)], F.col("n")
            )
        )
    )
    fr = daily.select("day", "n", frame.alias("frame"))
    fl = F.size(F.col("frame"))
    return fr.select(
        "day",
        F.col("n").cast("bigint").alias("n"),
        F.element_at("frame", 1).alias("band_min"),
        F.element_at("frame", ((fl + 1) / 2).cast("int")).alias("band_p50_lo"),
        F.element_at("frame", fl).alias("band_max"),
        (
            (F.col("n") < F.element_at("frame", 1))
            | (F.col("n") > F.element_at("frame", fl))
        ).alias("outside_band"),
    )
