"""Join operators: inner/left/right/full/semi/anti/cross equi-joins, a
range (theta) join, and an as-of join (SURVEY.md §2.6 "Joins").

Scale notes:
  * Dim sides are ``broadcast()``-hinted whenever bounded (nation/region:
    fixed cardinality; order-date dimension: bounded by calendar days) so
    the fact side never shuffles for them.
  * The as-of join avoids the classic single-partition global sort: the
    right side (distinct order dates) is bounded, so it folds into ONE
    broadcast array row and each event does a vectorized JVM-side
    ``filter → element_at(-1)`` probe. For an unbounded right side the
    pattern generalizes to a range-bucketed sort-merge join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from trike_spark import cache
from trike_spark.io import load_table
from trike_spark.queries.dedup import _sql_h60
from trike_spark.registry import register


@register(
    "join_inner_big_orders",
    """
    SELECT o_orderkey, c_name, n_name, o_totalprice
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_totalprice > 400000
    """,
    doc="Inner equi-join, row-level output; selective filter pushed to the fact scan.",
)
def join_inner_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("o_orderkey", "c_name", "n_name", "o_totalprice")
    )


@register(
    "join_left_order_counts",
    """
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
    doc="Left outer join preserving order-less customers (count = 0).",
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_right_orders_customer",
    """
    SELECT c_custkey, c_acctbal, o_orderkey, o_totalprice
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal < -900
    """,
    doc="Right outer join: all low-balance customers, order cols null when absent.",
)
def join_right_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < -900)
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "right").select(
        "c_custkey", "c_acctbal", "o_orderkey", "o_totalprice"
    )


@register(
    "join_full_nation_presence",
    """
    SELECT COALESCE(c.nk, s.nk) AS nationkey, c.n_cust, s.n_supp
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
    FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
      ON c.nk = s.nk
    """,
    doc="Full outer join over two aggregates; null-filled on either side.",
)
def join_full_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.nk == s.nk, "full").select(
        F.coalesce(c.nk, s.nk).alias("nationkey"), "n_cust", "n_supp"
    )


@register(
    "join_semi_active_customers",
    """
    SELECT c_custkey, c_name, c_acctbal FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    doc="Left-semi join (EXISTS): customers with at least one big order.",
)
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "join_anti_inactive_customers",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join (NOT EXISTS): customers with no orders at all.",
)
def join_anti_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_cross_region_pairs",
    """
    SELECT a.r_name AS r1, b.r_name AS r2
    FROM region a CROSS JOIN region b
    WHERE a.r_name < b.r_name
    """,
    doc="Cross join of a bounded dim with dedup predicate (unordered pairs).",
)
def join_cross_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("r1"))
    b = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("r2"))
    return a.crossJoin(broadcast(b)).filter(F.col("r1") < F.col("r2"))


@register(
    "join_range_acctbal_band",
    """
    SELECT s_suppkey, COUNT(*) AS n_similar
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey
     AND c_acctbal BETWEEN s_acctbal - 500 AND s_acctbal + 500
    GROUP BY s_suppkey
    """,
    doc="Theta join: equi key + range band predicate (customers with similar balance in same nation).",
)
def join_range_acctbal_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return (
        s.join(
            c,
            (s.s_nationkey == c.c_nationkey)
            & (c.c_acctbal >= s.s_acctbal - 500)
            & (c.c_acctbal <= s.s_acctbal + 500),
        )
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_similar"))
    )


@register(
    "join_asof_event_order",
    """
    WITH od AS (SELECT o_orderdate, MAX(o_orderkey) AS asof_orderkey
                FROM orders GROUP BY o_orderdate)
    SELECT e.event_id, e.ts, od.o_orderdate AS asof_orderdate, od.asof_orderkey
    FROM events e ASOF JOIN od ON e.ts >= od.o_orderdate
    """,
    doc="As-of join: each event matched to the latest order date <= ts.",
)
def join_asof_event_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (nearest-predecessor) join, Spark-first and scale-first.

    Plan shape: the right side (distinct order dates — bounded by the
    calendar, independent of fact scale) is bucketed BY MONTH into a tiny
    dimension: each month carries (a) its own sorted (date, key) entries
    (≤ 31) and (b) the latest entry of all strictly-earlier months
    (cumulative fill over a month spine, so empty months inherit).
    Events broadcast-hash-join on their (clamped) month and probe at most
    31 structs — no shuffle of the event stream, no global sort, and the
    probe is evaluated once behind a generate barrier (project collapse
    would otherwise inline the higher-order filter into every field
    reference).
    """
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")

    od = orders.groupBy("o_orderdate").agg(F.max("o_orderkey").alias("asof_orderkey"))
    buckets = (
        od.withColumn("m", F.date_trunc("month", F.col("o_orderdate")))
        .groupBy("m")
        .agg(F.sort_array(F.collect_list(F.struct("o_orderdate", "asof_orderkey"))).alias("entries"))
    )
    bounds = od.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("mn"),
        F.date_trunc("month", F.max("o_orderdate")).alias("mx"),
    )
    # gap-free month spine; single-partition window is fine — the spine is
    # a bounded dimension (#months), never fact-sized
    spine = bounds.select(
        F.explode(F.sequence(F.col("mn"), F.col("mx"), F.expr("interval 1 month"))).alias("m")
    )
    from pyspark.sql import Window

    w_prev = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, -1)
    monthly = (
        spine.join(buckets, "m", "left")
        .withColumn("prev_cum", F.max(F.element_at("entries", -1)).over(w_prev))
    )

    ev = (
        events.select("event_id", "ts", F.date_trunc("month", "ts").alias("em"))
        .crossJoin(broadcast(bounds.select("mx")))
        .withColumn("m", F.least("em", "mx"))
    )
    probe = F.coalesce(
        F.element_at(F.filter(F.col("entries"), lambda e: e["o_orderdate"] <= F.col("ts")), -1),
        F.col("prev_cum"),
    )
    return (
        ev.join(broadcast(monthly), "m", "left")
        # explode(array(x)) = 1:1 generate barrier → probe evaluated once
        .select("event_id", "ts", F.explode(F.array(probe)).alias("mm"))
        .select(
            "event_id",
            "ts",
            F.col("mm.o_orderdate").alias("asof_orderdate"),
            F.col("mm.asof_orderkey").alias("asof_orderkey"),
        )
    )


@register(
    "join_salted_segment_revenue",
    f"""
    SELECT c_mktsegment, COUNT(*) AS n_orders,
           {{dsum}} AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """.format(dsum="CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,4))), 2) AS DOUBLE)"),
    doc="Skew-salted equi-join face: hot customer keys spread over 8 salts; "
    "result identical to the plain join (salting is physical, not logical).",
)
def join_salted_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable face of ``operators/skew.py::salted_join``: orders
    (the large, potentially key-skewed side) joins customer through a
    salted (key, salt) equi-join — each hot o_custkey spreads over 8
    tasks; customer is replicated x8 via a narrow literal explode. The
    oracle is the PLAIN join: salting must never change the result set,
    which is exactly what the driver hash proves."""
    from trike_spark.operators.skew import salted_join
    from trike_spark.queries._util import dsum

    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join(orders, cust, key="o_custkey", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


# --- runtime-filter (Bloom) prefiltered join --------------------------------

M_BLOOM_BITS = 1 << 16  # bitset size (fits in 1024 64-bit words)
K_BLOOM_SEEDS = 3  # hash functions


@register(
    "join_bloom_prefilter_revenue",
    """
    SELECT c_custkey, c_name, COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,4))), 2) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal > 9000
    GROUP BY c_custkey, c_name
    """,
    doc=(
        "Join preceded by an explicit Bloom runtime filter built from the "
        "selective dim side; false positives removed by the exact join, so "
        "output equals the plain join."
    ),
)
def join_bloom_prefilter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The runtime-filter pattern made explicit: build a Bloom bitset over
    the selective dimension's keys (k=3 xxhash64 probes into a 2^16-bit
    array, OR-folded into ≤1024 64-bit words, then into ONE broadcast map
    row), prefilter the fact scan with it, and only then run the exact
    join — which removes Bloom false positives, so the result is
    bit-identical to the unfiltered join.

    At 100 TB this is the difference between shuffling every fact row and
    shuffling only the ~10% that can possibly match: the Bloom probe is a
    narrow JVM-side expression evaluated at scan time, BEFORE the exchange.
    Spark 3.3+ can inject this automatically
    (spark.sql.optimizer.runtime.bloomFilter.enabled); doing it manually
    keeps the plan shape visible and works when the optimizer's
    heuristics decline (e.g. a pre-aggregated build side). The map is
    bounded at 8 KiB regardless of dim cardinality — it is the bitset,
    not the key set, that ships."""
    from trike_spark.queries._util import dsum

    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    orders = load_table(spark, sf_dir, "orders")

    def _positions(key: Column) -> list[Column]:
        return [
            F.pmod(F.xxhash64(key, F.lit(s)), F.lit(M_BLOOM_BITS))
            for s in range(K_BLOOM_SEEDS)
        ]

    # Build: key → k bit positions → per-word OR-fold → one map<word,mask> row.
    bits = cust.select(
        F.explode(F.array(*_positions(F.col("c_custkey")))).alias("pos")
    )
    words = bits.select(
        F.expr("pos div 64").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
    ).groupBy("word").agg(F.bit_or("bit").alias("mask"))
    bloom = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "mask"))).alias("bloom")
    )

    # Probe: all k bits must be set; a missing word means bit unset.
    probed = orders.crossJoin(broadcast(bloom))
    hit = F.lit(True)
    for s in range(K_BLOOM_SEEDS):
        mask = F.coalesce(
            F.element_at(
                F.col("bloom"),
                F.expr(
                    f"CAST(pmod(xxhash64(o_custkey, {s}), {M_BLOOM_BITS})"
                    " div 64 AS BIGINT)"
                ),
            ),
            F.lit(0).cast("long"),
        )
        bit = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(xxhash64(o_custkey, {s}), {M_BLOOM_BITS}) % 64 AS INT))"
        )
        hit = hit & ((mask.bitwiseAND(bit)) != 0)
    prefiltered = probed.filter(hit).drop("bloom")

    # Exact join clears false positives; dim side is broadcast.
    return (
        prefiltered.join(broadcast(cust), prefiltered.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("revenue"))
    )


# --- keyless point-in-interval join via time-bin bucketing ------------------

IVB_BIN_US = 30 * 60 * 1_000_000  # 30-min bins ~ the 40-min interval length


@register(
    "join_interval_binned",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n FROM events GROUP BY 1),
    tot AS (SELECT SUM(n) AS t, COUNT(*) AS hh FROM hourly),
    heavy AS (SELECT h FROM hourly, tot WHERE n * hh * 5 >= 6 * t),
    iv AS (SELECT h + INTERVAL 5 MINUTE AS w_start,
                  h + INTERVAL 45 MINUTE AS w_end FROM heavy)
    SELECT iv.w_start, COUNT(*) AS n_points,
           COUNT(DISTINCT e.user_id) AS n_users,
           CAST(ROUND(SUM(CAST(e.value AS DECIMAL(38,4))), 4) AS DOUBLE)
             AS total_value
    FROM iv JOIN events e ON e.ts >= iv.w_start AND e.ts < iv.w_end
    GROUP BY 1
    ORDER BY 1
    """,
    doc=(
        "Keyless point-in-interval join (events into derived heavy-traffic "
        "windows) executed as a hash join on 30-min time bins + residual "
        "containment — no BroadcastNestedLoopJoin at any scale."
    ),
)
def join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The range-join-without-a-key shape, solved by bin bucketing
    (:mod:`trike_spark.operators.interval_bin`): intervals are the
    heavy-traffic windows [hour+5min, hour+45min) of hours whose event
    count is ≥ 1.2× the mean (the threshold compare is integer-exact:
    n·H·5 ≥ 6·T). A naive plan for `ts BETWEEN w_start AND w_end` with no
    equality column is BNLJ — O(|events|·|windows|). Here both sides get
    a manufactured 30-min bin key (each 40-min interval explodes onto ≤ 3
    bins), the join is an ordinary shuffled hash join on the bin, and the
    containment predicate runs as a residual — linear in events + exploded
    intervals, AQE-splittable if some bin is bursty. The aggregation then
    keys on the window start. Oracle is the PLAIN inequality join: binning
    must be invisible in the result."""
    from trike_spark.operators.interval_bin import bin_interval_join
    from trike_spark.queries._util import dsum

    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = hourly.agg(F.sum("n").alias("t"), F.count(F.lit(1)).alias("hh"))
    heavy = hourly.crossJoin(broadcast(tot)).filter(
        F.col("n") * F.col("hh") * 5 >= 6 * F.col("t")
    )
    iv = heavy.select(
        (F.col("h") + F.expr("INTERVAL 5 MINUTES")).alias("w_start"),
        (F.col("h") + F.expr("INTERVAL 45 MINUTES")).alias("w_end"),
    )
    pts = e.select("ts", "user_id", "value")
    joined = bin_interval_join(pts, iv, "ts", "w_start", "w_end", IVB_BIN_US)
    return (
        joined.groupBy("w_start")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value", 4).alias("total_value"),
        )
        .orderBy("w_start")
    )


@register(
    "join_asof_forward_order_ship",
    """
    WITH sd AS (SELECT l_shipdate, MIN(l_orderkey) AS asof_shipkey
                FROM lineitem GROUP BY l_shipdate)
    SELECT o.o_orderkey, o.o_orderdate,
           sd.l_shipdate AS next_shipdate, sd.asof_shipkey
    FROM orders o ASOF JOIN sd ON o.o_orderdate <= sd.l_shipdate
    """,
    doc="Forward as-of join: each order matched to the EARLIEST ship date >= its order date.",
)
def join_asof_forward_order_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nearest-successor twin of ``join_asof_event_order`` — 'what is
    the next scheduled event at or after t' (next shipment, next
    maintenance window, next market open). Same month-bucketed plan,
    mirrored: each month holds its own ascending (date, key) entries plus
    the EARLIEST entry of all strictly-later months (reverse cumulative
    fill over the month spine); orders broadcast-hash-join on their
    (clamped) month and probe the first entry >= their date. Inner as-of
    semantics: orders past the last ship date drop, exactly as DuckDB's
    ASOF JOIN drops them."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    sd = li.groupBy("l_shipdate").agg(F.min("l_orderkey").alias("asof_shipkey"))
    buckets = (
        sd.withColumn("m", F.date_trunc("month", F.col("l_shipdate")))
        .groupBy("m")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("l_shipdate", "asof_shipkey"))
            ).alias("entries")
        )
    )
    bounds = sd.agg(
        F.date_trunc("month", F.min("l_shipdate")).alias("mn"),
        F.date_trunc("month", F.max("l_shipdate")).alias("mx"),
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("mn"), F.col("mx"), F.expr("interval 1 month"))).alias("m")
    )
    # reverse cumulative fill: a month inherits the earliest entry of all
    # LATER months, so an order whose own month has no later shipment
    # still finds its successor
    w_next = Window.orderBy("m").rowsBetween(1, Window.unboundedFollowing)
    monthly = (
        spine.join(buckets, "m", "left")
        .withColumn("next_cum", F.min(F.element_at("entries", 1)).over(w_next))
    )

    ov = (
        orders.select("o_orderkey", "o_orderdate", F.date_trunc("month", "o_orderdate").alias("om"))
        .crossJoin(broadcast(bounds.select("mn")))
        .withColumn("m", F.greatest("om", "mn"))
    )
    # try_element_at: the filtered array is EMPTY (not null) when every
    # entry in the month precedes the order date — plain element_at throws
    # under ANSI; try_ returns NULL so the coalesce falls through to the
    # later-months fill
    probe = F.coalesce(
        F.try_element_at(
            F.filter(F.col("entries"), lambda e: e["l_shipdate"] >= F.col("o_orderdate")), F.lit(1)
        ),
        F.col("next_cum"),
    )
    return (
        ov.join(broadcast(monthly), "m", "left")
        # explode(array(x)) = 1:1 generate barrier → probe evaluated once
        .select("o_orderkey", "o_orderdate", F.explode(F.array(probe)).alias("mm"))
        .filter(F.col("mm").isNotNull())  # inner as-of: no successor → drop
        .select(
            "o_orderkey",
            "o_orderdate",
            F.col("mm.l_shipdate").alias("next_shipdate"),
            F.col("mm.asof_shipkey").alias("asof_shipkey"),
        )
    )


@register(
    "join_nearest_acctbal",
    """
    WITH s AS (SELECT s_suppkey AS id, s_acctbal AS bal, 1 AS is_s FROM supplier),
    c AS (SELECT c_custkey AS id, c_acctbal AS bal, 0 AS is_s FROM customer),
    u AS (SELECT * FROM s UNION ALL SELECT * FROM c),
    ordered AS (
      SELECT id, bal, is_s,
             LAST_VALUE(CASE WHEN is_s = 0 THEN id END IGNORE NULLS)
               OVER (ORDER BY bal, is_s, id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_c,
             LAST_VALUE(CASE WHEN is_s = 0 THEN bal END IGNORE NULLS)
               OVER (ORDER BY bal, is_s, id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_b,
             FIRST_VALUE(CASE WHEN is_s = 0 THEN id END IGNORE NULLS)
               OVER (ORDER BY bal, is_s, id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_c,
             FIRST_VALUE(CASE WHEN is_s = 0 THEN bal END IGNORE NULLS)
               OVER (ORDER BY bal, is_s, id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_b
      FROM u)
    SELECT id AS s_suppkey, bal AS s_acctbal,
           CASE WHEN next_c IS NULL THEN prev_c
                WHEN prev_c IS NULL THEN next_c
                WHEN ABS(bal - prev_b) < ABS(next_b - bal) THEN prev_c
                WHEN ABS(next_b - bal) < ABS(bal - prev_b) THEN next_c
                ELSE LEAST(prev_c, next_c) END AS nearest_custkey,
           ROUND(LEAST(COALESCE(ABS(bal - prev_b), 1e18),
                       COALESCE(ABS(next_b - bal), 1e18)), 2) AS distance
    FROM ordered WHERE is_s = 1
    """,
    doc=(
        "Nearest-value (1-NN) join via sort-merge adjacency: each supplier "
        "matched to the customer with the closest account balance — one "
        "sort, zero band joins."
    ),
)
def join_nearest_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar 1-nearest-neighbor join done the distributed-sort way: tag
    and UNION both sides, sort once on the value, and each probe row's
    nearest match is whichever of its closest build-side predecessor /
    successor is nearer. A naive formulation is a band join with a
    per-row argmin (quadratic in band occupancy); the sort-merge form is
    ONE range-partitioned sort plus two running IGNORE NULLS window
    fills — the same trick that scales as-of joins, applied to an
    unordered value domain. Ties break toward the smaller customer key,
    so the match is total-order deterministic.

    Scale shape: the running IGNORE NULLS fills execute BANDED
    (``operators/banded.banded_fill``): the union range-partitions into
    balance bands, per-band boundary customers fold to a broadcast
    band-stats fill, and each row coalesces its within-band exclusive
    fill with the earlier-bands offset — the 'range-partition with
    boundary overlap' split the docstring used to footnote, now the
    executed plan."""
    from trike_spark.operators.banded import banded_fills

    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"), F.col("s_acctbal").alias("bal"), F.lit(1).alias("is_s")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_acctbal").alias("bal"), F.lit(0).alias("is_s")
    )
    u = s.unionAll(c)
    order = [F.col("bal"), F.col("is_s"), F.col("id")]
    band = F.floor(F.col("bal") / 100)
    cust = F.when(F.col("is_s") == 0, F.struct(F.col("id"), F.col("bal")))
    ordered = banded_fills(
        u, band, order, [(cust, "_prev", "prev"), (cust, "_next", "next")]
    ).select(
        "id",
        "bal",
        "is_s",
        F.col("_prev.id").alias("prev_c"),
        F.col("_prev.bal").alias("prev_b"),
        F.col("_next.id").alias("next_c"),
        F.col("_next.bal").alias("next_b"),
    )
    prev_d = F.abs(F.col("bal") - F.col("prev_b"))
    next_d = F.abs(F.col("next_b") - F.col("bal"))
    nearest = (
        F.when(F.col("next_c").isNull(), F.col("prev_c"))
        .when(F.col("prev_c").isNull(), F.col("next_c"))
        .when(prev_d < next_d, F.col("prev_c"))
        .when(next_d < prev_d, F.col("next_c"))
        .otherwise(F.least("prev_c", "next_c"))
    )
    dist = F.least(
        F.coalesce(prev_d, F.lit(1e18)), F.coalesce(next_d, F.lit(1e18))
    )
    return (
        ordered.filter(F.col("is_s") == 1)
        .select(
            F.col("id").alias("s_suppkey"),
            F.col("bal").alias("s_acctbal"),
            nearest.alias("nearest_custkey"),
            F.round(dist, 2).alias("distance"),
        )
    )


@register(
    "join_skyline_suppliers",
    """
    WITH m AS (
      SELECT s.s_suppkey, s.s_acctbal,
             COUNT(DISTINCT l.l_partkey) AS n_parts
      FROM supplier s JOIN lineitem l ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_suppkey, s.s_acctbal),
    ranked AS (
      SELECT s_suppkey, s_acctbal, n_parts,
             MAX(n_parts) OVER (ORDER BY s_acctbal DESC, s_suppkey
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS best_parts_above
      FROM m)
    SELECT s_suppkey, s_acctbal, CAST(n_parts AS BIGINT) AS n_parts
    FROM ranked
    WHERE best_parts_above IS NULL OR n_parts > best_parts_above
    """,
    doc=(
        "2-D skyline (Pareto frontier): suppliers not dominated on "
        "(acctbal, distinct parts supplied) — sort one dim, running-max "
        "the other."
    ),
)
def join_skyline_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skyline/Pareto-frontier operator (multi-criteria shortlisting:
    'no other supplier is at least as rich AND supplies more parts').
    The textbook nested-loop dominance test is O(n²); the sort-based form
    is the classic O(n log n) reduction — order by dim-1 descending, keep
    a row iff its dim-2 beats the running max of everything ranked above
    it. Strictly-dominated rows drop; ties on acctbal resolve through the
    total order (suppkey), matching the window frame exactly in both
    engines.

    Scale shape: the metric build is one keyed aggregation; the frontier
    pass is the exclusive running max over dim-1 order, run BANDED
    (``operators/banded.banded_cummax(inclusive=False)``): acctbal bands
    range-partition dim-1, per-band maxima fold to broadcast prefix
    offsets, and the per-row exclusive max is
    greatest(within-band-exclusive, earlier-bands) — the standard
    distributed-skyline split, executed rather than footnoted."""
    from trike_spark.operators.banded import banded_cummax

    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    m = (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .groupBy("s_suppkey", "s_acctbal")
        .agg(F.countDistinct("l_partkey").alias("n_parts"))
    )
    ranked = banded_cummax(
        m,
        -F.floor(F.col("s_acctbal") / 100),
        [F.col("s_acctbal").desc(), F.col("s_suppkey")],
        "n_parts",
        "best_parts_above",
        inclusive=False,
    )
    return (
        ranked.filter(
            F.col("best_parts_above").isNull()
            | (F.col("n_parts") > F.col("best_parts_above"))
        )
        .select("s_suppkey", "s_acctbal", F.col("n_parts").cast("bigint").alias("n_parts"))
    )


@register(
    "join_top_order_max_by",
    """
    SELECT o_custkey AS custkey,
           MAX(struct_pack(p := o_totalprice, k := o_orderkey)).k AS top_orderkey,
           MAX(o_totalprice) AS top_price
    FROM orders GROUP BY o_custkey
    """,
    doc=(
        "Top-1-per-group via arg_max/max_by — the single-pass aggregate "
        "form of the row_number()=1 window (one shuffle, no sort)."
    ),
)
def join_top_order_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cheaper plan for 'each customer's biggest order': max_by folds
    to one (key, argmax-state) pair per group BEFORE the exchange
    (partial_max_by, plan-asserted), so the shuffle carries group-sized
    state where the row_number()=1 window shuffles every raw row and
    sorts it by (key, price). Spark executes the struct-ordered buffer as
    SortAggregate — its group-key sorts run over the already-reduced
    partial state, the cheap side of the trade. At 100 TB this is the
    difference between a combine-style agg and a full-data sort window
    for the most common top-1 question. Ties break toward the larger
    orderkey via the (price, key) comparison struct — pinned identically
    in Spark's max_by struct ordering and DuckDB's lexicographic struct
    MAX."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max_by(
            "o_orderkey", F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
        ).alias("top_orderkey"),
        F.max("o_totalprice").alias("top_price"),
    )


ASOF_TOL_DAYS = 14


@register(
    "join_asof_tolerance",
    f"""
    WITH sd AS (SELECT l_shipdate, MIN(l_orderkey) AS asof_shipkey
                FROM lineitem GROUP BY l_shipdate),
    m AS (
      SELECT o.o_orderkey, o.o_orderdate, sd.l_shipdate, sd.asof_shipkey
      FROM orders o ASOF LEFT JOIN sd ON o.o_orderdate <= sd.l_shipdate)
    SELECT o_orderkey, o_orderdate,
           CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= {ASOF_TOL_DAYS}
                THEN l_shipdate END AS next_shipdate,
           CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= {ASOF_TOL_DAYS}
                THEN asof_shipkey END AS asof_shipkey,
           COALESCE(date_diff('day', o_orderdate, l_shipdate) <= {ASOF_TOL_DAYS},
                    FALSE) AS matched
    FROM m
    """,
    doc=(
        f"As-of join with a staleness tolerance: nearest successor within "
        f"{ASOF_TOL_DAYS} days or an explicit NULL row — LEFT semantics, "
        "the bounded-lookup variant every feature join needs."
    ),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of (pandas ``merge_asof(tolerance=...)``): a
    match farther than {ASOF_TOL_DAYS} days is WORSE than no match — a
    feature that stale would poison a training row, a 'next shipment'
    that late means the answer is really 'none scheduled'. LEFT
    semantics: every order keeps its row; beyond-tolerance matches null
    out with an explicit matched=false flag (so downstream can count
    coverage, the number that decides whether the tolerance is viable).

    Execution: the inner as-of face provides nearest-successor matches
    (same month-bucketed broadcast plan); a left join back to orders
    restores unmatched rows; the tolerance test is exact integer date
    arithmetic. Zero new shuffles beyond the as-of machinery itself."""
    inner = join_asof_forward_order_ship(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    within = F.datediff(F.col("next_shipdate"), F.col("o_orderdate")) <= ASOF_TOL_DAYS
    tol = inner.select(
        "o_orderkey",
        F.when(within, F.col("next_shipdate")).alias("m_shipdate"),
        F.when(within, F.col("asof_shipkey")).alias("m_shipkey"),
        within.alias("m_flag"),
    )
    return orders.join(tol, "o_orderkey", "left").select(
        "o_orderkey",
        "o_orderdate",
        F.col("m_shipdate").alias("next_shipdate"),
        F.col("m_shipkey").alias("asof_shipkey"),
        F.coalesce(F.col("m_flag"), F.lit(False)).alias("matched"),
    )


@register(
    "join_exists_flag_mark",
    """
    SELECT c.c_custkey, c.c_mktsegment,
           EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                   AND o.o_totalprice > 200000) AS has_big_order
    FROM customer c
    """,
    doc=(
        "EXISTS as a projected flag (the MARK join): every customer keeps "
        "a row, the subquery becomes a boolean column — not a semi/anti "
        "filter."
    ),
)
def join_exists_flag_mark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third EXISTS execution shape next to semi (keep matches) and
    anti (keep non-matches): keep EVERYTHING and project the existence
    test as a column — what DuckDB compiles to a MARK join. Spark has no
    mark-join operator; the equivalent plan is a left join against the
    DISTINCT matching key set with a null-test flag — same one shuffle a
    semi join pays, and the distinct keeps the build side key-sized.
    Feature engineering uses this constantly ('has the user ever X') —
    as a filter it loses the negative rows a model needs.

    Scale shape: the filtered orders scan reduces to distinct custkeys
    (key-sized, broadcastable); customers left-join it; flag = key
    found. Pushdown carries the price predicate into the orders scan."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load_table(spark, sf_dir, "orders")
    big = (
        o.filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("has_big_order", F.lit(True))
    )
    return c.join(broadcast(big), "c_custkey", "left").select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce(F.col("has_big_order"), F.lit(False)).alias("has_big_order"),
    )


@register(
    "join_null_safe_eq",
    """
    WITH c AS (
      SELECT c_custkey, nullif(c_nationkey % 5, 0) AS grp FROM customer),
    s AS (
      SELECT s_suppkey, nullif(s_nationkey % 5, 0) AS grp FROM supplier)
    SELECT c.grp, COUNT(*) AS n_pairs,
           CAST(MIN(c_custkey) AS BIGINT) AS min_cust,
           CAST(MIN(s_suppkey) AS BIGINT) AS min_supp
    FROM c JOIN s ON c.grp IS NOT DISTINCT FROM s.grp
    GROUP BY c.grp
    """,
    doc=(
        "Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys match "
        "each other instead of silently dropping — the join semantics "
        "sentinel-free dimension keys need."
    ),
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain equality drops every NULL-keyed row from a join (NULL = NULL
    is NULL); null-safe equality (`<=>`, SQL's IS NOT DISTINCT FROM)
    treats NULL as a value that matches itself — the correct semantics
    when NULL means 'uncategorized bucket' rather than 'unknown'. Here a
    fifth of each side's keys are nulled (nullif on key%5) and the
    null-null pair group survives, countable next to the others.

    Scale note: Spark executes `<=>` as an ordinary hash join (the
    null-safe comparison is hashable), NOT a nested loop — the plan is
    the same shuffled equi-join as `=`; all NULL keys land in one hash
    bucket, so a null-heavy key column is a skew key like any other
    (salt it if hot)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("grp")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("sgrp")
    )
    return (
        c.join(s, c.grp.eqNullSafe(s.sgrp))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("c_custkey").cast("bigint").alias("min_cust"),
            F.min("s_suppkey").cast("bigint").alias("min_supp"),
        )
    )


@register(
    "join_lateral_top2_orders",
    """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c.c_mktsegment = 'BUILDING'
    """,
    doc=(
        "LATERAL correlated top-N: each customer's two largest orders via "
        "a per-row subquery — the SQL-standard spelling Spark decorrelates "
        "into a ranked window, not a nested loop."
    ),
)
def join_lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LATERAL join surface (SQL:1999 correlated derived table): 'for
    each row, run this subquery' — the natural spelling of per-entity
    top-N that application developers reach for first. Spark's optimizer
    DECORRELATES it (DecorrelateInnerQuery): the per-customer ORDER BY
    ... LIMIT 2 becomes a rank-filtered window over one orders shuffle,
    so the executed plan is the same as the hand-written window face
    (sort_topk_parts_per_brand) — the point being that the intuitive
    spelling and the scalable plan are the same thing here.

    Executed through ``spark.sql`` over the registered views — the SQL
    entry path the DataFrame faces don't otherwise exercise."""
    from trike_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


# --- grid-bucketed spatial radius join ----------------------------------------------

GEO_SIDE_M = 1_000_000  # synthetic 1000 km x 1000 km plane, meter resolution
GEO_R_M = 10_000  # radius: 10 km


@register(
    "join_spatial_grid_radius",
    f"""
    WITH pts AS (
      SELECT c_custkey AS id,
             {_sql_h60("'x' || CAST(c_custkey AS VARCHAR)")} % {GEO_SIDE_M}
               AS x,
             {_sql_h60("'y' || CAST(c_custkey AS VARCHAR)")} % {GEO_SIDE_M}
               AS y
      FROM customer),
    cells AS (SELECT id, x, y, x // {GEO_R_M} AS cx, y // {GEO_R_M} AS cy
              FROM pts),
    probe AS (
      SELECT id, x, y, cx + dx.dx AS cx, cy + dy.dy AS cy
      FROM cells,
           (SELECT unnest([-1, 0, 1]) AS dx) dx,
           (SELECT unnest([-1, 0, 1]) AS dy) dy)
    SELECT a.id AS cust_a, b.id AS cust_b,
           CAST((a.x - b.x) * (a.x - b.x)
                + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist_sq_m2
    FROM probe a JOIN cells b
      ON a.cx = b.cx AND a.cy = b.cy AND a.id < b.id
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          <= {GEO_R_M} * {GEO_R_M}
    """,
    doc=(
        f"Grid-bucketed spatial radius join: points on a synthetic "
        f"{GEO_SIDE_M // 1000} km plane, {GEO_R_M // 1000} km-cell grid, "
        "3×3-neighbor probe explode, integer d² ≤ R² verify — the "
        "distributed spatial join without a Cartesian product and "
        "without a float in the cut."
    ),
)
def join_spatial_grid_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard distributed answer to 'all pairs within radius R':
    bucket space into R-sized cells so any qualifying pair is at most
    one cell apart, explode ONE side into its 3×3 cell neighborhood, and
    equi-join on the cell key — the quadratic all-pairs becomes a hash
    join whose cost tracks cell occupancy (this is the same
    manufactured-equi-key move as the binned interval join, in 2-D).
    Coordinates are synthetic meters hashed from the customer key;
    real deployments swap in projected coordinates or a geohash and keep
    the identical plan.

    Determinism: coordinates, cells and the d² ≤ R² verification are all
    BIGINT arithmetic — no sqrt, no trig, no float anywhere, so the
    result hash-matches with zero tolerance games (report dist² and take
    the root client-side if needed).

    Scale shape: the 9× probe explode is the only fan-out (constant
    factor); the join is hash-partitioned on cell ids; skewed cells
    (urban hotspots in real data) are ordinary AQE-splittable join skew,
    with the LSH hot-bucket grid split as the documented remedy beyond
    that. No CartesianProduct in the plan (suite-wide lint asserts)."""
    from trike_spark.queries.dedup import _h60

    c = load_table(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (_h60(F.concat(F.lit("x"), F.col("c_custkey").cast("string"))) % GEO_SIDE_M).alias("x"),
        (_h60(F.concat(F.lit("y"), F.col("c_custkey").cast("string"))) % GEO_SIDE_M).alias("y"),
    )
    cells = pts.select(
        "id", "x", "y",
        F.expr(f"x div {GEO_R_M}").alias("cx"),
        F.expr(f"y div {GEO_R_M}").alias("cy"),
    )
    cells = cache.checkpoint(cells)
    probe = (
        cells.select(
            "id", "x", "y", "cx", "cy",
            F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dx"),
        )
        .select(
            "id", "x", "y",
            (F.col("cx") + F.col("dx")).alias("cx"), "cy",
            F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("dy"),
        )
        .select("id", "x", "y", "cx", (F.col("cy") + F.col("dy")).alias("cy"))
    )
    a, b = probe.alias("a"), cells.alias("b")
    d2 = (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x")) + (
        F.col("a.y") - F.col("b.y")
    ) * (F.col("a.y") - F.col("b.y"))
    return (
        a.join(
            b,
            (F.col("a.cx") == F.col("b.cx"))
            & (F.col("a.cy") == F.col("b.cy"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(d2 <= GEO_R_M * GEO_R_M)
        .select(
            F.col("a.id").alias("cust_a"),
            F.col("b.id").alias("cust_b"),
            d2.cast("bigint").alias("dist_sq_m2"),
        )
    )
