"""Headline relational queries (TPC-H-shaped) — scan + filter + multi-join +
aggregate + sort, the core batch surface (SURVEY.md §2.6 rows 1-9).

Scale notes (100 TB posture):
  * Dimension tables (region/nation/customer/supplier/part) are broadcast —
    explicitly hinted where we know cardinality, so the fact-table scan
    never shuffles for the dim joins.
  * Date-range filters sit directly on the scan so Catalyst pushes them into
    the parquet reader (PushedFilters) and prunes row groups.
  * Aggregations are expressed as groupBy().agg() → Catalyst plans partial
    (map-side) aggregation before the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from trike_spark.io import load_table
from trike_spark.queries._util import DECMUL, mdec
from trike_spark.registry import register


def _disc_price() -> F.Column:
    # exact decimal: l_extendedprice * (1 - l_discount)
    return mdec("l_extendedprice") * (F.lit(1).cast(DECMUL) - mdec("l_discount"))


_SQL_DISC = "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"
_SQL_CHARGE = f"{_SQL_DISC} * (1 + CAST(l_tax AS DECIMAL(18,4)))"


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM({_SQL_DISC}), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM({_SQL_CHARGE}), 2) AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1: scan-heavy single-pass aggregate; partial agg before one shuffle.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal-EXACT result without per-row decimal arithmetic.

    The straightforward form (SUM over decimal(18,4) products, the
    oracle's text) pays BigDecimal adds per row — measured 1.9 s at
    sf0.1 vs 0.4 s for the same plan over doubles, entirely accumulator
    cost. TPC-H money columns have ≤2 fraction digits, so every product
    is exact in SCALED LONGS instead: p2 = price·100, d2 = disc·100,
    t2 = tax·100 → disc_price·10⁴ = p2·(100−d2) and charge·10⁶ =
    p2·(100−d2)·(100+t2) are exact integers computed in 64-bit math
    inside whole-stage codegen.

    A single long SUM would overflow at warehouse scale (charge·10⁶ ≤
    1.1e11 per row; long caps at 9.2e18 ≈ 6e11-row sums), so each
    measure accumulates as a SPLIT PAIR — sum(v div 10⁶) and
    sum(v % 10⁶) — and recombines per GROUP as decimal hi·10⁶ + lo.
    Worst-case audit at ~100 TB (6e11 lineitem rows): lo ≤ 10⁶/row →
    6e17; hi ≤ 1.1e5/row → 6.6e16; both fit with ≥10× margin. Decimal
    appears only in the 4-row post-aggregation scale shift, so the
    result is bit-identical to the oracle's decimal fold (same exact
    rational, same ROUND, same decimal→double conversion — certified by
    the driver hash), at measured ~1.9× the throughput."""
    M = 1_000_000
    li = load_table(spark, sf_dir, "lineitem")
    f = (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            F.round(F.col("l_quantity") * 100).cast("long").alias("q2"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("p2"),
            F.round(F.col("l_discount") * 100).cast("long").alias("d2"),
            F.round(F.col("l_tax") * 100).cast("long").alias("t2"),
        )
        .withColumn("disc4", F.col("p2") * (100 - F.col("d2")))
        .withColumn("chg6", F.col("disc4") * (100 + F.col("t2")))
    )
    g = f.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("q2").alias("sq2"),
        F.sum(F.expr(f"p2 div {M}")).alias("p_hi"),
        F.sum(F.expr(f"p2 % {M}")).alias("p_lo"),
        F.sum("d2").alias("sd2"),
        F.sum(F.expr(f"disc4 div {M}")).alias("disc_hi"),
        F.sum(F.expr(f"disc4 % {M}")).alias("disc_lo"),
        F.sum(F.expr(f"chg6 div {M}")).alias("chg_hi"),
        F.sum(F.expr(f"chg6 % {M}")).alias("chg_lo"),
        F.count(F.lit(1)).alias("count_order"),
    )
    dec = "decimal(38,6)"

    def _exact(hi: str, lo: str, scale_pow: int) -> Column:
        return (F.col(hi).cast(dec) * M + F.col(lo).cast(dec)) / F.lit(10**scale_pow)

    sum_qty = F.col("sq2").cast(dec) / 100
    sum_price = _exact("p_hi", "p_lo", 2)
    sum_disc = F.col("sd2").cast(dec) / 100
    n = F.col("count_order")
    return g.select(
        "l_returnflag",
        "l_linestatus",
        F.round(sum_qty, 2).cast("double").alias("sum_qty"),
        F.round(sum_price, 2).cast("double").alias("sum_base_price"),
        F.round(_exact("disc_hi", "disc_lo", 4), 2).cast("double").alias("sum_disc_price"),
        F.round(_exact("chg_hi", "chg_lo", 6), 2).cast("double").alias("sum_charge"),
        # avg = double-division of the exact sum by the count, then round —
        # the same two deterministic inputs as the oracle (davg's contract)
        F.round(sum_qty.cast("double") / n, 6).alias("avg_qty"),
        F.round(sum_price.cast("double") / n, 6).alias("avg_price"),
        F.round(sum_disc.cast("double") / n, 6).alias("avg_disc"),
        "count_order",
    )


@register(
    "q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           CAST(ROUND(SUM({_SQL_DISC}), 2) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3: selective dim filter broadcast into fact join; top-10 with tie-break.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(broadcast(orders.join(broadcast(cust), orders.o_custkey == cust.c_custkey)),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q4_order_priority_check",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4: semi-join (EXISTS) feeding an aggregate.",
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q6_forecast_revenue",
    f"""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure scan-filter-sum — every predicate pushed to parquet.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(mdec("l_extendedprice") * mdec("l_discount")), 2)
        .cast("double")
        .alias("revenue")
    )


@register(
    "q12_priority_shipping_buckets",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
    doc="TPC-H Q12 shape: conditional bucket counts after a fact join.",
)
def q12_priority_shipping_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q5_revenue_by_nation",
    f"""
    SELECT n_name,
           CAST(ROUND(SUM({_SQL_DISC}), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="Flagship (TPC-H Q5 shape): 4 joins, all dims broadcast, one agg shuffle.",
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation in ASIA, 1996-1997.

    Physical shape at scale: lineitem (the 100 TB fact) is scanned once with
    shipdate-independent predicates pushed to orders' scan; orders filtered
    by date then joined; nation/region/customer broadcast so the only wide
    shuffle is the final groupBy on n_name (25 groups → trivially small).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = (
        cust.join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name, n_name,
           CAST(ROUND(SUM({_SQL_DISC}), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer, top 20.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust.join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)),
              orders.o_custkey == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


_SQL_PS = """
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(l_extendedprice) AS ps_supplycost
      FROM lineitem GROUP BY 1, 2"""


@register(
    "q2_min_cost_supplier",
    f"""
    WITH ps AS ({_SQL_PS})
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost
    FROM part
    JOIN ps       ON p_partkey = ps_partkey
    JOIN supplier ON s_suppkey = ps_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND r_name = 'EUROPE'
      AND ps_supplycost = (
        SELECT MIN(ps2.ps_supplycost)
        FROM ps ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
    """,
    doc="TPC-H Q2 shape: per-part min-cost supplier in a region — correlated "
    "min over a 4-way dimension join (partsupp emulated from lineitem).",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated subquery decorrelates into one extra aggregation:
    ``eligible`` (region-scoped part/supplier costs) is computed ONCE,
    reused for both the per-part min and the final equality — at scale
    that's two shuffles over the slim (partkey, suppkey, cost) projection,
    with every dimension (supplier, nation, region, filtered part)
    broadcast so the fact-derived table never shuffles for a dim join.
    Reference parity: TPC-H Q2's min-cost-supplier semantics re-expressed
    on the driver's 10-table schema (no partsupp: supplier-part links and
    costs derive from lineitem)."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.min("l_extendedprice").alias("ps_supplycost"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sdim = (
        supplier.join(broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eligible = ps.join(broadcast(sdim), ps.ps_suppkey == sdim.s_suppkey)
    min_cost = eligible.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    return (
        eligible.join(F.broadcast(min_cost), "ps_partkey")
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(broadcast(part), F.col("ps_partkey") == part.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "ps_supplycost")
    )


@register(
    "q16_supplier_part_counts",
    """
    WITH ps AS (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
                FROM lineitem)
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 15, 25, 35)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: supplier counts per part group, excluding a "
    "NOT-IN supplier subquery; count-distinct after an anti join.",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN compiles to a broadcast LEFT ANTI join against the (tiny,
    non-null-key) excluded-supplier set; the count-distinct aggregates the
    deduplicated (partkey, suppkey) projection — Catalyst plans it as a
    two-phase distinct-then-count, partial before each exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).distinct()
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 15, 25, 35)
    )
    return (
        ps.join(F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(broadcast(part), F.col("ps_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


@register(
    "q21_sole_blame_supplier",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON l1.l_suppkey = s_suppkey AND l1.l_returnflag = 'R'
    JOIN orders      ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
    JOIN nation      ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_9'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape: suppliers solely responsible for a returned line "
    "in multi-supplier finalized orders — EXISTS + NOT EXISTS composition.",
)
def q21_sole_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hardest semi/anti composition in the classic suite: one LEFT
    SEMI join (another supplier touched the order) and one LEFT ANTI join
    (no other supplier's line was returned) against the same fact table,
    both equi-keyed on l_orderkey with the inequality riding as a join
    residual — so each is a shuffle-hash/sort-merge join at scale, never a
    cartesian. Dimensions (supplier⋈nation, order status) broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    sdim = supplier.join(
        broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "s_name")
    cand = (
        l1.join(broadcast(sdim), F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey"), F.col("l1.l_orderkey") == F.col("o_orderkey"))
    )
    with_other = cand.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    sole = with_other.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return sole.groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))


@register(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(ROUND(SUM({_SQL_DISC}), 2) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
             l_extendedprice, l_discount
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: cross-nation shipping volume by year — two nation "
    "role-joins with a disjunctive pair filter.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nation dimension joins TWICE in different roles (supplier's vs
    customer's); both legs broadcast, and the pair filter applies after the
    second dim join so Catalyst can still push each leg's n_name IN (…)
    residual into the broadcast hash join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    sdim = supp.join(broadcast(n1), supp.s_nationkey == F.col("n1_key")).select(
        "s_suppkey", "supp_nation"
    )
    cdim = cust.join(broadcast(n2), cust.c_nationkey == F.col("n2_key")).select(
        "c_custkey", "cust_nation"
    )
    return (
        li.join(broadcast(sdim), li.l_suppkey == sdim.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cdim), orders.o_custkey == cdim.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _disc_price().alias("dp"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("dp"), 2).cast("double").alias("revenue"))
    )


@register(
    "q13_customer_order_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey)
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: customer order-count distribution — outer join "
    "with an ON-clause residual, double aggregation.",
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The residual predicate must live in the JOIN condition, not a WHERE
    (a WHERE would turn the left join inner and drop zero-order
    customers). COUNT(o_orderkey) counts matches only — null-safe by SQL
    semantics in both engines. Two shuffles: by custkey, then by c_count
    (the second over ≤ |distinct counts| rows)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority != "5-LOW"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q17_small_quantity_revenue",
    """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) / 7.0, 2) AS DOUBLE)
           AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_size < 10
      AND 5.0 * l_quantity * (SELECT COUNT(*) FROM lineitem l2
                              WHERE l2.l_partkey = p_partkey)
          < (SELECT SUM(l_quantity) FROM lineitem l3
             WHERE l3.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17 shape: revenue from small-quantity orders (below 20% of "
    "the part's average) — correlated aggregate, division-free.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated ``l_quantity < 0.2 * avg(per-part)`` is algebraically
    rewritten division-free: ``5·q·count < sum`` — quantities are small
    integers stored as doubles, so both sides are EXACT in IEEE double
    regardless of aggregation order, and the comparison can't flip between
    engines the way a rounded average could. Decorrelated into one per-part
    aggregate joined back to the (brand, size)-filtered probe."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 10)
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("l_quantity").alias("qty_sum")
    )
    return (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("pp_key"))
        .filter(F.lit(5.0) * F.col("l_quantity") * F.col("cnt") < F.col("qty_sum"))
        .agg(
            (F.round(F.sum(mdec("l_extendedprice")) / 7.0, 2))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "q18_large_volume_customers",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(l_quantity) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    doc="TPC-H Q18 shape: large-volume orders — IN over a grouped HAVING, "
    "i.e. a semi join against an aggregate.",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IN-subquery compiles to a LEFT SEMI join of orders against the
    per-order quantity aggregate; quantity sums are integer-valued doubles
    (exact at any fold order), so no decimal cast is needed for the HAVING
    threshold or the output sum."""
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select(F.col("l_orderkey").alias("big_key"))
    )
    return (
        orders.join(big, orders.o_orderkey == F.col("big_key"), "left_semi")
        .join(broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
    )


@register(
    "q19_disjunctive_revenue",
    f"""
    SELECT CAST(ROUND(SUM({_SQL_DISC}), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: disjunction of conjunctive (brand, size, quantity) "
    "clauses — OR-predicate pushdown across a join.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst factors the cross-table OR: the l_quantity bounds (1..30)
    and the part brand/size union push to their respective scans as
    coarse filters, with the exact disjunction evaluated after the
    broadcast join — at 100 TB the coarse pushdown is what keeps the scan
    from reading every row group."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(broadcast(part), li.l_partkey == part.p_partkey)
    clause = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(clause).agg(
        F.round(F.sum(_disc_price()), 2).cast("double").alias("revenue")
    )


@register(
    "q22_idle_rich_customers",
    """
    SELECT c_mktsegment AS segment, COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE CAST(c_acctbal AS DECIMAL(18,4))
            * (SELECT COUNT(*) FROM customer c2 WHERE c2.c_acctbal > 0)
          > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) FROM customer c3
             WHERE c3.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
    doc="TPC-H Q22 shape: above-average-balance customers with no recent "
    "orders — global-aggregate subquery + NOT EXISTS anti join, division-free.",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``c_acctbal > avg(positive balances)`` is compared division-free
    (``bal·count > sum`` in exact decimal) so no engine-specific decimal
    division scale can flip a boundary row. The 1-row global aggregate
    broadcasts via crossJoin; NOT EXISTS is a LEFT ANTI against the
    distinct custkeys with RECENT orders (every customer in the testdata
    has some historical order, so the classic no-orders-ever predicate
    would be vacuously empty)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    stats = cust.filter(F.col("c_acctbal") > 0).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum(mdec("c_acctbal")).alias("bal_sum")
    )
    has_orders = orders.select(F.col("o_custkey")).distinct()
    return (
        cust.crossJoin(broadcast(stats))
        .filter(mdec("c_acctbal") * F.col("cnt") > F.col("bal_sum"))
        .join(has_orders, cust.c_custkey == has_orders.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(mdec("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
    )


@register(
    "q8_national_market_share",
    f"""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST({_SQL_DISC} AS DECIMAL(38,4)) AS volume,
             n2.n_name AS nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31')
    GROUP BY o_year
    """,
    doc="TPC-H Q8: national market share — one nation's fraction of regional "
    "revenue per year; exact-decimal sums, double division.",
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: lineitem joins orders on the shuffle key ONCE; every
    dimension (filtered part, supplier⋈nation, customer⋈nation⋈region)
    broadcasts, so the fact table sees exactly one exchange. The share is
    a conditional sum over the same exact-decimal volume column — one
    aggregation pass, no second scan."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_am = (
        customer.join(broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .select("c_custkey")
    )
    supp_n = supplier.join(
        broadcast(nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation"))),
        supplier.s_nationkey == F.col("s_nk"),
    ).select("s_suppkey", "nation")
    vol = F.col("volume")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(part), li.l_partkey == part.p_partkey)
        .join(broadcast(cust_am), orders.o_custkey == F.col("c_custkey"))
        .join(broadcast(supp_n), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _disc_price().cast("decimal(38,4)").alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_1", vol).otherwise(F.lit(0).cast("decimal(38,4)"))
                ).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_type_profit",
    f"""
    WITH ps AS ({_SQL_PS})
    SELECT nation, o_year,
           CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INT) AS o_year,
             CAST({_SQL_DISC}
                  - CAST(ps_supplycost AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))
                  AS DECIMAL(38,4)) AS amount
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN ps       ON ps_suppkey = l_suppkey AND ps_partkey = l_partkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%')
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9: product-type profit by supplier nation and year "
    "(partsupp emulated from lineitem, as q2).",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ps emulation is a slim (partkey, suppkey, cost) aggregate of
    lineitem — the one fact-sized shuffle besides the orders join; part
    (name-filtered), supplier⋈nation broadcast. Profit arithmetic is
    exact decimal end-to-end, rounded once at the final aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.min("l_extendedprice").alias("ps_supplycost"))
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    supp_n = supplier.join(
        broadcast(nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation"))),
        supplier.s_nationkey == F.col("s_nk"),
    ).select("s_suppkey", "nation")
    amount = (
        _disc_price() - mdec("ps_supplycost") * mdec("l_quantity")
    ).cast("decimal(38,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(part), li.l_partkey == part.p_partkey)
        .join(broadcast(supp_n), li.l_suppkey == F.col("s_suppkey"))
        .join(ps, (li.l_suppkey == F.col("ps_suppkey")) & (li.l_partkey == F.col("ps_partkey")))
        .select("nation", F.year("o_orderdate").cast("int").alias("o_year"), amount.alias("amount"))
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"))
    )


@register(
    "q14_promo_revenue",
    f"""
    SELECT ROUND(100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                        THEN CAST({_SQL_DISC} AS DECIMAL(38,4))
                                        ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(CAST({_SQL_DISC} AS DECIMAL(38,4))) AS DOUBLE), 6) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
    doc="TPC-H Q14: promo parts' share of one month's revenue — conditional "
    "aggregate over a broadcast part join.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ship-date month predicate pushes to the lineitem scan; part
    broadcasts; one conditional aggregation, one output row."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    vol = _disc_price().cast("decimal(38,4)")
    return (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("p_type"), vol.alias("volume"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", F.col("volume")).otherwise(F.lit(0).cast("decimal(38,4)"))
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST({_SQL_DISC} AS DECIMAL(38,4))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name,
           CAST(ROUND(total_rev, 2) AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
    doc="TPC-H Q15: top supplier by quarterly revenue — max over a revenue "
    "view, exact-decimal equality (no float ties).",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The revenue view is one partial-agg shuffle over the date-pruned
    scan; the max is a 1-row broadcast joined back by EXACT decimal
    equality (float equality would be engine-dependent); supplier
    broadcasts onto the winners."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price().cast("decimal(38,4)")).alias("total_rev")
    )
    mx = revenue.agg(F.max("total_rev").alias("max_rev"))
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(broadcast(supplier), F.col("supplier_no") == supplier.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.round("total_rev", 2).cast("double").alias("total_revenue")
        )
    )


_SQL_PS_QTY = """
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(l_extendedprice) AS ps_supplycost,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS ps_availqty
      FROM lineitem GROUP BY 1, 2"""


@register(
    "q11_important_stock",
    f"""
    WITH ps AS ({_SQL_PS_QTY}),
    scoped AS (
      SELECT ps_partkey,
             CAST(CAST(ps_supplycost AS DECIMAL(18,4)) * ps_availqty AS DECIMAL(38,4)) AS v
      FROM ps
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_2'),
    byp AS (SELECT ps_partkey, SUM(v) AS pval FROM scoped GROUP BY ps_partkey),
    tot AS (SELECT SUM(v) AS total FROM scoped)
    SELECT ps_partkey, CAST(ROUND(pval, 2) AS DOUBLE) AS part_value
    FROM byp, tot
    WHERE pval > total * CAST(0.001 AS DECIMAL(9,4))
    """,
    doc="TPC-H Q11: per-part stock value inside one nation vs a fraction of "
    "the nation total (partsupp availqty emulated as total shipped qty).",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HAVING-against-a-global-aggregate decorrelates to a 1-row
    broadcast: `scoped` (nation-filtered ps) is computed once, aggregated
    twice (per-part and total), and the threshold compare is exact decimal
    on both sides — no float fraction ambiguity. Supplier⋈nation
    broadcasts onto the slim ps aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.min("l_extendedprice").alias("ps_supplycost"),
        F.sum(mdec("l_quantity")).alias("ps_availqty"),
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    supp_n = supplier.join(
        broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    scoped = ps.join(broadcast(supp_n), ps.ps_suppkey == F.col("s_suppkey")).select(
        "ps_partkey",
        (mdec("ps_supplycost") * F.col("ps_availqty")).cast("decimal(38,4)").alias("v"),
    )
    byp = scoped.groupBy("ps_partkey").agg(F.sum("v").alias("pval"))
    tot = scoped.agg(F.sum("v").alias("total"))
    return (
        byp.crossJoin(broadcast(tot))
        .filter(F.col("pval") > F.col("total") * F.lit(0.001).cast("decimal(9,4)"))
        .select("ps_partkey", F.round("pval", 2).cast("double").alias("part_value"))
    )


@register(
    "q20_potential_promotion",
    f"""
    WITH ps AS ({_SQL_PS_QTY}),
    yearly AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty_1996
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2),
    excess AS (
      SELECT DISTINCT ps_suppkey
      FROM ps
      JOIN part   ON p_partkey = ps_partkey
      JOIN yearly ON yearly.l_partkey = ps_partkey AND yearly.l_suppkey = ps_suppkey
      WHERE p_name LIKE 'red%'
        AND ps_availqty > CAST(0.5 AS DECIMAL(9,4)) * qty_1996)
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN excess ON s_suppkey = ps_suppkey
    WHERE n_name = 'NATION_3'
    """,
    doc="TPC-H Q20: suppliers in one nation holding excess stock of promo-"
    "candidate parts (availqty emulated; exact-decimal 0.5x compare).",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both quantity sums are exact decimal so the > 0.5x compare cannot
    flip on accumulation order; the nested IN-chain decorrelates to two
    slim fact aggregates joined on (part, supp), with part (name-filtered)
    and supplier⋈nation broadcast; the final step is a semi-join shape
    (DISTINCT supplier keys) so no supplier row duplicates."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(F.sum(mdec("l_quantity")).alias("ps_availqty"))
    yearly = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(mdec("l_quantity")).alias("qty_1996"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    excess = (
        ps.join(broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(
            yearly,
            (ps.ps_partkey == yearly.l_partkey) & (ps.ps_suppkey == yearly.l_suppkey),
        )
        .filter(F.col("ps_availqty") > F.lit(0.5).cast("decimal(9,4)") * F.col("qty_1996"))
        .select("ps_suppkey")
        .distinct()
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        supplier.join(broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(excess, supplier.s_suppkey == F.col("ps_suppkey"))
        .select("s_suppkey", "s_name")
    )
