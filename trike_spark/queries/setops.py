"""Set operators: union all / union distinct / intersect / except-all,
plus sort/limit/top-k (SURVEY.md §2.6 "Set ops", "Sort/limit/top-k").

Scale notes: UNION ALL is shuffle-free (plan concatenation); DISTINCT /
INTERSECT / EXCEPT shuffle on the full row — kept to narrow key
projections here, which is also the right call at 100 TB (dedup keys, not
whole rows). ``orderBy().limit()`` compiles to TakeOrderedAndProject: a
per-partition top-k then a k-row merge, never a full global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trike_spark.io import load_table
from trike_spark.registry import register


def _cust_nk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@register(
    "setop_union_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT s_nationkey FROM supplier
    """,
    doc="UNION ALL (bag semantics, shuffle-free).",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nk(spark, sf_dir).unionByName(_supp_nk(spark, sf_dir))


@register(
    "setop_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    doc="UNION (set semantics).",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nk(spark, sf_dir).unionByName(_supp_nk(spark, sf_dir)).distinct()


@register(
    "setop_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    doc="INTERSECT (distinct).",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nk(spark, sf_dir).intersect(_supp_nk(spark, sf_dir))


@register(
    "setop_except_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey FROM supplier
    """,
    doc="EXCEPT ALL (bag difference).",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nk(spark, sf_dir).exceptAll(_supp_nk(spark, sf_dir))


@register(
    "sort_top15_orders",
    """
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
    doc="Global top-k: TakeOrderedAndProject, not a full sort.",
)
def sort_top15_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
    )


@register(
    "sort_topk_parts_per_brand",
    """
    SELECT p_brand, p_partkey, p_retailprice FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part) WHERE rn <= 2
    """,
    doc="Per-group top-k via ranked window (distributed, no global sort).",
)
def sort_topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        load_table(spark, sf_dir, "part")
        .select("p_brand", "p_partkey", "p_retailprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 2)
        .drop("rn")
    )


@register(
    "setop_intersect_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
    doc="INTERSECT ALL (bag intersection: min of per-side multiplicities).",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection — each nationkey appears min(count_left,
    count_right) times. Spark's ``intersectAll`` compiles to one
    hash-partitioned exchange per side on the projected key plus a
    multiplicity-matching aggregate — like DISTINCT, the 100 TB rule is
    to intersect narrow key projections, never whole rows."""
    return _cust_nk(spark, sf_dir).intersectAll(_supp_nk(spark, sf_dir))
