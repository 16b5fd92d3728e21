from __future__ import annotations

from pyspark.sql import functions as F

from trike_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # one pathologically hot key (90% of rows) + a tail
    large = spark.range(0, 10_000).select(
        F.when(F.col("id") < 9_000, F.lit(1)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 100).select(F.col("id").alias("k"), (F.col("id") * 10).alias("dim"))
    plain = large.join(small, "k").groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s"))
    salted = salted_join(large, small, "k", n_salts=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    large = spark.range(0, 1000).select(F.lit(1).alias("k"), F.col("id").alias("p"))
    small = spark.range(0, 2).select(F.col("id").alias("k"))
    joined = salted_join(large, small, "k", n_salts=4)
    # every hot-key row still joins exactly once
    assert joined.count() == 1000
