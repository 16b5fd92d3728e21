"""AQE skew-join handling, asserted at runtime: a join with one
pathologically hot key must come out of adaptive execution with the
skewed partition SPLIT (the `skew=true` marker on the sort-merge join),
not one straggler task — this is the engine's answer to hot keys wherever
an explicit salt wasn't applied (docs/SCALE.md 'Known trade-offs')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SKEW_CONFS = {
    # shrink thresholds so the local fixture's hot key counts as skewed
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    # force a shuffle join — a broadcast would hide the skew entirely
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def skew_confs(spark):
    saved = {}
    for k, v in SKEW_CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_hot_key_join(spark, skew_confs):
    # 200k rows on one key, a trickle on 50 others; right side 51 keys
    left = spark.range(0, 200_000).select(
        F.when(F.col("id") < 195_000, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    right = spark.range(0, 51).select(
        F.col("id").alias("k"), F.col("id").alias("dim_val")
    )
    # NOTE deliberately no keyed aggregation downstream: AQE only splits a
    # skewed join partition when nothing after the join requires hash
    # partitioning on the join key (a groupBy(k) right after would veto
    # the split to avoid an extra shuffle) — which is exactly why the
    # engine's explicitly-salted faces exist for join+agg pipelines.
    # keep the fat payload column through the shuffle — projecting it
    # away would let column pruning shrink the map output below the skew
    # threshold (the hot key's bytes ARE the skew being detected)
    joined = left.join(right, "k")
    ks = [r.k for r in joined.collect()]
    # 195k hot rows + 100 from the trickle (5000 rows over 50 mod-keys)
    assert ks.count(7) == 195_100  # correctness under the split
    final = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in final, final
    assert "skewed" in final  # AQEShuffleRead marks the split read
