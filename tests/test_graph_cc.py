"""Connected-components operators: min-label propagation vs the
alternating large-star/small-star algorithm (operators/graph.py).

The star variant exists for adversarial diameters — a 1000-node chain
needs 1000 min-label rounds but only O(log n) star rounds — so these
tests pin (a) agreement between the two algorithms on assorted graphs,
(b) the star variant's round count on a deep chain, and (c) the loud
failure contract when max_iter is exhausted (ADVICE r2: silent
non-convergence returned wrong labels).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from trike_spark.operators.graph import (
    ConvergenceError,
    connected_components,
    connected_components_star,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")


def _labels(df):
    return {(r["node"], r["lbl"]) for r in df.collect()}


GRAPHS = {
    "two_triangles": [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12)],
    "self_loop_and_dup": [(5, 5), (1, 2), (2, 1), (1, 2)],
    "star_already": [(0, 7), (0, 8), (0, 9)],
    "reversed_chain": [(9, 8), (8, 7), (7, 6), (6, 5)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_star_agrees_with_min_label(spark, name):
    edges = _edges(spark, GRAPHS[name])
    a = _labels(connected_components(edges))
    b = _labels(connected_components_star(edges))
    assert a == b


def test_chain_1000_star_converges_in_log_rounds(spark):
    chain = spark.range(999).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    stats: dict = {}
    labels = connected_components_star(chain, max_iter=30, _stats=stats)
    got = labels.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("lbl")).alias("s"),
        F.max("lbl").alias("mx"),
    ).first()
    assert got["n"] == 1000 and got["s"] == 0 and got["mx"] == 0
    # O(log² n) worst case; observed well under 15 for a 1000-chain.
    assert stats["iterations"] <= 15


def test_chain_min_label_raises_instead_of_wrong_labels(spark):
    chain = spark.range(99).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    with pytest.raises(ConvergenceError, match="max_iter"):
        connected_components(chain, max_iter=5)


def test_min_label_converges_on_shallow_graph_with_stats(spark):
    edges = _edges(spark, GRAPHS["two_triangles"])
    stats: dict = {}
    labels = connected_components(edges, _stats=stats)
    assert _labels(labels) == {
        (1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10),
    }
    # shallow graph: diameter+1 rounds at most (final no-change round).
    assert stats["iterations"] <= 4


def test_reliable_checkpoint_mode(spark, tmp_path, monkeypatch):
    """SPARK_CHECKPOINT_DIR flips every cache.checkpoint site to reliable
    checkpoints (setCheckpointDir + Dataset.checkpoint) — the cluster
    deployment mode where executor loss must be survivable. Both CC
    algorithms must produce identical labels in both modes, and the
    checkpoint dir must actually receive checkpoint files (proof the
    reliable path ran, not the local one)."""
    ckpt_dir = str(tmp_path / "reliable_ckpt")
    monkeypatch.setenv("SPARK_CHECKPOINT_DIR", ckpt_dir)
    edges = _edges(spark, GRAPHS["two_triangles"])
    expected = {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10)}
    assert _labels(connected_components(edges)) == expected
    assert _labels(connected_components_star(edges)) == expected
    import os

    written = [
        os.path.join(root, f)
        for root, _, files in os.walk(ckpt_dir)
        for f in files
    ]
    assert written, "reliable mode must write checkpoint files to SPARK_CHECKPOINT_DIR"
