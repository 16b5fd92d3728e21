"""MMR rerank invariants: structure, greedy monotonicity, and that the
diversity penalty actually changes the selection vs pure relevance top-k."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from trike_spark.queries.vectors import (
    MMR_K,
    N_QUERIES,
    sim_mmr_rerank,
    sim_topk_bruteforce,
)

SF_DIR = "/root/testdata/sf0.001"


def test_mmr_structure_and_monotonic_scores(spark):
    rows = sim_mmr_rerank(spark, SF_DIR).collect()
    by_q = defaultdict(list)
    for r in rows:
        by_q[r.q_vec_id].append(r)
    assert len(by_q) == N_QUERIES
    for qid, picks in by_q.items():
        picks.sort(key=lambda r: r.step)
        assert [r.step for r in picks] == list(range(1, MMR_K + 1))
        ids = [r.vec_id for r in picks]
        assert len(set(ids)) == MMR_K, f"duplicate pick for query {qid}"
        # greedy MMR scores are weakly decreasing: the penalty term can only
        # grow as the chosen set grows, so the best achievable score shrinks
        scores = [r.mmr for r in picks]
        assert all(a >= b - 1e-12 for a, b in zip(scores, scores[1:])), (
            qid,
            scores,
        )


def test_mmr_diverges_from_pure_topk(spark):
    """With λ=0.7 the redundancy penalty must reorder at least one query's
    selection relative to pure relevance top-k — otherwise the second
    stage is a no-op and the operator is mislabeled."""
    mmr = sim_mmr_rerank(spark, SF_DIR).collect()
    topk = (
        sim_topk_bruteforce(spark, SF_DIR)
        .filter(F.col("n_vec_id") >= N_QUERIES)
        .collect()
    )
    mmr_sets = defaultdict(set)
    for r in mmr:
        mmr_sets[r.q_vec_id].add(r.vec_id)
    top_sets = defaultdict(list)
    for r in sorted(topk, key=lambda r: r.rk):
        if len(top_sets[r.q_vec_id]) < MMR_K:
            top_sets[r.q_vec_id].append(r.n_vec_id)
    diverged = sum(
        1 for q in mmr_sets if mmr_sets[q] != set(top_sets[q])
    )
    assert diverged >= 1, "MMR never deviated from pure top-k"
