"""Partition-invariance: the engine claims its results are independent of
physical execution (docs/SCALE.md "cross-engine determinism") — exact
DECIMAL/BIGINT aggregation, md5-derived randomness, pinned float
expression trees. This test PROVES it for the most float- and
order-sensitive faces by running each one under two very different
shuffle-partition settings and comparing full result multisets.

A face that silently depended on partitioning (a double sum whose value
shifts with reduction order, a sample keyed on partition id, an
iterative algorithm sensitive to task scheduling) would fail here long
before it failed a 1000-executor run."""

from __future__ import annotations

import math

import pytest

from trike_spark.cache import release_checkpoints
from trike_spark.registry import REGISTRY, load_all_query_modules

SF_DIR = "/root/testdata/sf0.01"

load_all_query_modules()

# the faces with the most room for partition-dependence
SENSITIVE = [
    "graph_pagerank_fixedpoint",  # iterative integer fixed-point
    "curation_weighted_sample",  # sampling (md5 min-ticket)
    "text_unigram_logprob",  # double sums of logs per group
    "text_bpe_merges",  # iterative argmax over distributed counts
    "sketch_hll_intersection",  # register sketch + float estimator
    "dedup_minhash_lsh_pairs",  # hash-family candidate generation
    "window_equidepth_histogram",  # distributed global rank
    "q1_pricing_summary",  # decimal money aggregation
    # round-4 session-2 faces with the same exposure classes
    "graph_triangle_count",  # iterative-ish multi-join graph census
    "window_ewma_trailing",  # banded integer weighting
    "curation_dp_count_release",  # float inverse-CDF over md5 draw
    "dedup_substring_spans",  # gaps-and-islands over hash matches
    "agg_salted_two_stage",  # explicit two-stage decimal merge
    "text_js_divergence_langs",  # double entropy sums over pair mixtures
    "sketch_bloom_fpr_curve",  # measured-vs-theory float division
    # round-6 banded rewrites: global order decomposed over bands — the
    # exact class of change that could smuggle in partition-dependence
    "agg_rfm_segmentation",  # three banded exact ntiles
    "agg_mann_whitney_u",  # banded min-rank + tie counts
    "sketch_kmv_setops",  # two-stage K-smallest via spark_partition_id
    "join_nearest_acctbal",  # banded prev/next ignore-nulls fills
    "text_zipf_slope",  # composite (-freq, prefix) struct band
    "events_lateness_report",  # banded running-max frontier
    # round-7 session-3 banded faces: global permutation rank / budget
    # cutpoint — both decompose a global order over hash/TTR bands
    "curation_epoch_shuffle",  # banded row_number over md5 key
    "curation_token_budget_select",  # banded running token sum + cut
]


def _rows_key(df):
    cols = sorted(df.columns)

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return repr(round(v, 9))
        return str(v)

    return sorted(tuple(norm(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_shuffle_partitioning(spark, name):
    fn = REGISTRY[name].fn
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = _rows_key(fn(spark, SF_DIR))
        release_checkpoints()
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = _rows_key(fn(spark, SF_DIR))
        release_checkpoints()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b, f"{name} result depends on shuffle partitioning"
