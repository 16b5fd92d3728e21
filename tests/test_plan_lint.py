"""Suite-wide plan lint: every registered query's physical plan is held to
the two conventions the whole engine is built on (docs/SCALE.md):

  1. No CartesianProduct — a cross join is only ever acceptable as a
     BroadcastNestedLoopJoin with a provably tiny broadcast side; a
     CartesianProduct node means a bounded side lost its broadcast hint
     and the query would shuffle-explode at scale.
  2. No row-at-a-time Python (BatchEvalPython) — Python is allowed only
     Arrow-batched (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
     / ArrowEvalPythonUDTF), and only in the faces that declare it.

Pointwise plan-shape tests (test_plan_shape.py) assert per-query
properties; this lint keeps the INVARIANTS true for every query ever
added, automatically."""

from __future__ import annotations

import pytest

from trike_spark import plans
from trike_spark.cache import release_checkpoints
from trike_spark.registry import REGISTRY, load_all_query_modules

SF_DIR = "/root/testdata/sf0.001"

load_all_query_modules()

# Faces that intentionally run Arrow-batched Python kernels.
ARROW_PYTHON_OK = {
    "dedup_embedding_cosine_pairs",
    "dedup_embedding_lsh_cosine_pairs",
    "dedup_incremental_lsh",
    "dedup_semantic_keep_min",
    "dedup_cluster_canonical",  # seeds from jaccard pairs; CC may persist kernels
    "multimodal_assemble",
    "multimodal_decode_features",
    "multimodal_decode_quarantine",  # REAL codec + ValueError quarantine routing
    "multimodal_jpeg_roundtrip",  # REAL baseline JPEG codec inside the Arrow stage
    "multimodal_jpeg420_roundtrip",  # REAL 4:2:0 color JPEG inside the Arrow stage
    "multimodal_jpeg_header_catalog",  # marker-walk catalog over real JFIF bytes
    "multimodal_y4m_frame_sample",  # REAL Y4M container + frame sampling
    "multimodal_frame_sample",
    "multimodal_png_roundtrip",  # REAL stdlib codec runs inside the Arrow stage
    "multimodal_resize",
    "multimodal_wav_roundtrip",  # REAL stdlib codec runs inside the Arrow stage
    "pipeline_chunk_dedup",
    "pipeline_training_data_prep",
    "events_alert_debounce",  # greedy cooldown chain is applyInPandas per user
    "scalar_ols_trend_applyinpandas",
    "scalar_udtf_tokenize",
    "sim_knn_graph_lsh",  # LSH bucket kernel (Arrow) feeds the graph build
    "sim_lsh_bucket_topk",
    "sim_lsh_ndcg_at_k",  # banded candidates come from the Arrow bucket kernel
    "sim_lsh_recall_at_k",
    "sim_mmr_rerank",  # greedy rerank stage is applyInPandas per query group
    "sim_norms_pandas_udf",
}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_cartesian_no_rowwise_python(spark, name):
    df = REGISTRY[name].fn(spark, SF_DIR)
    tree = plans.plan_tree(df)
    release_checkpoints()
    assert "CartesianProduct" not in tree, f"{name}: CartesianProduct\n{tree}"
    # row-at-a-time Python is banned everywhere (Arrow UDTF node name
    # contains the banned substring — strip it first)
    scrubbed = tree.replace("BatchEvalPythonUDTF", "")
    assert "BatchEvalPython" not in scrubbed, f"{name}: row-wise Python\n{tree}"
    # Arrow-batched Python only where declared
    has_python = any(
        node in tree
        for node in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
    )
    if has_python:
        assert name in ARROW_PYTHON_OK, f"{name}: undeclared Python stage\n{tree}"
