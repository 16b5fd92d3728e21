"""Drift tolerance for the embeddings table's vector column.

Round 3 lost 18 queries to a testdata dtype drift (events ts nanos →
micros). This pins the equivalent property for the OTHER drift-prone
column: if the driver ever regenerates ``embeddings.parquet`` with
``list<double>`` instead of ``list<float>``, every vector path must still
build and run — the JVM HOF dot products are type-agnostic and the Arrow
kernels upcast to float64 regardless of input precision
(operators/vector_blocks.py), so nothing may crash at plan build.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from trike_spark.registry import REGISTRY, load_all_query_modules

SRC = "/root/testdata/sf0.001"

load_all_query_modules()

REPRESENTATIVE = [
    "sim_topk_bruteforce",  # JVM aggregate/zip_with dot product
    "dedup_embedding_cosine_pairs",  # grid Arrow kernel (mapInPandas)
    "dedup_embedding_lsh_cosine_pairs",  # hyperplane-bucket Arrow kernel
    "sim_norms_pandas_udf",  # pandas_udf path
]


@pytest.fixture(scope="module")
def drift_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("drift_sf"))
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f != "embeddings.parquet":
            shutil.copy(os.path.join(SRC, f), os.path.join(dst, f))
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    emb64 = t.column("embedding").cast(pa.list_(pa.float64()))
    t = t.set_column(t.schema.get_field_index("embedding"), "embedding", emb64)
    pq.write_table(t, os.path.join(dst, "embeddings.parquet"))
    return dst


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_vector_query_survives_float64_embeddings(spark, drift_dir, name):
    rows = REGISTRY[name].fn(spark, drift_dir).collect()
    assert len(rows) > 0
