"""Python UDTF (Spark 4 user-defined TABLE function) — the row-expanding
escape hatch, completing the UDF surface (scalar pandas_udf in
vector_udfs.py, grouped/map Arrow kernels in operators/vector_blocks.py
and streaming/framing.py).

Kept deliberately oracle-equivalent: ``tokenize_spans`` emits exactly what
``posexplode(split(text, ' '))`` emits, so the driver hash-verifies the
UDTF execution path end-to-end against plain SQL — the point is proving
the API surface (registration, lateral join, row expansion) with a hard
correctness signal, not smuggling Python into a hot path. Real users
would put genuinely non-relational row expansion here (sentence
segmentation, tokenizer-aware chunking); anything expressible with
built-ins should use them (the UDTF pays a Python worker round-trip per
partition).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, token string")
class TokenizeSpans:
    """Emit (position, token) rows for a whitespace-tokenized string."""

    def eval(self, text: str):  # noqa: ANN201 — UDTF protocol
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            yield (i, tok)


def register_udtfs(spark) -> None:
    """Register every engine UDTF for SQL/lateral use (idempotent)."""
    spark.udtf.register("tokenize_spans", TokenizeSpans)
