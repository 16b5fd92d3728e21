"""Vectorized (Arrow-batched) pandas UDFs for vector columns.

NOTE: no ``from __future__ import annotations`` here — pandas_udf resolves
the type hints at definition time, and postponed (string) annotations break
its signature inference.
"""

import math

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def l2_norm(emb: pd.Series) -> pd.Series:
    """Sequential accumulation (not numpy pairwise sum) so the fold order
    — and therefore the bits — match the engines' list folds."""
    out = []
    for arr in emb:
        acc = 0.0
        for x in arr:
            xd = float(x)
            acc += xd * xd
        out.append(round(math.sqrt(acc), 6))
    return pd.Series(out)
