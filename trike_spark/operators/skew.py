"""Skew-aware join: salting for hot keys (SURVEY.md §4.3 scale posture).

AQE's skew-join split (enabled in session.py) handles most runtime skew by
splitting oversized shuffle partitions. Salting is the complementary
*plan-level* tool for the pathological case AQE can't fix: a single join
key holding a double-digit percentage of all rows (the '1% of connections
carry 90% of messages' shape trike's per-connection partitioning implies
at scale — proxy.ex:85-89 routes one connection to one shard).

Mechanism: the skewed (large) side gets a random salt in [0, n); the
small/broadcastable-but-too-big side is replicated n ways via a literal
explode. The join key becomes (key, salt) → hot keys spread over n tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on ``key`` with the large side salted.

    ``small`` is replicated ×n_salts (explode of a literal range — narrow,
    no shuffle); ``large`` gets salt = pmod(hash-independent random-ish
    value, n). We derive the salt from xxhash64 of the row's full tuple
    plus a monotonic id surrogate — deterministic per run, uniform enough
    to split a hot key across tasks.

    Only ``inner``/``left``/``left_semi`` are legal: with a right or full
    outer join, an unmatched small-side row would surface once per salt
    (×n_salts NULL-extended duplicates) because the small side is
    replicated before the join. Outer-join salting needs a post-join dedup
    of unmatched replicas — out of scope here, so it's rejected loudly.
    """
    if how not in ("inner", "left", "left_outer", "left_semi"):
        raise ValueError(
            f"salted_join supports how in {{'inner','left','left_semi'}}, got {how!r}: "
            "the replicated small side would emit one unmatched row per salt "
            "under right/full outer joins"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns], F.monotonically_increasing_id()), F.lit(n_salts))
    l_salted = large.withColumn("_salt", salt.cast("int"))
    s_replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = l_salted.join(s_replicated, on=[key, "_salt"], how=how)
    return out.drop("_salt")
