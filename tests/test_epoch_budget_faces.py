"""Property tests for the epoch-shuffle and token-budget faces, beyond
the DuckDB oracle gate: the shuffle must be a true permutation with
balanced shards, and the budget selection must be greedy-maximal (spent
<= budget, and the best unselected document would overflow it)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_epoch_shuffle_is_balanced_permutation(spark):
    """shuffle_rank is exactly 1..n (a permutation of the corpus, nothing
    dropped or duplicated) and round-robin shards differ by at most one
    document."""
    from trike_spark.queries.curation import N_EPOCH_SHARDS, curation_epoch_shuffle

    out = curation_epoch_shuffle(spark, SF_DIR).collect()
    n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert len(out) == n
    assert sorted(r["shuffle_rank"] for r in out) == list(range(1, n + 1))
    assert len({r["doc_id"] for r in out}) == n
    per_shard = [0] * N_EPOCH_SHARDS
    for r in out:
        per_shard[r["shard"]] += 1
    assert max(per_shard) - min(per_shard) <= 1


def test_epoch_shuffle_rank_follows_seeded_hash_order(spark):
    """The permutation is exactly the md5(seed:doc_id) sort order — the
    reproducibility contract: any engine that hashes the same seed and
    ids reconstructs the identical epoch order."""
    from trike_spark.queries.curation import EPOCH_SEED, curation_epoch_shuffle

    out = curation_epoch_shuffle(spark, SF_DIR)
    keyed = out.withColumn(
        "_k", F.md5(F.concat(F.lit(f"{EPOCH_SEED}:"), F.col("doc_id").cast("string")))
    ).collect()
    by_rank = [r["_k"] for r in sorted(keyed, key=lambda r: r["shuffle_rank"])]
    assert by_rank == sorted(by_rank)


def test_token_budget_selection_is_greedy_maximal(spark):
    """The per-lang report must come from the unique greedy prefix of the
    (ttr DESC, doc_id) order: total tokens <= budget, and the FIRST
    document past the prefix would overflow the budget (so the selection
    is maximal, not merely feasible)."""
    from trike_spark.queries.curation import TOKEN_BUDGET, curation_token_budget_select

    out = curation_token_budget_select(spark, SF_DIR).collect()
    spent = sum(r["tokens_selected"] for r in out)
    n_sel = sum(r["n_docs"] for r in out)
    assert 0 < spent <= TOKEN_BUDGET

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    scored = d.select(
        "doc_id",
        "lang",
        F.size(toks).alias("toks"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("ttr"),
    )
    rows = sorted(scored.collect(), key=lambda r: (-r["ttr"], r["doc_id"]))
    cum, prefix = 0, []
    for r in rows:
        if cum + r["toks"] > TOKEN_BUDGET:
            break
        cum += r["toks"]
        prefix.append(r)
    # greedy prefix reproduces the face's totals exactly
    assert cum == spent and len(prefix) == n_sel
    # maximality: the next candidate in order would overflow
    if len(prefix) < len(rows):
        assert cum + rows[len(prefix)]["toks"] > TOKEN_BUDGET
    # per-lang breakdown matches
    per_lang = {}
    for r in prefix:
        a = per_lang.setdefault(r["lang"], [0, 0])
        a[0] += 1
        a[1] += r["toks"]
    got = {r["lang"]: (r["n_docs"], r["tokens_selected"]) for r in out}
    assert got == {k: tuple(v) for k, v in per_lang.items()}
