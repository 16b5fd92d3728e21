"""Capstone: the end-to-end training-data preparation pipeline — the
composition the LLM operators exist for (driver contract: dedup, quality,
text analysis as first-class components).

    documents
      → quality filter (length / punctuation heuristics)
      → exact dedup (content-hash groupBy, keep min doc_id)
      → near-dup removal (Jaccard≥0.3 connected components, keep canonical)
      → per-language corpus stats

Every stage is the already-oracle-proven operator; this query proves they
COMPOSE — one lazy plan end-to-end, so Catalyst prunes columns through all
four stages and the text column is never carried past its last use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trike_spark.io import load_table
from trike_spark.operators.graph import connected_components
from trike_spark.queries._util import davg, sql_davg
from trike_spark.queries.dedup import _SQL_JACCARD_PAIRS, dedup_ngram_jaccard_pairs
from trike_spark.registry import register


@register(
    "pipeline_training_data_prep",
    _SQL_JACCARD_PAIRS
    + f""",
    quality AS (
      SELECT doc_id, text, lang, n_chars,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
      WHERE len(string_split(text, ' ')) BETWEEN 20 AND 1000
        AND CAST(LENGTH(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
            / LENGTH(text) < 0.1),
    exact_survivors AS (
      SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
    nodes AS (SELECT DISTINCT doc FROM
              (SELECT doc_a AS doc FROM pairs UNION ALL SELECT doc_b FROM pairs)),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach AS (
      WITH RECURSIVE r(doc, lbl) AS (
        SELECT doc, doc FROM nodes
        UNION
        SELECT e.dst, r.lbl FROM r JOIN edges e ON e.src = r.doc)
      SELECT doc, MIN(lbl) AS canonical_id FROM r GROUP BY doc),
    neardup_losers AS (SELECT doc FROM reach WHERE doc <> canonical_id),
    kept AS (
      SELECT q.* FROM quality q
      JOIN exact_survivors es ON q.doc_id = es.doc_id
      WHERE q.doc_id NOT IN (SELECT doc FROM neardup_losers))
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           {sql_davg('n_chars')} AS avg_chars
    FROM kept GROUP BY lang
    """,
    doc="End-to-end corpus prep: quality filter → exact dedup → near-dup removal → per-lang stats.",
)
def pipeline_training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    n_tokens = F.size(t)
    punct_ratio = (
        F.length(F.regexp_replace(F.col("text"), F.lit("[a-z0-9 ]"), F.lit(""))).cast("double")
        / F.length("text")
    )
    quality = d.filter(n_tokens.between(20, 1000) & (punct_ratio < 0.1)).select(
        "doc_id", "text", "lang", "n_chars", n_tokens.alias("n_tokens")
    )
    exact_survivors = quality.groupBy(F.md5("text").alias("fp")).agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")

    # near-dup losers: every clustered doc except its canonical. Shared
    # persisted/lineage-truncated CC operator (operators/graph.py).
    pairs = dedup_ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    labels = connected_components(pairs, src="doc_a", dst="doc_b")
    losers = labels.filter(F.col("node") != F.col("lbl")).select(F.col("node").alias("doc_id"))

    kept = (
        quality.join(exact_survivors, "doc_id", "left_semi")
        .join(losers, "doc_id", "left_anti")
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        davg("n_chars").alias("avg_chars"),
    )


@register(
    "pipeline_chunk_dedup",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS n
      FROM documents),
    idx AS (
      SELECT doc_id, t,
             unnest(generate_series(0,
               CAST(CEIL(CAST(GREATEST(n - {C}, 0) AS DOUBLE) / {S}) AS BIGINT)))
               AS chunk_idx
      FROM toks),
    chunks AS (
      SELECT doc_id, chunk_idx,
             md5(array_to_string(
                 t[chunk_idx * {S} + 1 : chunk_idx * {S} + {C}], ' ')) AS chunk_md5
      FROM idx),
    owners AS (SELECT chunk_md5, MIN(doc_id) AS own_doc FROM chunks GROUP BY chunk_md5),
    flagged AS (
      SELECT c.doc_id, CASE WHEN c.doc_id = o.own_doc THEN 1 ELSE 0 END AS kept
      FROM chunks c JOIN owners o ON o.chunk_md5 = c.chunk_md5)
    SELECT doc_id, COUNT(*) AS n_chunks,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           ROUND(CAST(SUM(kept) AS DOUBLE) / COUNT(*), 6) AS kept_frac
    FROM flagged GROUP BY doc_id
    """.replace("{C}", "32").replace("{S}", "24"),
    doc=(
        "Chunk-level exact dedup: overlap-chunk the corpus, keep each chunk "
        "for its lowest-doc_id owner, report per-doc survival fraction."
    ),
)
def pipeline_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph/chunk-granularity dedup — the pass that removes boiler-
    plate shared across documents without dropping whole docs. Composes
    :func:`curation_chunk_overlap` (shuffle-free chunker) with a
    fingerprint-keyed ownership reduction: the only wide exchanges carry
    16-byte md5 keys (owners groupBy + ownership join — same key, so AQE
    reuses the exchange), never chunk text. Per-doc survival fraction is
    the curation signal ("how much of this doc is corpus boilerplate")."""
    from trike_spark.queries.curation import curation_chunk_overlap

    chunks = curation_chunk_overlap(spark, sf_dir).select("doc_id", "chunk_md5")
    owners = chunks.groupBy("chunk_md5").agg(F.min("doc_id").alias("own_doc"))
    flagged = chunks.join(owners, on="chunk_md5").select(
        "doc_id", F.when(F.col("doc_id") == F.col("own_doc"), 1).otherwise(0).alias("kept")
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("kept").cast("bigint").alias("n_kept"),
        F.round(F.sum("kept").cast("double") / F.count(F.lit(1)), 6).alias("kept_frac"),
    )


# --- tokenizer corpus prep: filter → dedup → BPE train ----------------------


def _sql_tokenizer_pipeline() -> str:
    from trike_spark.queries.text import BPE_MERGES, _sql_bpe_round

    quality = (
        "len(string_split(text, ' ')) BETWEEN 20 AND 1000 "
        "AND CAST(LENGTH(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)"
        " / LENGTH(text) < 0.1"
    )
    return f"""
    WITH survivors AS (
      SELECT doc_id, text FROM documents
      WHERE ({quality})
        AND doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5(text))),
    tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM survivors),
    words0 AS (
      SELECT token AS word_id, COUNT(*) AS wc,
             list_transform(generate_series(1, length(token)), i -> token[i]) AS syms
      FROM tok GROUP BY token),
    {','.join(_sql_bpe_round(r) for r in range(BPE_MERGES))}
    {' UNION ALL '.join(
        f"SELECT {r} AS round, a AS sym_a, b AS sym_b,"
        f" CAST(cnt AS BIGINT) AS pair_count FROM best{r}"
        for r in range(BPE_MERGES)
    )}
    """


@register(
    "pipeline_tokenizer_corpus_prep",
    _sql_tokenizer_pipeline(),
    doc=(
        "End-to-end tokenizer pipeline: C4-style quality filter → exact "
        "dedup (keep-min survivor) → BPE merge training on the surviving "
        "corpus — the merges differ from the raw-corpus face, which IS "
        "the point of filtering first."
    ),
)
def pipeline_tokenizer_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizers must be trained on the CURATED corpus, not the raw one —
    duplicated boilerplate otherwise buys its n-grams vocabulary slots
    (the BPE analog of dedup's loss impact). This face composes the
    audited stages: the C4-style quality gate (length band + punctuation
    ratio), exact dedup keeping the min-doc_id survivor (16-byte
    fingerprint shuffle), then BPE training on what remains — all one
    lazy plan, with the training still running over the vocabulary-sized
    word table. The learned merges are the face's output; at sf0.01 they
    genuinely differ from ``text_bpe_merges``' raw-corpus merges."""
    from trike_spark.queries.text import _bpe_train

    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    punct = F.length(
        F.regexp_replace(F.col("text"), F.lit("[a-z0-9 ]"), F.lit(""))
    ).cast("double") / F.length("text")
    quality = d.filter(n_tokens.between(20, 1000) & (punct < 0.1))
    survivor = d.groupBy(F.md5("text").alias("fp")).agg(
        F.min("doc_id").alias("doc_id")
    )
    # survivor ids are corpus-sized — no broadcast hint; the semi join
    # shuffles 8-byte ids and AQE may still broadcast at small SF
    survivors = quality.join(survivor.select("doc_id"), "doc_id", "left_semi")
    _words, merge_rows = _bpe_train(survivors)
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionAll(m)
    return out


@register(
    "pipeline_dataset_datasheet",
    """
    WITH base AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
             COUNT(DISTINCT lang) AS n_langs,
             COUNT(DISTINCT source) AS n_sources,
             COUNT(DISTINCT md5(text)) AS n_unique,
             quantile_cont(n_chars, 0.5) AS p50_chars,
             quantile_cont(n_chars, 0.95) AS p95_chars
      FROM documents)
    SELECT CAST(n_docs AS BIGINT) AS n_docs, n_tokens,
           CAST(n_langs AS BIGINT) AS n_langs,
           CAST(n_sources AS BIGINT) AS n_sources,
           ROUND(1.0 - CAST(n_unique AS DOUBLE) / n_docs, 6) AS exact_dup_rate,
           p50_chars, p95_chars
    FROM base
    """,
    doc=(
        "Dataset datasheet: the one-row corpus summary (volume, token "
        "count, language/source breadth, exact-dup rate, length "
        "percentiles) every published training set ships with."
    ),
)
def pipeline_dataset_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasheets-for-datasets (Gebru et al.), the mechanical half: the
    numbers a consumer checks before training — scale (docs/tokens),
    composition breadth (languages, sources), hygiene (exact-duplicate
    rate from content hashes), and shape (median/p95 length). Every
    number here is recomputable downstream, which is what makes the
    datasheet auditable rather than aspirational; the deeper per-family
    reports (quality funnel, language stats, contamination) hang off the
    same corpus scan in the other curation faces.

    Scale shape: ONE pass over documents — counts and token sums combine
    map-side; the distinct counts shuffle 16-byte hashes / short codes;
    exact percentiles are the engines' shared interpolated form. Output
    is one row regardless of corpus size."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).cast("bigint").alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
        F.expr("percentile(n_chars, 0.5)").alias("p50_chars"),
        F.expr("percentile(n_chars, 0.95)").alias("p95_chars"),
    )
    return base.select(
        F.col("n_docs").cast("bigint").alias("n_docs"),
        "n_tokens",
        F.col("n_langs").cast("bigint").alias("n_langs"),
        F.col("n_sources").cast("bigint").alias("n_sources"),
        F.round(
            F.lit(1.0) - F.col("n_unique").cast("double") / F.col("n_docs"), 6
        ).alias("exact_dup_rate"),
        "p50_chars",
        "p95_chars",
    )


def _sql_incremental_dedup() -> str:
    from trike_spark.registry import REGISTRY

    return REGISTRY["dedup_incremental_lsh"].oracle


@register(
    "pipeline_incremental_dedup_refresh",
    _sql_incremental_dedup(),
    doc=(
        "Continuous corpus refresh end-to-end: base corpus committed to a "
        "versioned table, a batch appended, read_incremental feeds the "
        "LSH probe against the v1 standing index — the lakehouse plumbing "
        "must reproduce the logical split's dedup decisions exactly."
    ),
)
def pipeline_incremental_dedup_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production loop assembled from its audited parts: documents
    land in the snapshot-versioned table (commit v1 = the standing
    corpus, commit v2 = tonight's batch), the consumer picks up EXACTLY
    the delta via ``read_incremental`` (no rescan, no overlap), and the
    delta probes the v1 index with the same narrow minhash chain the
    static and streaming faces use. The oracle is the LOGICAL
    incremental-dedup face's SQL verbatim — hash equality proves the
    lakehouse feed (manifest delta directories) is indistinguishable
    from the logical split, which is the whole correctness claim of
    incremental processing.

    Scale shape: the versioned reads plan from manifests (O(1) listing);
    the probe is the band-keyed join bounded by collisions; the index
    side would be a materialized bucket table in production (the
    incremental face's docstring covers that knob)."""
    import shutil

    from trike_spark import versioned
    from trike_spark.queries.dedup import NEW_BATCH_PCT, _h60, minhash_buckets_df
    from trike_spark.queries.scans import _scan_tmp

    path = _scan_tmp(spark, "incr_dedup_corpus")
    shutil.rmtree(path, ignore_errors=True)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    draw = _h60(F.col("doc_id").cast("string")) % 100
    v1 = versioned.commit(d.filter(draw >= NEW_BATCH_PCT), path, mode="append")
    versioned.commit(d.filter(draw < NEW_BATCH_PCT), path, mode="append")
    arriving, _hw = versioned.read_incremental(spark, path, since_version=v1)
    index = minhash_buckets_df(versioned.read_version(spark, path, v1)).select(
        F.col("doc_id").alias("idx_doc"), "band_idx", "band_hash"
    )
    probes = minhash_buckets_df(arriving).select(
        F.col("doc_id").alias("new_doc"), "band_idx", "band_hash"
    )
    hits = probes.join(index, ["band_idx", "band_hash"])
    return hits.groupBy(F.col("new_doc").alias("doc_id")).agg(
        F.min("idx_doc").alias("dup_of"),
        F.count_distinct("band_idx").alias("n_hit_bands"),
    )

