"""Text-analysis operators over ``documents``: corpus stats, term
frequency, n-grams, language-ID heuristic, quality scoring, token
counting, fingerprinting (SURVEY.md §2.6 "Text analysis"; driver contract
"text analysis" extension ops).

Scale notes: tokenization stays array-valued inside the row (no explode)
until an aggregation genuinely needs token-level rows; the explode-then-
groupBy paths (term frequency, bigrams) are the canonical map-side-combine
shape — partial counts before the shuffle, so the wire carries (token,
partial_count), not raw tokens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trike_spark.io import load_table
from trike_spark.queries._util import davg, sql_davg
from trike_spark.registry import register


def _tokens() -> Column:
    return F.split(F.col("text"), " ")


@register(
    "text_stats_by_lang_source",
    f"""
    SELECT lang, source, COUNT(*) AS n_docs,
           {sql_davg('n_chars')} AS avg_chars,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
           {sql_davg("len(string_split(text, ' '))")} AS avg_tokens
    FROM documents GROUP BY lang, source
    """,
    doc="Corpus statistics grouped by language and source.",
)
def text_stats_by_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        davg("n_chars").alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        davg(F.size(_tokens())).alias("avg_tokens"),
    )


@register(
    "text_tokens_top20",
    """
    SELECT token, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token ORDER BY freq DESC, token LIMIT 20
    """,
    doc="Term frequency: explode → partial-count → shuffle → top-k.",
)
def text_tokens_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(20)
    )


@register(
    "text_bigrams_top10",
    """
    SELECT bigram, COUNT(*) AS freq
    FROM (
      SELECT unnest(list_transform(
               list_zip(l[1:len(l)-1], l[2:len(l)]),
               p -> p[1] || ' ' || p[2])) AS bigram
      FROM (SELECT string_split(text, ' ') AS l FROM documents)
    )
    GROUP BY bigram ORDER BY freq DESC, bigram LIMIT 10
    """,
    doc="Bigram frequency via array zip (no self-join), then explode + count.",
)
def text_bigrams_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = _tokens()
    bigrams = F.zip_with(
        F.slice(t, 1, F.size(t) - 1),
        F.slice(t, 2, F.size(t) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("bigram"))
        .limit(10)
    )


# stopword votes per language for the heuristic language-ID
_LANG_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "y"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "et", "les"),
    "zh": ("的", "是", "了", "在"),
}


@register(
    "text_langid_heuristic",
    f"""
    WITH scored AS (
      SELECT doc_id, lang AS actual_lang,
        {', '.join(
            "len(list_filter(string_split(text, ' '), t -> t IN ("
            + ', '.join(f"'{m}'" for m in ms) + f"))) AS hits_{lg}"
            for lg, ms in _LANG_MARKERS.items()
        )}
      FROM documents)
    SELECT doc_id, actual_lang,
           CASE WHEN hits_en >= hits_es AND hits_en >= hits_de AND hits_en >= hits_fr AND hits_en >= hits_zh THEN 'en'
                WHEN hits_es >= hits_de AND hits_es >= hits_fr AND hits_es >= hits_zh THEN 'es'
                WHEN hits_de >= hits_fr AND hits_de >= hits_zh THEN 'de'
                WHEN hits_fr >= hits_zh THEN 'fr'
                ELSE 'zh' END AS predicted_lang,
           hits_en + hits_es + hits_de + hits_fr + hits_zh AS total_marker_hits
    FROM scored
    """,
    doc="Language-ID: stopword-marker voting, pure column expressions.",
)
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = _tokens()
    # NB: higher-order lambdas must take exactly one parameter — pyspark
    # treats a second parameter (even defaulted) as the array index.
    def _marker_hits(ms: tuple[str, ...]) -> Column:
        return F.size(F.filter(t, lambda x: x.isin(*ms)))

    hits = {lg: _marker_hits(ms) for lg, ms in _LANG_MARKERS.items()}
    pred = (
        F.when(
            (hits["en"] >= hits["es"]) & (hits["en"] >= hits["de"])
            & (hits["en"] >= hits["fr"]) & (hits["en"] >= hits["zh"]),
            "en",
        )
        .when((hits["es"] >= hits["de"]) & (hits["es"] >= hits["fr"]) & (hits["es"] >= hits["zh"]), "es")
        .when((hits["de"] >= hits["fr"]) & (hits["de"] >= hits["zh"]), "de")
        .when(hits["fr"] >= hits["zh"], "fr")
        .otherwise("zh")
    )
    total = hits["en"] + hits["es"] + hits["de"] + hits["fr"] + hits["zh"]
    return d.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        pred.alias("predicted_lang"),
        total.alias("total_marker_hits"),
    )


@register(
    "text_quality_score",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           ROUND(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS avg_token_len,
           ROUND(CAST(len(list_filter(string_split(text, ' '),
                 t -> t IN ('the', 'a', 'of', 'and', 'is'))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS stopword_ratio,
           ROUND(CAST(LENGTH(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                 / LENGTH(text), 6) AS punct_ratio,
           CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 1000
                 AND CAST(LENGTH(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                     / LENGTH(text) < 0.1
                THEN 1 ELSE 0 END AS passes_quality
    FROM documents
    """,
    doc="Quality scoring: length / stopword / punctuation heuristics (C4-style filters).",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = _tokens()
    n_tokens = F.size(t)
    stop_hits = F.size(F.filter(t, lambda x: x.isin("the", "a", "of", "and", "is")))
    punct_len = F.length(F.regexp_replace(F.col("text"), F.lit("[a-z0-9 ]"), F.lit("")))
    punct_ratio = punct_len.cast("double") / F.length("text")
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / n_tokens,
            6,
        ).alias("avg_token_len"),
        F.round(stop_hits.cast("double") / n_tokens, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.when(n_tokens.between(20, 1000) & (punct_ratio < 0.1), 1)
        .otherwise(0)
        .alias("passes_quality"),
    )


@register(
    "text_token_count",
    r"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_ish_tokens,
           CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS chars_div4_est
    FROM documents
    """,
    doc="Token counting: whitespace, BPE-ish regex pieces, chars/4 estimate.",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_tokens()).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)).alias(
            "bpe_ish_tokens"
        ),
        F.ceil(F.length("text") / 4.0).alias("chars_div4_est"),
    )


@register(
    "text_explode_outer_trigrams",
    """
    SELECT doc_id, s AS shingle
    FROM (
      SELECT doc_id,
             unnest(CASE WHEN len(tg) = 0 THEN [NULL] ELSE tg END) AS s
      FROM (
        SELECT doc_id,
               list_distinct(list_transform(
                 list_zip(l[1:len(l)-2], l[2:len(l)-1], l[3:len(l)]),
                 p -> p[1] || ' ' || p[2] || ' ' || p[3])) AS tg
        FROM (SELECT doc_id, string_split(text, ' ')[1:2] AS l
              FROM documents WHERE doc_id % 25 = 0)))
    """,
    doc="explode_outer: rows with empty shingle arrays survive as NULL rows.",
)
def text_explode_outer_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigrams over only the first 2 tokens are always empty — the point:
    ``explode_outer`` keeps those documents as NULL rows (a plain explode
    would silently drop them from the corpus)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    t = F.slice(_tokens(), 1, 2)
    n = F.size(t)
    z = F.zip_with(
        F.slice(t, 1, n - 2), F.slice(t, 2, n - 2), lambda a, b: F.concat(a, F.lit(" "), b)
    )
    tg = F.array_distinct(
        F.zip_with(z, F.slice(t, 3, n - 2), lambda ab, c: F.concat(ab, F.lit(" "), c))
    )
    return d.select("doc_id", F.explode_outer(tg).alias("shingle"))


@register(
    "text_tfidf_top3",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             ROUND(tf.tf * ROUND(LN(CAST(n.n_docs AS DOUBLE) / df.df), 6), 6) AS tfidf
      FROM tf JOIN df ON tf.token = df.token CROSS JOIN n)
    SELECT doc_id, token, tfidf, rk FROM (
      SELECT doc_id, token, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rk
      FROM scored)
    WHERE rk <= 3
    """,
    doc="TF-IDF: top-3 highest-scoring terms per document (tf × ln(N/df)).",
)
def text_tfidf_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three aggregations sharing one tokenization: tf (doc,token), df
    (token, broadcastable — vocabulary-sized), N (scalar). The scoring
    join broadcasts df so the (doc,token) stream never reshuffles."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()  # scalar dimension (a count, not data motion)
    scored = tf.join(broadcast(df), "token").select(
        "doc_id",
        "token",
        F.round(
            F.col("tf") * F.round(F.log(F.lit(float(n_docs)) / F.col("df")), 6), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "token", "tfidf", "rk")
    )


@register(
    "text_rolling_hash",
    """
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ' '),
                 t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % 1073741824)),
             (acc, h) -> (acc * 31 + h) % 2147483647) AS rolling_hash
    FROM documents
    """,
    doc="Polynomial rolling hash over the token stream (order-sensitive document fingerprint).",
)
def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h = fold(tokens, acc·31 + h30(token) mod 2^31-1) — order-sensitive,
    unlike the bag-of-words fingerprint; all arithmetic bounded < 2^36 so
    both engines stay in exact bigint range."""
    d = load_table(spark, sf_dir, "documents")
    hs = F.transform(
        _tokens(),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint") % (1 << 30),
    )
    rolling = F.aggregate(
        hs,
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * 31 + h) % 2_147_483_647,
    )
    return d.select("doc_id", rolling.alias("rolling_hash"))


@register(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bow_fingerprint,
           md5(text) AS exact_fingerprint
    FROM documents
    """,
    doc="Document fingerprints: exact md5 + order-insensitive bag-of-words md5.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(_tokens())))).alias(
            "bow_fingerprint"
        ),
        F.md5("text").alias("exact_fingerprint"),
    )


@register(
    "text_token_entropy",
    """
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           ROUND(LOG2(CAST(n AS DOUBLE)) - s / n, 4) AS token_entropy
    FROM (
      SELECT doc_id, SUM(c) AS n,
             SUM(CAST(c AS DOUBLE) * LOG2(CAST(c AS DOUBLE))) AS s
      FROM (SELECT doc_id, t, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                  FROM documents)
            GROUP BY doc_id, t)
      GROUP BY doc_id)
    """,
    doc="Per-document Shannon entropy of the token distribution — the "
    "classic repetitiveness/quality signal (low entropy = template spam).",
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H = log2(n) − Σ c·log2(c) / n over per-doc token counts — the
    algebraic form that needs ONE pass over (doc, token) counts and no
    per-token probability division. Cross-engine determinism: counts are
    exact integers; log2 may differ by an ulp between libm and the JVM, so
    the result is rounded to 4 dp — a ~1e-13 discrepancy cannot cross a
    5e-5 rounding boundary (probability ~1e-9/doc, vs ~1e-4 at the
    checker's 9 dp — the rounding IS the determinism contract here).
    Scale: two shuffles, both on doc-keyed aggregates (partial combine
    map-side); output is one row per document."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c").cast("double") * F.log2(F.col("c").cast("double"))).alias("s"),
    )
    return per_doc.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.round(F.log2(F.col("n").cast("double")) - F.col("s") / F.col("n"), 4).alias(
            "token_entropy"
        ),
    )


@register(
    "text_repetition_signals",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id, t, length(t) AS n,
             list_transform(list_zip(t[1:length(t)-1], t[2:length(t)]),
                            p -> p[1] || ' ' || p[2]) AS big,
             list_transform(list_zip(t[1:length(t)-2], t[2:length(t)-1],
                                     t[3:length(t)]),
                            p -> p[1] || ' ' || p[2] || ' ' || p[3]) AS tri
      FROM toks)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           ROUND(CAST(list_max(list_transform(list_distinct(t),
                   x -> length(list_filter(t, y -> y = x)))) AS DOUBLE)
                 / n, 6) AS top_token_frac,
           CASE WHEN n < 2 THEN 0.0 ELSE
             ROUND(CAST(length(big) - length(list_distinct(big)) AS DOUBLE)
                   / length(big), 6) END AS dup_2gram_frac,
           CASE WHEN n < 3 THEN 0.0 ELSE
             ROUND(CAST(length(tri) - length(list_distinct(tri)) AS DOUBLE)
                   / length(tri), 6) END AS dup_3gram_frac
    FROM grams
    """,
    doc="Gopher-style repetition quality signals: top-token fraction and "
    "duplicate 2-/3-gram fractions per document.",
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition filters from the Gopher/MassiveText curation recipe
    (Rae et al. 2021, §A1.1 — public): documents dominated by one token or
    by duplicated n-grams are boilerplate/spam and get dropped before
    training. Signals per doc: fraction of tokens equal to the modal
    token, and the fraction of word 2-/3-grams that are repeats.

    Scale: zero shuffles and zero explodes — every signal is a per-row
    array expression (zip_with n-gram assembly, array_distinct counting),
    so the pass is embarrassingly parallel, stays in whole-stage codegen,
    and reads only (doc_id, text). The modal-token count is
    O(distinct x tokens) per row — bounded by document length, not corpus
    size. A 100 TB curation sweep runs this in the same scan as the other
    quality signals (see pipeline_training_data_prep for the fused shape).
    """
    t = F.col("t")
    n = F.size(t)
    big = F.expr(
        "zip_with(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1), "
        "(a, b) -> concat(a, ' ', b))"
    )
    tri = F.expr(
        "zip_with(slice(t, 1, size(t)-2), "
        "zip_with(slice(t, 2, size(t)-2), slice(t, 3, size(t)-2), "
        "(b, c) -> concat(b, ' ', c)), "
        "(a, bc) -> concat(a, ' ', bc))"
    )
    top_cnt = F.array_max(
        F.transform(F.array_distinct(t), lambda x: F.size(F.filter(t, lambda y: y == x)))
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    )
    grams = docs.select("doc_id", t.alias("t"), n.alias("n"), big.alias("big"), tri.alias("tri"))

    def dup_frac(col: str) -> Column:
        g = F.col(col)
        return F.round(
            (F.size(g) - F.size(F.array_distinct(g))).cast("double") / F.size(g), 6
        )

    return grams.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.round(top_cnt.cast("double") / F.col("n"), 6).alias("top_token_frac"),
        F.when(F.col("n") < 2, F.lit(0.0)).otherwise(dup_frac("big")).alias("dup_2gram_frac"),
        F.when(F.col("n") < 3, F.lit(0.0)).otherwise(dup_frac("tri")).alias("dup_3gram_frac"),
    )


VOCAB_K = 100  # vocabulary size for the coverage metric


@register(
    "text_vocab_coverage",
    f"""
    WITH vocab AS (
      SELECT token FROM (
        SELECT token, COUNT(*) AS freq
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token ORDER BY freq DESC, token LIMIT {VOCAB_K})),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           ROUND(CAST(COUNT(*) - COUNT(v.token) AS DOUBLE) / COUNT(*), 6) AS oov_rate
    FROM tok t LEFT JOIN vocab v ON t.token = v.token
    GROUP BY t.doc_id
    """,
    doc=f"Vocabulary build (top-{VOCAB_K} by frequency) + per-doc OOV rate against it.",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass tokenizer-vocabulary shape: pass 1 builds the top-V
    vocabulary (explode → map-side partial count → tiny top-V), pass 2
    re-scans the corpus and LEFT-joins each token against the BROADCAST
    vocabulary. At 100 TB the corpus never shuffles on token — the only
    wide exchange is the per-doc count, keyed on doc_id (the natural
    partitioning of the scan), and the vocabulary is a ~KB broadcast.
    The OOV rate is the standard "does my tokenizer cover this corpus
    slice" curation signal."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(VOCAB_K)
        .select("token")
    )
    from pyspark.sql.functions import broadcast

    joined = tok.join(
        broadcast(vocab.withColumn("in_vocab", F.lit(1))), on="token", how="left"
    )
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(
            (F.count(F.lit(1)) - F.count("in_vocab")).cast("double") / F.count(F.lit(1)), 6
        ).alias("oov_rate"),
    )


@register(
    "text_unigram_logprob",
    """
    WITH cnt AS (
      SELECT token, COUNT(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY token),
    tot AS (SELECT SUM(freq) AS n FROM cnt),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           ROUND(SUM(-LOG2(CAST(c.freq AS DOUBLE) / tot.n)) / COUNT(*), 6)
             AS mean_neg_log2p
    FROM tok t JOIN cnt c ON t.token = c.token CROSS JOIN tot
    GROUP BY t.doc_id
    """,
    doc="Unigram-LM quality score: per-doc mean -log2 p(token) under the corpus unigram model.",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic LM-based quality filter (perplexity proxy): train a
    unigram model on the corpus itself, score each document by mean
    surprisal. Same broadcast discipline as text_vocab_coverage — the
    unigram table is vocabulary-sized (KBs–MBs) and broadcast; the corpus
    makes one extra narrow pass. Every token is in the model by
    construction (trained on the same corpus), so the join is inner with
    no smoothing term needed."""
    from pyspark.sql.functions import broadcast

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("token"))
    cnt = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    tot = cnt.agg(F.sum("freq").alias("n"))
    model = cnt.crossJoin(broadcast(tot)).select(
        "token", (F.col("freq").cast("double") / F.col("n")).alias("p")
    )
    return (
        tok.join(broadcast(model), on="token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum(-F.log2("p")) / F.count(F.lit(1)), 6).alias("mean_neg_log2p"),
        )
    )


@register(
    "text_length_histogram",
    """
    SELECT CAST(FLOOR(LOG2(len(string_split(text, ' ')))) AS BIGINT) AS log2_bucket,
           COUNT(*) AS n_docs,
           MIN(len(string_split(text, ' '))) AS min_tokens,
           MAX(len(string_split(text, ' '))) AS max_tokens
    FROM documents
    GROUP BY log2_bucket
    """,
    doc="Token-length distribution in log2 buckets — the corpus-shape report.",
)
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length-distribution report (the chart every curation run
    starts from): log2 buckets so the histogram has ~20 rows whether the
    corpus is 1 GB or 100 TB. Bucket ids are FLOOR(LOG2(n)) on integer
    token counts — log2 of an int is computed identically enough across
    engines that the floor is only ambiguous at exact powers of two,
    where IEEE log2 is exact anyway. One map-side-combined aggregation."""
    d = load_table(spark, sf_dir, "documents")
    n = F.size(F.split("text", " "))
    return (
        d.select(F.floor(F.log2(n)).cast("bigint").alias("log2_bucket"), n.alias("n_tokens"))
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


# --- bigram LM scoring with stupid-backoff ----------------------------------

BACKOFF_ALPHA = 0.4  # Brants et al. "stupid backoff" weight


@register(
    "text_bigram_logprob",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    bg AS (
      SELECT doc_id, p[1] || ' ' || p[2] AS bigram, p[1] AS prefix, p[2] AS w
      FROM (SELECT doc_id, unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
            FROM toks)),
    bcnt AS (SELECT bigram, COUNT(*) AS bc FROM bg GROUP BY bigram),
    pcnt AS (SELECT prefix, COUNT(*) AS pc FROM bg GROUP BY prefix),
    ucnt AS (
      SELECT token, COUNT(*) AS uc
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY token),
    tot AS (SELECT SUM(uc) AS n FROM ucnt)
    SELECT g.doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(SUM(-LOG2(
             CASE WHEN b.bc IS NOT NULL
                  THEN CAST(b.bc AS DOUBLE) / p.pc
                  ELSE {BACKOFF_ALPHA} * CAST(u.uc AS DOUBLE) / tot.n
             END)) / COUNT(*), 6) AS mean_neg_log2p
    FROM bg g
    LEFT JOIN bcnt b ON g.bigram = b.bigram
    JOIN pcnt p ON g.prefix = p.prefix
    JOIN ucnt u ON g.w = u.token
    CROSS JOIN tot
    GROUP BY g.doc_id
    """,
    doc=(
        "Bigram-LM quality score with stupid backoff (p = c(ab)/c(a·), "
        "else 0.4·p_unigram): per-doc mean -log2 p — the sharper LM "
        "filter one rung above the unigram face."
    ),
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring with stupid backoff (Brants et al.,
    EMNLP'07 — the backoff made for distributed LMs precisely because it
    needs no normalization pass): p(w|a) = c(aw)/c(a·) when the bigram
    was seen, else α·p_unigram(w). Scores are mean per-token surprisal,
    the standard perplexity-based quality filter at one more order of
    context than ``text_unigram_logprob`` (when trained on the corpus
    itself every bigram IS seen; the backoff leg is exercised the moment
    the model tables are frozen and applied to new text — same plan).

    Scale: the bigram/prefix/unigram count tables are vocabulary-sized
    and broadcast here; at web scale the bigram table outgrows broadcast
    and the same plan degrades gracefully to shuffle hash joins keyed on
    the n-gram — which is exactly how Brants et al. sharded their LM.
    Corpus passes: one explode for counting, one for scoring."""
    from pyspark.sql.functions import broadcast

    d = load_table(spark, sf_dir, "documents")
    l = _tokens()
    n = F.size(l)
    pairs = F.zip_with(
        F.slice(l, 1, n - 1),
        F.slice(l, 2, n - 1),
        lambda a, b: F.struct(a.alias("prefix"), b.alias("w")),
    )
    bg = (
        d.select("doc_id", F.explode(pairs).alias("p"))
        .select(
            "doc_id",
            F.concat_ws(" ", "p.prefix", "p.w").alias("bigram"),
            F.col("p.prefix").alias("prefix"),
            F.col("p.w").alias("w"),
        )
    )
    from trike_spark import cache

    bg = cache.checkpoint(bg)
    bcnt = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("bc"))
    pcnt = bg.groupBy("prefix").agg(F.count(F.lit(1)).alias("pc"))
    tok = d.select(F.explode(l).alias("token"))
    ucnt = tok.groupBy("token").agg(F.count(F.lit(1)).alias("uc"))
    tot = ucnt.agg(F.sum("uc").alias("n"))

    p = F.when(
        F.col("bc").isNotNull(), F.col("bc").cast("double") / F.col("pc")
    ).otherwise(F.lit(BACKOFF_ALPHA) * F.col("uc").cast("double") / F.col("n"))
    return (
        bg.join(broadcast(bcnt), "bigram", "left")
        .join(broadcast(pcnt), "prefix")
        .join(broadcast(ucnt), bg.w == ucnt.token)
        .crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum(-F.log2(p)) / F.count(F.lit(1)), 6).alias("mean_neg_log2p"),
        )
    )


# --- BPE merge induction (distributed, exact) -------------------------------

BPE_MERGES = 3


def _sql_bpe_round(r: int) -> str:
    """One BPE round as CTEs: pair counts → argmax → greedy non-overlapping
    merge via gaps-and-islands parity → rebuilt symbol arrays."""
    w, nxt = f"words{r}", f"words{r + 1}"
    return f"""
    ex{r} AS (
      SELECT word_id, wc, generate_subscripts(syms, 1) AS pos, unnest(syms) AS sym
      FROM {w}),
    lx{r} AS (
      SELECT word_id, wc, pos, sym,
             LEAD(sym) OVER (PARTITION BY word_id ORDER BY pos) AS nxt
      FROM ex{r}),
    pc{r} AS (
      SELECT sym AS a, nxt AS b, SUM(wc) AS cnt
      FROM lx{r} WHERE nxt IS NOT NULL GROUP BY sym, nxt),
    best{r} AS (
      SELECT a, b, cnt FROM pc{r}
      ORDER BY cnt DESC, a, b LIMIT 1),
    mt{r} AS (
      SELECT l.word_id, l.pos
      FROM lx{r} l CROSS JOIN best{r} bp
      WHERE l.sym = bp.a AND l.nxt = bp.b),
    isl{r} AS (
      SELECT word_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY word_id ORDER BY pos) AS island
      FROM mt{r}),
    act{r} AS (
      SELECT word_id, pos FROM (
        SELECT word_id, pos,
               ROW_NUMBER() OVER (PARTITION BY word_id, island ORDER BY pos) AS rn
        FROM isl{r})
      WHERE rn % 2 = 1),
    {nxt} AS (
      SELECT l.word_id, l.wc,
             list(CASE WHEN a1.pos IS NOT NULL THEN l.sym || l.nxt ELSE l.sym END
                  ORDER BY l.pos) AS syms
      FROM lx{r} l
      LEFT JOIN act{r} a1 ON l.word_id = a1.word_id AND l.pos = a1.pos
      LEFT JOIN act{r} a0 ON l.word_id = a0.word_id AND l.pos = a0.pos + 1
      WHERE a0.pos IS NULL
      GROUP BY l.word_id, l.wc)
    """


@register(
    "text_bpe_merges",
    f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents),
    words0 AS (
      SELECT token AS word_id, COUNT(*) AS wc,
             list_transform(generate_series(1, length(token)), i -> token[i]) AS syms
      FROM tok GROUP BY token),
    {','.join(_sql_bpe_round(r) for r in range(BPE_MERGES))}
    {' UNION ALL '.join(
        f"SELECT {r} AS round, a AS sym_a, b AS sym_b, CAST(cnt AS BIGINT) AS pair_count FROM best{r}"
        for r in range(BPE_MERGES)
    )}
    """,
    doc=(
        f"Byte-pair-encoding vocabulary induction: the first {BPE_MERGES} "
        "merges learned over the corpus word-count table — greedy "
        "non-overlapping pair merging done exactly (gaps-and-islands "
        "parity), integer counts, lexicographic tie-breaks."
    ),
)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE training (Sennrich et al., ACL'16) — the tokenizer-
    construction step of every LLM data pipeline — with EXACT semantics:

      * trains on the word-count table (vocabulary-sized), not the corpus
        stream: the classic trick that makes BPE scale — a 100 TB corpus
        still reduces to ~10⁷ (word, count) rows after the first groupBy,
        and every merge round is windows+joins over that table;
      * each round: weighted adjacent-pair counts → argmax (count desc,
        pair lexicographic — fully deterministic) → greedy LEFT-TO-RIGHT
        non-overlapping merge. Greedy non-overlap is sequential on paper;
        here it is closed-form: runs of consecutive match positions (only
        possible when A=B) activate alternate members — gaps-and-islands
        parity, two window functions, no iteration within the round;
      * symbol arrays rebuilt per round; plan depth grows linearly in
        merge count and each round is checkpointed, so 1000-merge
        training keeps constant per-round plan size.

    Integer counts end-to-end, so all {BPE_MERGES} learned merges and
    their frequencies hash-match the DuckDB oracle — an iterative
    algorithm whose every step is driver-verified."""
    _words, merge_rows = _bpe_train(load_table(spark, sf_dir, "documents"))
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionAll(m)
    return out


def _bpe_train(d: DataFrame) -> tuple[DataFrame, list[DataFrame]]:
    """Run BPE_MERGES training rounds over the word-count table of `d`;
    returns (final symbolized word table, one 1-row merge DF per round).
    See :func:`text_bpe_merges` for the algorithm and scale notes."""
    from trike_spark import cache

    tok = d.select(F.explode(_tokens()).alias("token"))
    words = tok.groupBy("token").agg(F.count(F.lit(1)).alias("wc")).select(
        F.col("token").alias("word_id"),
        "wc",
        F.expr(
            "transform(sequence(1, length(token)), i -> substring(token, i, 1))"
        ).alias("syms"),
    )

    merge_rows = []
    for r in range(BPE_MERGES):
        words = cache.checkpoint(words)
        # Adjacent-pair counts ARRAY-SIDE: zip the symbol array with its
        # own 1-shift and explode the pair structs. The previous shape
        # (posexplode + LEAD window, then islands-parity via two more
        # windows and two (word_id, pos) joins to rebuild the arrays)
        # shuffled the corpus' full (word, position) expansion several
        # times per round; pair counting needs exactly ONE exchange (the
        # map-side-combined (a, b) aggregate) and the merge application
        # below needs zero.
        n = F.size("syms")
        pairs = words.select(
            "wc",
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, n - 1),
                    F.slice("syms", 2, n - 1),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("p"),
        )
        pc = pairs.groupBy("p.a", "p.b").agg(F.sum("wc").alias("cnt"))
        best = pc.orderBy(F.desc("cnt"), "a", "b").limit(1).select(
            F.col("a").alias("ba"), F.col("b").alias("bb"), F.col("cnt")
        )
        best = cache.checkpoint(best)
        merge_rows.append(
            best.select(
                F.lit(r).alias("round"),
                F.col("ba").alias("sym_a"),
                F.col("bb").alias("sym_b"),
                F.col("cnt").cast("bigint").alias("pair_count"),
            )
        )
        # Greedy LEFT-TO-RIGHT non-overlapping merge as a sequential array
        # fold (zero shuffle, zero windows): carry (out, pend) — pend is
        # the previous symbol still eligible to start a merge. A merged
        # pair clears pend, so runs of overlapping matches (only possible
        # when A = B) activate alternate members exactly like the
        # gaps-and-islands parity rule this replaces — and exactly like
        # the reference greedy scan in the oracle (verified hash-identical
        # merges at sf0.01 and sf0.1 before the swap).
        zero = F.struct(
            F.expr("cast(array() as array<string>)").alias("out"),
            F.lit(None).cast("string").alias("pend"),
        )

        def step(acc, s):
            merged = (acc["pend"] == F.col("ba")) & (s == F.col("bb"))
            return (
                F.when(
                    acc["pend"].isNull(),
                    F.struct(acc["out"].alias("out"), s.alias("pend")),
                )
                .when(
                    merged,
                    F.struct(
                        F.concat(
                            acc["out"], F.array(F.concat(acc["pend"], s))
                        ).alias("out"),
                        F.lit(None).cast("string").alias("pend"),
                    ),
                )
                .otherwise(
                    F.struct(
                        F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                        s.alias("pend"),
                    )
                )
            )

        def fin(acc):
            return F.when(acc["pend"].isNull(), acc["out"]).otherwise(
                F.concat(acc["out"], F.array(acc["pend"]))
            )

        words = words.crossJoin(F.broadcast(best)).select(
            "word_id", "wc", F.aggregate("syms", zero, step, fin).alias("syms")
        )
    return words, merge_rows


@register(
    "text_bpe_encode_stats",
    f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents),
    words0 AS (
      SELECT token AS word_id, COUNT(*) AS wc,
             list_transform(generate_series(1, length(token)), i -> token[i]) AS syms
      FROM tok GROUP BY token),
    {','.join(_sql_bpe_round(r) for r in range(BPE_MERGES))},
    wl AS (SELECT word_id, len(syms) AS n_syms FROM words{BPE_MERGES}),
    dt AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
    SELECT lang,
           COUNT(*) AS n_tokens,
           CAST(SUM(length(dt.token)) AS BIGINT) AS n_chars,
           CAST(SUM(w.n_syms) AS BIGINT) AS n_bpe_symbols,
           ROUND(CAST(SUM(length(dt.token)) AS DOUBLE) / SUM(w.n_syms), 6)
             AS chars_per_symbol
    FROM dt JOIN wl w ON dt.token = w.word_id
    GROUP BY lang
    """,
    doc=(
        f"Apply the {BPE_MERGES} learned BPE merges and report per-language "
        "corpus compression (chars vs post-BPE symbols) — the encode side "
        "of the tokenizer, closing the train→apply loop."
    ),
)
def text_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The encode side of the BPE pipeline: re-tokenize the corpus under
    the merges ``text_bpe_merges`` learned and report per-language token
    statistics — exactly the tokenizer-fertility report (chars/symbol,
    symbols/word) that decides whether a vocabulary suits a multilingual
    corpus. Encoding rides the symbolized WORD table (vocabulary-sized):
    documents never re-process — each doc token joins its word's final
    symbol count, so the corpus-side cost is one explode + one broadcast
    join regardless of merge count. Integer counts + one pinned double
    division ⇒ hash-matches the oracle."""
    from pyspark.sql.functions import broadcast

    d = load_table(spark, sf_dir, "documents")
    words, _merges = _bpe_train(d)
    wl = words.select("word_id", F.size("syms").alias("n_syms"))
    dt = d.select("lang", F.explode(_tokens()).alias("token"))
    return (
        dt.join(broadcast(wl), dt.token == wl.word_id)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.length("token")).cast("bigint").alias("n_chars"),
            F.sum("n_syms").cast("bigint").alias("n_bpe_symbols"),
            F.round(
                F.sum(F.length("token")).cast("double") / F.sum("n_syms"), 6
            ).alias("chars_per_symbol"),
        )
    )


# --- langid evaluation: confusion matrix ------------------------------------


def _langid_oracle_sql() -> str:
    from trike_spark.registry import REGISTRY

    return REGISTRY["text_langid_heuristic"].oracle


@register(
    "text_langid_confusion",
    f"""
    SELECT actual_lang, predicted_lang, COUNT(*) AS n,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (PARTITION BY actual_lang), 6) AS share
    FROM ({_langid_oracle_sql()})
    GROUP BY actual_lang, predicted_lang
    """,
    doc=(
        "Language-ID confusion matrix (actual × predicted counts + "
        "per-actual share) — the eval report for the classifier face."
    ),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation as a first-class face: the confusion matrix
    (and per-class recall shares) of the langid heuristic against the
    labeled lang column. Composes the scoring face unchanged — predictions
    are narrow column expressions, so the whole evaluation is one
    ≤|langs|² aggregation; the share division is one pinned double over
    two exact counts. At 100 TB you'd run this on a stratified sample
    (curation_stratified_sample) — the plan is identical."""
    pred = text_langid_heuristic(spark, sf_dir)
    counts = pred.groupBy("actual_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("actual_lang")
    return counts.select(
        "actual_lang",
        "predicted_lang",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(w), 6).alias("share"),
    )


# --- quality-gate rejection funnel ------------------------------------------

# Ordered Gopher/C4-style gates with integer-exact thresholds:
#   too_short      n_tokens < 20
#   too_long       n_tokens > 90
#   low_diversity  distinct/n < 0.35       (20·distinct < 7·n)
#   repetitive     max token share > 0.08  (25·max_cnt > 2·n)
QF_RULES = ["too_short", "too_long", "low_diversity", "repetitive"]


@register(
    "text_quality_funnel",
    """
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    tcnt AS (
      SELECT doc_id, t, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(toks) AS t FROM tok) GROUP BY 1, 2),
    sig AS (
      SELECT tok.doc_id,
             len(tok.toks) AS n,
             len(list_distinct(tok.toks)) AS nd,
             m.mx
      FROM tok JOIN (SELECT doc_id, MAX(c) AS mx FROM tcnt GROUP BY 1) m
        ON m.doc_id = tok.doc_id),
    flags AS (
      SELECT doc_id,
             (n < 20) AS f1, (n > 90) AS f2,
             (20 * nd < 7 * n) AS f3, (25 * mx > 2 * n) AS f4
      FROM sig),
    firsts AS (
      SELECT doc_id,
             CASE WHEN f1 THEN 'too_short'
                  WHEN f2 THEN 'too_long'
                  WHEN f3 THEN 'low_diversity'
                  WHEN f4 THEN 'repetitive'
                  ELSE 'pass' END AS first_rule,
             f1, f2, f3, f4
      FROM flags)
    SELECT rule, rule_order, n_rejected_first, n_failing FROM (
      SELECT 'too_short' AS rule, 1 AS rule_order,
             COUNT(*) FILTER (first_rule = 'too_short') AS n_rejected_first,
             COUNT(*) FILTER (f1) AS n_failing FROM firsts
      UNION ALL
      SELECT 'too_long', 2, COUNT(*) FILTER (first_rule = 'too_long'),
             COUNT(*) FILTER (f2) FROM firsts
      UNION ALL
      SELECT 'low_diversity', 3, COUNT(*) FILTER (first_rule = 'low_diversity'),
             COUNT(*) FILTER (f3) FROM firsts
      UNION ALL
      SELECT 'repetitive', 4, COUNT(*) FILTER (first_rule = 'repetitive'),
             COUNT(*) FILTER (f4) FROM firsts
      UNION ALL
      SELECT 'pass', 5, COUNT(*) FILTER (first_rule = 'pass'),
             COUNT(*) FILTER (first_rule = 'pass') FROM firsts)
    ORDER BY rule_order
    """,
    doc=(
        "Quality-gate rejection funnel: per-rule first-rejection and "
        "marginal-failure counts for the ordered length/diversity/"
        "repetition gates, plus the surviving-docs row."
    ),
)
def text_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operational artifact a filtering pipeline actually reviews: not
    each doc's score but the FUNNEL — how many documents each ordered gate
    rejects first (attribution), how many fail it at all (marginal rate,
    shows rule overlap), and what survives. Signals are integer-exact
    (counts and cross-multiplied thresholds — no float ratios to drift).
    One explode+groupBy computes the per-doc max token count (map-side
    combine on (doc, token)); everything after is per-doc narrow math and
    a 5-row report, so the corpus is read once regardless of scale. Rule
    order mirrors cost: cheap length gates first — at 100 TB you'd
    short-circuit the explode for docs the length gates already killed
    (Spark does exactly this: the CASE evaluates lazily)."""
    d = load_table(spark, sf_dir, "documents")
    t = _tokens()
    # ONE corpus pass: the (doc, token) rollup's second stage yields all
    # three per-doc signals at once (n = Σc, nd = #distinct-token rows,
    # mx = max c) — the old shape joined a second documents scan for
    # n/nd, and the 5-row report unioned five aggregations of the same
    # subtree (no CSE across union legs → 10 scans). All ten counts now
    # fold in a single aggregation and the report rows come from an
    # explode of a literal struct array.
    sig = (
        d.select("doc_id", F.explode(t).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n"),
            F.count(F.lit(1)).alias("nd"),
            F.max("c").alias("mx"),
        )
    )
    firsts = sig.select(
        (F.col("n") < 20).alias("f1"),
        (F.col("n") > 90).alias("f2"),
        (20 * F.col("nd") < 7 * F.col("n")).alias("f3"),
        (25 * F.col("mx") > 2 * F.col("n")).alias("f4"),
    ).withColumn(
        "first_rule",
        F.when(F.col("f1"), "too_short")
        .when(F.col("f2"), "too_long")
        .when(F.col("f3"), "low_diversity")
        .when(F.col("f4"), "repetitive")
        .otherwise("pass"),
    )
    rules = [("too_short", "f1"), ("too_long", "f2"), ("low_diversity", "f3"), ("repetitive", "f4")]
    aggd = firsts.agg(
        *[
            F.count(F.when(F.col("first_rule") == rule, 1)).alias(f"rf{i}")
            for i, (rule, _) in enumerate(rules, start=1)
        ],
        *[
            F.count(F.when(F.col(flag), 1)).alias(f"ff{i}")
            for i, (_, flag) in enumerate(rules, start=1)
        ],
        F.count(F.when(F.col("first_rule") == "pass", 1)).alias("p"),
    )
    report = F.array(
        *[
            F.struct(
                F.lit(rule).alias("rule"),
                F.lit(i).alias("rule_order"),
                F.col(f"rf{i}").alias("n_rejected_first"),
                F.col(f"ff{i}").alias("n_failing"),
            )
            for i, (rule, _) in enumerate(rules, start=1)
        ],
        F.struct(
            F.lit("pass").alias("rule"),
            F.lit(5).alias("rule_order"),
            F.col("p").alias("n_rejected_first"),
            F.col("p").alias("n_failing"),
        ),
    )
    return (
        aggd.select(F.explode(report).alias("r")).select("r.*").orderBy("rule_order")
    )


# --- Jensen-Shannon divergence between language unigram profiles -------------


@register(
    "text_js_divergence_langs",
    """
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents),
    c AS (SELECT lang, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    n AS (SELECT lang, SUM(c) AS n FROM c GROUP BY 1),
    p AS (SELECT c.lang, c.t, CAST(c.c AS DOUBLE) / n.n AS p
          FROM c JOIN n ON n.lang = c.lang),
    hl AS (SELECT lang, -SUM(p * LOG2(p)) AS h FROM p GROUP BY lang),
    pairs AS (
      SELECT a.lang AS lang_a, b.lang AS lang_b
      FROM (SELECT DISTINCT lang FROM c) a
      JOIN (SELECT DISTINCT lang FROM c) b ON a.lang < b.lang),
    m AS (
      SELECT pr.lang_a, pr.lang_b, p.t, SUM(p.p) / 2 AS m
      FROM pairs pr JOIN p ON p.lang IN (pr.lang_a, pr.lang_b)
      GROUP BY 1, 2, 3),
    hm AS (SELECT lang_a, lang_b, -SUM(m * LOG2(m)) AS h_m
           FROM m GROUP BY 1, 2)
    SELECT hm.lang_a, hm.lang_b,
           ROUND(hm.h_m - (ha.h + hb.h) / 2, 6) AS js_divergence
    FROM hm
    JOIN hl ha ON ha.lang = hm.lang_a
    JOIN hl hb ON hb.lang = hm.lang_b
    ORDER BY lang_a, lang_b
    """,
    doc=(
        "Jensen-Shannon divergence between every language pair's unigram "
        "distribution (JS = H(M) - (H(P)+H(Q))/2, base-2, bounded by 1) — "
        "the corpus-drift / domain-shift diagnostic."
    ),
)
def text_js_divergence_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution distance between corpus slices — THE diagnostic for
    'did this source/language/crawl-batch shift?' (data-mixture work
    compares slice token distributions exactly this way). Uses the
    entropy identity JS(P,Q) = H((P+Q)/2) − (H(P)+H(Q))/2, which needs no
    full-outer token alignment: the mixture's support is the UNION of
    supports by construction of the sum. Shapes: one token count (map-
    side combined), per-language entropies over exact counts, and the
    pair mixture built by replicating each language's distribution to its
    |langs|−1 pairs via a broadcast pair list — rows ∝ vocab · pairs,
    never corpus tokens. Output is |langs|·(|langs|−1)/2 rows."""
    from pyspark.sql.functions import broadcast

    from trike_spark import cache

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(_tokens()).alias("t"))
    # The vocab-sized count table feeds three branches (totals, langs,
    # the p build) and p itself feeds two (per-lang entropies, the pair
    # mixture) — checkpoint both so the corpus explode+rollup runs once,
    # not once per branch (rows ∝ vocab·langs, never corpus tokens).
    c = cache.checkpoint(tok.groupBy("lang", "t").agg(F.count(F.lit(1)).alias("c")))
    n = c.groupBy("lang").agg(F.sum("c").alias("n"))
    p = cache.checkpoint(
        c.join(n, "lang").select(
            "lang", "t", (F.col("c").cast("double") / F.col("n")).alias("p")
        )
    )
    hl = p.groupBy("lang").agg((-F.sum(F.col("p") * F.log2("p"))).alias("h"))
    langs = c.select("lang").distinct()
    pairs = (
        langs.alias("a")
        .crossJoin(broadcast(langs.alias("b")))
        .filter(F.col("a.lang") < F.col("b.lang"))
        .select(F.col("a.lang").alias("lang_a"), F.col("b.lang").alias("lang_b"))
    )
    m = (
        p.crossJoin(broadcast(pairs))
        .filter((F.col("lang") == F.col("lang_a")) | (F.col("lang") == F.col("lang_b")))
        .groupBy("lang_a", "lang_b", "t")
        .agg((F.sum("p") / 2).alias("m"))
    )
    hm = m.groupBy("lang_a", "lang_b").agg(
        (-F.sum(F.col("m") * F.log2("m"))).alias("h_m")
    )
    ha = hl.select(F.col("lang").alias("lang_a"), F.col("h").alias("h_a"))
    hb = hl.select(F.col("lang").alias("lang_b"), F.col("h").alias("h_b"))
    return (
        hm.join(broadcast(ha), "lang_a")
        .join(broadcast(hb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            F.round(F.col("h_m") - (F.col("h_a") + F.col("h_b")) / 2, 6).alias(
                "js_divergence"
            ),
        )
        .orderBy("lang_a", "lang_b")
    )


# --- BM25 retrieval -----------------------------------------------------------

# Fixed query-term set (high-DF synthetic-vocab terms so every SF has hits).
BM25_QUERY = ("hash", "join", "merge")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 15
_BM25_IN = ", ".join(f"'{t}'" for t in BM25_QUERY)


@register(
    "text_bm25_topk",
    f"""
    WITH dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                     CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avgdl
              FROM documents),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
           WHERE token IN ({_BM25_IN}) GROUP BY doc_id, token),
    idf AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok
            WHERE token IN ({_BM25_IN}) GROUP BY token),
    term AS (
      SELECT tf.doc_id,
             ROUND(LN(1.0 + (stats.n_docs - idf.df + 0.5) / (idf.df + 0.5))
                   * ((tf.tf * {BM25_K1 + 1.0}) /
                      (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * (dl.dl / stats.avgdl)))),
                   6) AS s
      FROM tf JOIN idf ON tf.token = idf.token
              JOIN dl ON tf.doc_id = dl.doc_id
              CROSS JOIN stats)
    SELECT doc_id, CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE) AS bm25
    FROM term GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOPK}
    """,
    doc=(
        f"BM25 retrieval (k1={BM25_K1}, b={BM25_B}): top-{BM25_TOPK} documents "
        f"for the fixed query {BM25_QUERY}."
    ),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 over the corpus for a fixed |Q|=3 query.

    Scale shape: the token array is FILTERED to query terms before explode,
    so the exploded stream carries only matching tokens (|Q|/|V| of the
    corpus) — the tf shuffle is proportional to hit count, not corpus
    size. df (|Q| rows) and the one-row (N, avgdl) stats are broadcast, so
    scoring is a narrow map over the tf stream; the final top-k is
    TakeOrderedAndProject (per-partition heap + driver merge, no global
    sort). Per-term scores are rounded then summed in exact DECIMAL so the
    ≤|Q|-element fold is order-independent (driver hash contract,
    queries/_util.py).
    """
    return (
        _bm25_scores(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25) for every document hitting the fixed query — the
    shared scoring core of the BM25 face and the hybrid-RRF face."""
    from pyspark.sql.functions import broadcast

    d = load_table(spark, sf_dir, "documents")
    dl = d.select("doc_id", F.size(_tokens()).alias("dl"))
    stats = d.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum(F.size(_tokens())).cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    qlit = F.array(*[F.lit(t) for t in BM25_QUERY])
    hits = d.select(
        "doc_id",
        F.explode(F.filter(_tokens(), lambda t: F.array_contains(qlit, t))).alias("token"),
    )
    tf = hits.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    idf = hits.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    norm = F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (F.col("dl") / F.col("avgdl"))
    idf_part = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_part = (F.col("tf") * F.lit(BM25_K1 + 1.0)) / (F.col("tf") + F.lit(BM25_K1) * norm)
    term = (
        tf.join(broadcast(idf), "token")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .select("doc_id", F.round(idf_part * tf_part, 6).alias("s"))
    )
    return term.groupBy("doc_id").agg(
        F.sum(F.col("s").cast("decimal(18,6)")).cast("double").alias("bm25")
    )


# --- Hybrid retrieval (RRF fusion) --------------------------------------------

RRF_POOL = 30  # per-leg candidate pool
RRF_C = 60  # the standard RRF dampening constant
RRF_TOPK = 10

# Shared BM25-scoring CTE chain (documents → (doc_id, bm25)), reused verbatim
# by the hybrid oracle below.
_SQL_BM25_CTES = f"""
    dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                     CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*) AS avgdl
              FROM documents),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
           WHERE token IN ({_BM25_IN}) GROUP BY doc_id, token),
    idf AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok
            WHERE token IN ({_BM25_IN}) GROUP BY token),
    term AS (
      SELECT tf.doc_id,
             ROUND(LN(1.0 + (stats.n_docs - idf.df + 0.5) / (idf.df + 0.5))
                   * ((tf.tf * {BM25_K1 + 1.0}) /
                      (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * (dl.dl / stats.avgdl)))),
                   6) AS s
      FROM tf JOIN idf ON tf.token = idf.token
              JOIN dl ON tf.doc_id = dl.doc_id
              CROSS JOIN stats),
    bm25s AS (
      SELECT doc_id, CAST(SUM(CAST(s AS DECIMAL(18,6))) AS DOUBLE) AS bm25
      FROM term GROUP BY doc_id)
"""

_SQL_VCOS = (
    "(list_aggregate(list_transform(list_zip(b.embedding, qv.q_emb), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') / "
    "(SQRT(list_aggregate(list_transform(b.embedding, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) * "
    "SQRT(list_aggregate(list_transform(qv.q_emb, "
    "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))))"
)


@register(
    "sim_hybrid_rrf",
    f"""
    WITH {_SQL_BM25_CTES},
    lexr AS (
      SELECT doc_id, rl FROM (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rl
        FROM bm25s WHERE doc_id <> 0)
      WHERE rl <= {RRF_POOL}),
    qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    vecr AS (
      SELECT doc_id, rv FROM (
        SELECT b.vec_id AS doc_id,
               ROW_NUMBER() OVER (ORDER BY ROUND({_SQL_VCOS}, 6) DESC, b.vec_id) AS rv
        FROM embeddings b CROSS JOIN qv WHERE b.vec_id <> 0)
      WHERE rv <= {RRF_POOL})
    SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
           l.rl AS lex_rank, v.rv AS vec_rank,
           COALESCE(CAST(1.0 AS DOUBLE) / ({RRF_C} + l.rl), 0.0)
             + COALESCE(CAST(1.0 AS DOUBLE) / ({RRF_C} + v.rv), 0.0) AS rrf
    FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.doc_id
    ORDER BY rrf DESC, doc_id LIMIT {RRF_TOPK}
    """,
    doc=(
        f"Hybrid retrieval: BM25 and cosine top-{RRF_POOL} pools fused by "
        f"reciprocal-rank fusion (1/({RRF_C}+rank)), top-{RRF_TOPK} — the "
        "standard lexical+semantic search combiner."
    ),
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of a lexical and a
    semantic leg: each leg independently ranks its top pool (BM25 for the
    fixed term query; cosine against the vec_id=0 query embedding), and a
    document's fused score is Σ 1/(C+rank) over the legs it appears in.
    Rank-space fusion needs no score calibration between legs — exactly
    why RRF is the default hybrid combiner.

    Scale shape: each leg ends in TakeOrderedAndProject over its pool, so
    the unpartitioned rank windows run over constant-size (pool) inputs,
    never the corpus; the fusion is a full outer join of two {RRF_POOL}-row
    sets on the driver-adjacent fast path. Determinism: ranks are integers
    from tie-broken windows; the RRF score is a fixed-order sum of two
    exact reciprocals — identical bits in both engines, no rounding."""
    from pyspark.sql.functions import broadcast

    lex_pool = (
        _bm25_scores(spark, sf_dir)
        .filter(F.col("doc_id") != 0)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(RRF_POOL)
    )
    lexr = lex_pool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
        .alias("rl"),
    )

    from trike_spark.queries.vectors import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    cos = F.round(cosine(F.col("embedding"), F.col("q_emb")), 6)
    vec_pool = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(broadcast(qv))
        .select(F.col("vec_id").alias("doc_id"), cos.alias("cos"))
        .orderBy(F.col("cos").desc(), "doc_id")
        .limit(RRF_POOL)
    )
    vecr = vec_pool.select(
        "doc_id",
        F.row_number().over(Window.orderBy(F.col("cos").desc(), "doc_id")).alias("rv"),
    )

    fused = lexr.join(vecr, "doc_id", "full_outer").select(
        "doc_id",
        F.col("rl").alias("lex_rank"),
        F.col("rv").alias("vec_rank"),
        (
            F.coalesce(1.0 / (F.lit(RRF_C) + F.col("rl")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(RRF_C) + F.col("rv")), F.lit(0.0))
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), "doc_id").limit(RRF_TOPK)


# --- Zipf-law fit -------------------------------------------------------------


@register(
    "text_zipf_slope",
    """
    WITH freq AS (
      SELECT token, COUNT(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY token),
    ranked AS (
      SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rk
      FROM freq),
    pts AS (
      SELECT CAST(ROUND(LN(CAST(rk AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
             CAST(ROUND(LN(CAST(freq AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
      FROM ranked),
    s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy
      FROM pts),
    fit AS (
      SELECT n, sx, sy, syy, sxx, sxy,
             ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope
      FROM s)
    SELECT CAST(n AS BIGINT) AS vocab_size, slope,
           ROUND((sy - slope * sx) / n, 6) AS intercept,
           ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
                 ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM fit
    """,
    doc=(
        "Zipf-law fit: OLS slope/intercept/R^2 of ln(freq) vs ln(rank) over "
        "the vocabulary — the corpus-shape diagnostic (natural text ~ -1)."
    ),
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the corpus look like natural language? Natural text follows
    Zipf's law (rank-frequency slope ≈ -1 on log-log); templated or
    machine-generated corpora flatten or steepen it, so the fitted slope
    is a cheap corpus-level quality/contamination signal.

    Determinism: the regression inputs are quantized (round→DECIMAL) per
    point, all five moment sums fold exactly, and the slope/intercept/R²
    arithmetic is one pinned double expression computed from those exact
    sums — the same discipline as scalar_ols_trend_applyinpandas, but
    expressed entirely JVM-side.

    Scale shape: term frequency is the canonical map-side-combine
    shuffle; the vocabulary ranking runs BANDED
    (``operators/banded.banded_rank``) with a COMPOSITE band
    (-freq, first token char): Zipf's tail puts half of |V| at freq=1,
    so banding on frequency alone would collapse the hapax band onto one
    task — sub-banding the constant-freq runs by token prefix is still
    monotone along (freq DESC, token ASC) and keeps every band small.
    The moments reduce to a single row; at 100 TB only |V| survives the
    first aggregation — the corpus itself is touched once."""
    from trike_spark.operators.banded import banded_rank

    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    band = F.struct(
        (-F.col("freq")).alias("nf"), F.substring("token", 1, 1).alias("p")
    )
    order = [F.col("freq").desc(), F.col("token")]
    pts = banded_rank(freq, band, order, out="rk").select(
        F.round(F.log(F.col("rk").cast("double")), 6).cast("decimal(18,6)").alias("x"),
        F.round(F.log(F.col("freq").cast("double")), 6).cast("decimal(18,6)").alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    fit = s.select(
        n, sx, sy, syy, sxx, sxy,
        F.round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6).alias("slope"),
    )
    slope = F.col("slope")
    return fit.select(
        n.cast("bigint").alias("vocab_size"),
        slope,
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


# --- incremental-corpus novelty ----------------------------------------------


@register(
    "text_ngram_novelty",
    """
    WITH docs AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               list_zip(l[1:len(l)-2], l[2:len(l)-1], l[3:len(l)]),
               p -> p[1] || ' ' || p[2] || ' ' || p[3])) AS shingles
      FROM docs),
    ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    firstseen AS (SELECT s, MIN(doc_id) AS first_doc FROM ex GROUP BY s),
    novelty AS (
      SELECT ex.doc_id,
             COUNT(*) AS n_shingles,
             SUM(CASE WHEN f.first_doc = ex.doc_id THEN 1 ELSE 0 END) AS n_novel
      FROM ex JOIN firstseen f ON f.s = ex.s
      GROUP BY ex.doc_id)
    SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
           CAST(n_novel AS BIGINT) AS n_novel,
           ROUND(CAST(n_novel AS DOUBLE) / n_shingles, 6) AS novelty
    FROM novelty
    """,
    doc=(
        "Corpus novelty: per document, the fraction of its distinct "
        "trigrams first seen in it (ingest-order first occurrence)."
    ),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'How much NEW content does each document add' — the marginal-value
    curve of a growing corpus. A crawl whose late documents trend toward
    zero novelty has saturated its sources; dedup thresholds and crawl
    budgets both read off this curve. First-seen is attributed by doc_id
    (the ingest order), so the metric is the batch form of what an
    incremental pipeline computes against its standing shingle index
    (``dedup_incremental_lsh``'s exact-membership sibling).

    Scale shape: one explode → (shingle → min doc_id) aggregation (the
    first-occurrence index, map-side combined), then a shingle-keyed join
    back — the same two-shuffle skeleton as TF-IDF, with the trigram
    distinct done array-side before the explode."""
    d = load_table(spark, sf_dir, "documents")
    sh = d.select("doc_id", F.array_distinct(_trigram_arr()).alias("shingles"))
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    firstseen = ex.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    nov = (
        ex.join(firstseen, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return nov.select(
        "doc_id",
        F.col("n_shingles").cast("bigint").alias("n_shingles"),
        F.col("n_novel").cast("bigint").alias("n_novel"),
        F.round(F.col("n_novel").cast("double") / F.col("n_shingles"), 6).alias("novelty"),
    )


def _trigram_arr():
    """Word trigrams 'a b c' from the text column (the dedup shingle form)."""
    toks = _tokens()
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - 2)
    return F.when(n >= 3, F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1), F.element_at(toks, i + 2)
        ),
    )).otherwise(F.array().cast("array<string>"))


# --- word burstiness -----------------------------------------------------------

BURST_TOPN = 20


@register(
    "text_burstiness",
    f"""
    WITH per_doc AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM
        (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY doc_id, token),
    stats AS (
      SELECT token,
             COUNT(*) AS df1,
             SUM(CASE WHEN tf >= 2 THEN 1 ELSE 0 END) AS df2,
             CAST(SUM(tf) AS BIGINT) AS total_tf
      FROM per_doc GROUP BY token)
    SELECT token, CAST(df1 AS BIGINT) AS df1, CAST(df2 AS BIGINT) AS df2,
           ROUND(CAST(df2 AS DOUBLE) / df1, 6) AS burstiness
    FROM stats
    ORDER BY total_tf DESC, token LIMIT {BURST_TOPN}
    """,
    doc=(
        f"Word burstiness (Church-Gale): P(token repeats in a doc | it "
        f"appears), for the top-{BURST_TOPN} corpus terms — topical words "
        "burst, function words spread."
    ),
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-linguistics signal TF-IDF quietly relies on: content
    words are BURSTY (once a document mentions them, it mentions them
    again — df2/df1 high), function words distribute evenly (low). The
    ratio flags template/boilerplate vocabularies in a crawl and
    calibrates the repetition-quality filters.

    Scale shape: one (doc, token) rollup (the shared tf shuffle every
    text face starts from), one token-keyed reduce to |V| rows, top-N =
    TakeOrderedAndProject. Exact integer counts, one pinned division."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = (
        d.select("doc_id", F.explode(_tokens()).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = per_doc.groupBy("token").agg(
        F.count(F.lit(1)).alias("df1"),
        F.sum(F.when(F.col("tf") >= 2, 1).otherwise(0)).alias("df2"),
        F.sum("tf").cast("bigint").alias("total_tf"),
    )
    return (
        stats.orderBy(F.col("total_tf").desc(), "token")
        .limit(BURST_TOPN)
        .select(
            "token",
            F.col("df1").cast("bigint").alias("df1"),
            F.col("df2").cast("bigint").alias("df2"),
            F.round(F.col("df2").cast("double") / F.col("df1"), 6).alias("burstiness"),
        )
    )


@register(
    "text_lexical_diversity",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_types,
           ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS ttr,
           ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / SQRT(CAST(len(string_split(text, ' ')) AS DOUBLE)), 6) AS root_ttr
    FROM documents
    """,
    doc=(
        "Lexical diversity per document: type-token ratio and Guiraud's "
        "root TTR — the vocabulary-richness quality signal."
    ),
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio (distinct/total tokens) and its length-corrected
    form (Guiraud's R = types/√tokens — raw TTR shrinks with document
    length, so cross-length comparisons need the correction). Low
    diversity flags boilerplate and generation loops; pairs with the
    repetition-signals face in a quality funnel.

    Scale shape: pure per-row array expressions (split → array_distinct →
    size) — zero shuffles, zero explodes, whole-stage codegen; the two
    ratios are single pinned double divisions."""
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    n_tok = F.size(toks)
    n_typ = F.size(F.array_distinct(toks))
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_typ.alias("n_types"),
        F.round(n_typ.cast("double") / n_tok, 6).alias("ttr"),
        F.round(n_typ.cast("double") / F.sqrt(n_tok.cast("double")), 6).alias("root_ttr"),
    )


@register(
    "text_hapax_legomena",
    """
    WITH freq AS (
      SELECT token, COUNT(*) AS f
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY token),
    s AS (
      SELECT COUNT(*) AS vocab_size,
             CAST(SUM(f) AS BIGINT) AS n_tokens,
             SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS n_hapax,
             SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS n_dis
      FROM freq)
    SELECT CAST(vocab_size AS BIGINT) AS vocab_size, n_tokens,
           CAST(n_hapax AS BIGINT) AS n_hapax, CAST(n_dis AS BIGINT) AS n_dis,
           ROUND(CAST(n_hapax AS DOUBLE) / vocab_size, 6) AS hapax_ratio,
           ROUND(LN(CAST(vocab_size AS DOUBLE))
                 / LN(CAST(n_tokens AS DOUBLE)), 6) AS herdan_c
    FROM s
    """,
    doc=(
        "Hapax legomena census: once- and twice-seen vocabulary fractions "
        "plus Herdan's C (log V / log N) — vocabulary-growth diagnostics."
    ),
)
def text_hapax_legomena(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-tail diagnostics: natural corpora keep ~40-60 % of their
    vocabulary as hapaxes at any size (Zipf's tail), so a collapsing
    hapax ratio flags template/boilerplate floods and a ballooning one
    flags OCR noise or tokenizer damage. Herdan's C (log-log vocabulary
    growth rate) is the single-number version and feeds BPE vocab-size
    planning.

    Scale shape: ONE token-frequency rollup (the same shuffle TF-IDF
    pays, map-side combined) reduced to a 1-row summary; all counts
    exact, the two ratios pinned doubles."""
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(_tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    s = freq.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("f").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0)).alias("n_hapax"),
        F.sum(F.when(F.col("f") == 2, 1).otherwise(0)).alias("n_dis"),
    )
    return s.select(
        F.col("vocab_size").cast("bigint").alias("vocab_size"),
        "n_tokens",
        F.col("n_hapax").cast("bigint").alias("n_hapax"),
        F.col("n_dis").cast("bigint").alias("n_dis"),
        F.round(F.col("n_hapax").cast("double") / F.col("vocab_size"), 6).alias(
            "hapax_ratio"
        ),
        F.round(
            F.log(F.col("vocab_size").cast("double"))
            / F.log(F.col("n_tokens").cast("double")),
            6,
        ).alias("herdan_c"),
    )


LLR_TOP = 10


@register(
    "text_llr_distinctive_terms",
    f"""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents),
    cell AS (SELECT lang, token, COUNT(*) AS a FROM tok GROUP BY lang, token),
    lang_tot AS (SELECT lang, COUNT(*) AS nl FROM tok GROUP BY lang),
    tok_tot AS (SELECT token, COUNT(*) AS nt FROM tok GROUP BY token),
    tot AS (SELECT COUNT(*) AS n FROM tok),
    llr AS (
      SELECT c.lang, c.token, c.a,
             ROUND(2.0 * (
               c.a * LN(CAST(c.a AS DOUBLE) * t.n / (lt.nl * CAST(tt.nt AS DOUBLE)))
               + (tt.nt - c.a)
                 * LN(CAST(tt.nt - c.a AS DOUBLE) * t.n
                      / (CAST(t.n - lt.nl AS DOUBLE) * tt.nt))
             ), 4) AS llr
      FROM cell c
      JOIN lang_tot lt ON lt.lang = c.lang
      JOIN tok_tot tt ON tt.token = c.token
      CROSS JOIN tot t
      WHERE c.a * t.n > lt.nl * tt.nt AND tt.nt - c.a > 0)
    SELECT lang, token, CAST(a AS BIGINT) AS n_in_lang, llr FROM (
      SELECT lang, token, a, llr,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY llr DESC, token) AS rk
      FROM llr) WHERE rk <= {LLR_TOP}
    """,
    doc=(
        f"Distinctive vocabulary per language via a log-likelihood-ratio "
        f"(Dunning-style) over-representation score — top-{LLR_TOP} terms "
        "each language uses disproportionately."
    ),
)
def text_llr_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus comparison done right (Dunning 1993): raw frequency ranks
    common words everywhere; the likelihood-ratio score asks how
    SURPRISING a token's in-language count is given its corpus-wide rate
    — the statistic behind keyword extraction, register analysis, and
    contamination forensics (a benchmark's distinctive vocabulary
    bleeding into one source lights up here). The two-term form scores
    over-represented cells only (the WHERE guard also keeps every log
    argument positive and finite).

    Determinism: all counts exact; each score is ONE pinned expression
    (no variable-length float fold), rounded before the tie-broken
    per-language rank. Scale shape: the (lang, token) cell table is the
    TF-IDF shuffle; language totals broadcast; token totals join on the
    token key; top-k per language is a bounded window."""
    tok = load_table(spark, sf_dir, "documents").select(
        "lang", F.explode(_tokens()).alias("token")
    )
    cell = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("a"))
    lang_tot = tok.groupBy("lang").agg(F.count(F.lit(1)).alias("nl"))
    tok_tot = tok.groupBy("token").agg(F.count(F.lit(1)).alias("nt"))
    tot = tok.agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql.functions import broadcast

    a, nl, nt, n = (F.col(c).cast("double") for c in ("a", "nl", "nt", "n"))
    llr = F.round(
        2.0
        * (
            a * F.log(a * n / (nl * nt))
            + (nt - a) * F.log((nt - a) * n / ((n - nl) * nt))
        ),
        4,
    )
    scored = (
        cell.join(broadcast(lang_tot), "lang")
        .join(tok_tot, "token")
        .crossJoin(broadcast(tot))
        .filter((F.col("a") * F.col("n") > F.col("nl") * F.col("nt")) & (nt - a > 0))
        .select("lang", "token", "a", llr.alias("llr"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("llr").desc(), "token")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= LLR_TOP)
        .select("lang", "token", F.col("a").cast("bigint").alias("n_in_lang"), "llr")
    )


@register(
    "text_unigram_holdout_perplexity",
    f"""
    WITH train_tok AS (
      SELECT unnest(string_split(text, ' ')) AS token
      FROM documents WHERE {{DRAW}} < 50),
    vocab AS (SELECT token, COUNT(*) AS freq FROM train_tok GROUP BY token),
    vstats AS (SELECT CAST(SUM(freq) AS DOUBLE) AS n,
                      CAST(COUNT(*) AS DOUBLE) AS v
               FROM vocab),
    eval_tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents WHERE {{DRAW}} >= 50),
    scored AS (
      SELECT e.doc_id, v.freq IS NULL AS oov,
             ROUND(-LN((COALESCE(v.freq, 0) + 1.0) / (s.n + s.v + 1.0)), 9)
               AS surprisal
      FROM eval_tok e
      LEFT JOIN vocab v ON v.token = e.token
      CROSS JOIN vstats s)
    SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_eval_docs,
           CAST(COUNT(*) AS BIGINT) AS n_eval_tokens,
           ROUND(CAST(SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS oov_rate,
           ROUND(CAST(SUM(CAST(surprisal AS DECIMAL(18,9))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_surprisal,
           ROUND(EXP(CAST(SUM(CAST(surprisal AS DECIMAL(18,9))) AS DOUBLE)
                     / COUNT(*)), 4) AS perplexity
    FROM scored
    """.replace(
        "{DRAW}",
        "(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100)",
    ),
    doc=(
        "Held-out unigram perplexity: Laplace-smoothed LM trained on the "
        "md5 half of the corpus, evaluated on the other half with OOV "
        "rate — the out-of-sample discipline the in-sample logprob face "
        "deliberately lacks."
    ),
)
def text_unigram_holdout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The train/test split applied to the LM quality filter itself: the
    in-sample logprob face scores documents under a model fit on ALL of
    them (fine for ranking, biased as a metric); this face fits on a
    deterministic half and reports held-out perplexity + OOV rate —
    the pair that tells you whether a perplexity threshold will transfer
    to unseen data, and the harness you re-run per corpus snapshot to
    watch drift (rising held-out PPL = the corpus is changing under the
    model). Laplace add-one with a +1 unseen slot keeps OOV tokens
    finite.

    Determinism: the split is the md5 draw; surprisals are rounded then
    DECIMAL-summed; EXP at the end is one pinned step. Scale shape:
    vocab is the TF-IDF shuffle on the train half; eval tokens LEFT-join
    the vocab on the token key; 1-row output."""
    from trike_spark.queries.dedup import _h60

    d = load_table(spark, sf_dir, "documents")
    draw = _h60(F.col("doc_id").cast("string")) % 100
    train = d.filter(draw < 50)
    evald = d.filter(draw >= 50)
    train_tok = train.select(F.explode(_tokens()).alias("token"))
    vocab = train_tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    vstats = vocab.agg(
        F.sum("freq").cast("double").alias("n"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    eval_tok = evald.select("doc_id", F.explode(_tokens()).alias("token"))
    from pyspark.sql.functions import broadcast

    scored = (
        eval_tok.join(broadcast(vocab), "token", "left")
        .crossJoin(broadcast(vstats))
        .select(
            "doc_id",
            F.col("freq").isNull().alias("oov"),
            F.round(
                -F.log(
                    (F.coalesce(F.col("freq"), F.lit(0)) + 1.0)
                    / (F.col("n") + F.col("v") + 1.0)
                ),
                9,
            ).alias("surprisal"),
        )
    )
    ssum = F.sum(F.col("surprisal").cast("decimal(18,9)")).cast("double")
    return scored.agg(
        F.count_distinct("doc_id").cast("bigint").alias("n_eval_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_eval_tokens"),
        F.round(
            F.sum(F.when(F.col("oov"), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("oov_rate"),
        F.round(ssum / F.count(F.lit(1)), 6).alias("mean_surprisal"),
        F.round(F.exp(ssum / F.count(F.lit(1))), 4).alias("perplexity"),
    )


SPEAR_SRC_A = "web"
SPEAR_SRC_B = "wiki"


@register(
    "text_spearman_rank_sources",
    f"""
    WITH fa AS (
      SELECT token, COUNT(*) AS f
      FROM (SELECT unnest(string_split(text, ' ')) AS token
            FROM documents WHERE source = '{SPEAR_SRC_A}')
      GROUP BY token),
    fb AS (
      SELECT token, COUNT(*) AS f
      FROM (SELECT unnest(string_split(text, ' ')) AS token
            FROM documents WHERE source = '{SPEAR_SRC_B}')
      GROUP BY token),
    joined AS (
      SELECT fa.token, fa.f AS x, fb.f AS y
      FROM fa JOIN fb ON fb.token = fa.token),
    ranked AS (
      SELECT RANK() OVER (ORDER BY x) + (COUNT(*) OVER (PARTITION BY x) - 1) / 2.0
               AS rx,
             RANK() OVER (ORDER BY y) + (COUNT(*) OVER (PARTITION BY y) - 1) / 2.0
               AS ry
      FROM joined),
    s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(rx AS DECIMAL(18,1))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ry AS DECIMAL(18,1))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(rx AS DECIMAL(18,1)) * CAST(ry AS DECIMAL(18,1)))
                  AS DOUBLE) AS sxy,
             CAST(SUM(CAST(rx AS DECIMAL(18,1)) * CAST(rx AS DECIMAL(18,1)))
                  AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ry AS DECIMAL(18,1)) * CAST(ry AS DECIMAL(18,1)))
                  AS DOUBLE) AS syy
      FROM ranked)
    SELECT CAST(n AS BIGINT) AS n_shared_tokens,
           ROUND((n * sxy - sx * sy)
                 / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6)
             AS spearman_rho
    FROM s
    """,
    doc=(
        f"Spearman rank correlation between '{SPEAR_SRC_A}' and "
        f"'{SPEAR_SRC_B}' token-frequency rankings over the shared "
        "vocabulary — the scale-free register-similarity number."
    ),
)
def text_spearman_rank_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do two sources use language the same WAY? Raw frequency
    correlation is dominated by the head; Spearman correlates the RANK
    orders, so it measures whether the sources agree on which words
    matter relative to each other — high ρ with divergent JS distance
    means same register at different mixture rates; low ρ flags a
    different genre entirely. Ties take midranks (rationals from integer
    rank bounds), rank moments fold in exact DECIMAL (.0/.5 terms), and
    ρ is the pinned-Pearson formula on the ranks — the Mann-Whitney
    midrank machinery pointed at a correlation.

    Scale shape: two filtered token rollups, an equi-join on the token
    key — then NO per-row ranking window at all: a tied midrank is a
    pure function of the value's frequency table (midrank(v) = rows
    below v + (cnt_v + 1)/2), so both rank columns come from a tiny
    count-of-counts table (one row per DISTINCT frequency value) folded
    to exclusive prefix offsets and broadcast back. The vocabulary-sized
    stream never re-shuffles for ranking; 1-row output."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")

    def freqs(src: str, out: str) -> DataFrame:
        return (
            d.filter(F.col("source") == src)
            .select(F.explode(_tokens()).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias(out))
        )

    from trike_spark import cache

    # The nested midrank passes reference their input twice each (rows +
    # count-of-counts stats), which re-evaluated the two corpus token
    # rollups up to 4x; the vocab-sized joined table is checkpointed so
    # the corpus is read exactly twice (once per source filter).
    joined = cache.checkpoint(
        freqs(SPEAR_SRC_A, "x").join(freqs(SPEAR_SRC_B, "y"), "token")
    )

    def midranks(df: DataFrame, col: str, out: str) -> DataFrame:
        stats = df.groupBy(col).agg(F.count(F.lit(1)).alias("_c"))
        w_prev = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        offs = stats.select(
            col,
            F.coalesce(F.sum("_c").over(w_prev), F.lit(0)).alias("_o"),
            "_c",
        )
        return (
            df.join(F.broadcast(offs), col)
            .withColumn(
                out,
                (F.col("_o") + (F.col("_c") + 1) / 2.0).cast("decimal(18,1)"),
            )
            .drop("_o", "_c")
        )

    ranked = midranks(midranks(joined, "x", "rx"), "y", "ry").select("rx", "ry")
    s = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("rx").cast("double").alias("sx"),
        F.sum("ry").cast("double").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).cast("double").alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).cast("double").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return s.select(
        n.cast("bigint").alias("n_shared_tokens"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("spearman_rho"),
    )


# Doc-id band width for the banded cumulative V(N)/N(N) series — ~100s of
# bands at sf0.1; any width works, it only sets the rank parallelism.
HEAPS_DOC_BAND = 256


@register(
    "text_heaps_law_fit",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    first_doc AS (
      SELECT token, MIN(doc_id) AS fd FROM tok GROUP BY token),
    news AS (
      SELECT fd AS doc_id, COUNT(*) AS n_new FROM first_doc GROUP BY fd),
    sizes AS (
      SELECT doc_id, COUNT(*) AS n_tok FROM tok GROUP BY doc_id),
    series AS (
      SELECT s.doc_id,
             SUM(s.n_tok) OVER (ORDER BY s.doc_id ROWS UNBOUNDED PRECEDING)
               AS big_n,
             SUM(COALESCE(nw.n_new, 0)) OVER (ORDER BY s.doc_id
               ROWS UNBOUNDED PRECEDING) AS v
      FROM sizes s LEFT JOIN news nw ON nw.doc_id = s.doc_id),
    pts AS (
      SELECT CAST(ROUND(LN(CAST(big_n AS DOUBLE)), 9) AS DECIMAL(18,9)) AS x,
             CAST(ROUND(LN(CAST(v AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y
      FROM series),
    s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy
      FROM pts),
    fit AS (
      SELECT n, sx, sy, sxx, syy, sxy,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS beta
      FROM s)
    SELECT CAST(n AS BIGINT) AS n_checkpoints,
           ROUND(beta, 6) AS heaps_beta,
           ROUND(EXP((sy - beta * sx) / n), 4) AS heaps_k,
           ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM fit
    """,
    doc=(
        "Heaps'-law fit: vocabulary growth V(N) = K*N^beta from the "
        "cumulative first-seen curve (log-log OLS) — Zipf's companion law "
        "and the vocabulary-size forecaster."
    ),
)
def text_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps' law: vocabulary grows as a power of tokens processed
    (β ≈ 0.4–0.6 for natural text; a FIXED vocabulary yields β → 0 as
    the curve saturates). The fitted (K, β) extrapolates: how many new
    types will the next 10× of corpus bring — the number BPE vocabulary
    sizing and OOV-budget planning extrapolate from, and the growth-side
    complement of the hapax census (hapaxes are where the growth
    happens). Curve built exactly: each token contributes to V at its
    first-seen doc (min doc_id — the same first-seen reduction as
    cumulative-unique-users), both cumulatives run over the DOC
    dimension in one ingest order, and the log-log OLS folds rounded
    decimal moments (the Zipf discipline).

    Scale shape: one token rollup (TF-IDF shuffle) + one doc-sized
    series whose two cumulatives run BANDED (the equidepth skeleton):
    docs band by doc_id range, per-band token/new-type subtotals become
    exclusive prefix offsets (a window over band STATS only), and the
    per-row running sums are offset + a within-band cumulative window
    partitioned BY BAND — the doc dimension never collapses to one
    partition, which matters because at corpus scale the doc dimension
    IS the fact table."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_tokens()).alias("token"))
    first_doc = tok.groupBy("token").agg(F.min("doc_id").alias("fd"))
    news = first_doc.groupBy(F.col("fd").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    # Per-doc token count = the token array's length: a narrow per-row
    # expression instead of a second explode + full (doc_id) shuffle of
    # the token stream (identical counts — explode emits exactly
    # size(tokens) rows per doc).
    sizes = d.select("doc_id", F.size(_tokens()).cast("long").alias("n_tok"))
    from trike_spark import cache
    from trike_spark.operators.banded import banded_cumsum

    # banded_cumsum references its input twice (rows + band stats);
    # checkpoint the doc-sized series input so the token rollup and the
    # sizes scan run once.
    joined = cache.checkpoint(
        sizes.join(news, "doc_id", "left").select(
            "doc_id",
            "n_tok",
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
        )
    )
    series = banded_cumsum(
        joined,
        F.floor(F.col("doc_id") / HEAPS_DOC_BAND),
        ["doc_id"],
        {"big_n": "n_tok", "v": "n_new"},
    ).select("doc_id", "big_n", "v")
    pts = series.select(
        F.round(F.log(F.col("big_n").cast("double")), 9)
        .cast("decimal(18,9)")
        .alias("x"),
        F.round(F.log(F.col("v").cast("double")), 9).cast("decimal(18,9)").alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        n.cast("bigint").alias("n_checkpoints"),
        F.round(beta, 6).alias("heaps_beta"),
        F.round(F.exp((sy - beta * sx) / n), 4).alias("heaps_k"),
        F.round(
            (n * sxy - sx * sy) * (n * sxy - sx * sy)
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )
