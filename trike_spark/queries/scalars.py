"""Scalar function families: string, date/time, math, conditional, array,
JSON, hash (SURVEY.md §2.6 "Scalar fns").

All pure built-in column expressions — whole-stage-codegen'd, no UDFs, no
shuffles; at any scale these are embarrassingly parallel map work fused
into the scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trike_spark.io import load_table
from trike_spark.registry import register


@register(
    "scalar_string_funcs",
    r"""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LOWER(p_type) AS type_lower,
           LENGTH(p_name) AS name_len,
           SUBSTR(p_name, 1, 6) AS name_pre,
           CONCAT(p_brand, '/', p_type) AS brand_type,
           REPLACE(p_brand, 'Brand#', 'B') AS brand_short,
           REGEXP_EXTRACT(p_name, '^([a-zA-Z]+)', 1) AS first_word,
           REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS no_vowels,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           TRIM('  ' || p_brand || ' ') AS trimmed
    FROM part
    """,
    doc="String library: case, slice, concat, replace, regexp, pad, trim.",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 6).alias("name_pre"),
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        F.regexp_replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias("brand_short"),
        F.regexp_extract("p_name", r"^([a-zA-Z]+)", 1).alias("first_word"),
        F.regexp_replace(F.col("p_name"), F.lit("[aeiou]"), F.lit("")).alias("no_vowels"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
    )


@register(
    "scalar_date_funcs",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(date_part('dow', o_orderdate) AS INT) AS dow0,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           o_orderdate + INTERVAL 7 DAY AS plus_week,
           DATE_DIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch95,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_sec
    FROM orders
    """,
    doc="Date/time library: parts, trunc, interval arith, diff, epoch.",
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("qtr"),
        (F.dayofweek(d) - 1).alias("dow0"),  # Spark 1=Sun; DuckDB dow 0=Sun
        F.date_trunc("month", d).alias("month_start"),
        (d + F.expr("INTERVAL 7 DAYS")).alias("plus_week"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp")).alias("days_since_epoch95"),
        F.unix_timestamp(d).alias("unix_sec"),
    )


@register(
    "scalar_math_funcs",
    """
    SELECT o_orderkey,
           CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,4)), 1) AS DOUBLE) AS price_r1,
           ABS(o_totalprice - 300000) AS dist_300k,
           CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           SQRT(o_totalprice) AS price_sqrt,
           ROUND(LN(o_totalprice), 6) AS price_ln,
           (o_totalprice / 100000) * (o_totalprice / 100000) AS price_sq_100k,
           CAST(o_orderkey % 7 AS BIGINT) AS key_mod7
    FROM orders WHERE o_totalprice > 0
    """,
    doc="Math library: round/abs/ceil/floor/sqrt/ln/square/mod (sqrt is IEEE-exact; ln rounded).",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        # round via exact decimal: double-rounding differs across engines
        F.round(p.cast("decimal(18,4)"), 1).cast("double").alias("price_r1"),
        F.abs(p - 300000).alias("dist_300k"),
        F.ceil(p).alias("price_ceil"),
        F.floor(p).alias("price_floor"),
        F.sqrt(p).alias("price_sqrt"),
        F.round(F.log(p), 6).alias("price_ln"),
        ((p / 100000) * (p / 100000)).alias("price_sq_100k"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
    )


@register(
    "scalar_conditional_funcs",
    """
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'pending' END AS status_label,
           CASE WHEN o_totalprice >= 300000 THEN 'big'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'small' END AS size_band,
           COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'unknown') AS priority_or_unknown,
           CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END AS open_value
    FROM orders
    """,
    doc="CASE/WHEN, COALESCE, NULLIF conditional logic.",
)
def scalar_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("pending")
        .alias("status_label"),
        F.when(F.col("o_totalprice") >= 300000, "big")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("small")
        .alias("size_band"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")), F.lit("unknown")
        ).alias("priority_or_unknown"),
        F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice"))
        .otherwise(F.lit(0.0))
        .alias("open_value"),
    )


@register(
    "scalar_array_funcs",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           string_split(text, ' ')[1] AS first_token,
           string_split(text, ' ')[len(string_split(text, ' '))] AS last_token,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           len(list_distinct(string_split(text, ' '))) AS n_unique_tokens
    FROM documents
    """,
    doc="Array library: split, size, element_at, contains, distinct.",
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


@register(
    "scalar_string_funcs2",
    """
    SELECT p_partkey,
           position('a' IN p_name) AS a_pos,
           left(p_name, 3) AS name_l3,
           right(p_name, 3) AS name_r3,
           contains(p_name, 'ol') AS has_ol,
           starts_with(p_type, 'ECO') AS is_eco,
           ends_with(p_brand, '1') AS brand_ends_1,
           split_part(p_type, 'O', 2) AS type_part2,
           reverse(p_brand) AS brand_rev,
           repeat(SUBSTR(p_name, 1, 2), 2) AS name2x,
           translate(p_name, 'ae', 'xy') AS name_tr
    FROM part
    """,
    doc="String library 2: position/left/right/contains/starts/ends/split_part/reverse/repeat/translate.",
)
def scalar_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.instr("p_name", "a").alias("a_pos"),
        F.substring("p_name", 1, 3).alias("name_l3"),
        F.substring(F.col("p_name"), -3, 3).alias("name_r3"),
        F.contains("p_name", F.lit("ol")).alias("has_ol"),
        F.startswith("p_type", F.lit("ECO")).alias("is_eco"),
        F.endswith("p_brand", F.lit("1")).alias("brand_ends_1"),
        F.split_part(F.col("p_type"), F.lit("O"), F.lit(2)).alias("type_part2"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.substring("p_name", 1, 2), 2).alias("name2x"),
        F.translate("p_name", "ae", "xy").alias("name_tr"),
    )


@register(
    "scalar_bitwise_funcs",
    """
    SELECT o_orderkey,
           o_orderkey << 2 AS k_shl2,
           o_orderkey >> 3 AS k_shr3,
           o_orderkey & 255 AS k_and_ff,
           o_orderkey | 4096 AS k_or_4k,
           xor(o_orderkey, 21845) AS k_xor,
           least(o_orderkey % 97, o_orderkey % 89) AS k_least,
           greatest(o_orderkey % 97, o_orderkey % 89) AS k_greatest
    FROM orders
    """,
    doc="Bitwise + least/greatest over the order key.",
)
def scalar_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        F.shiftleft(k, 2).alias("k_shl2"),
        F.shiftright(k, 3).alias("k_shr3"),
        k.bitwiseAND(F.lit(255)).alias("k_and_ff"),
        k.bitwiseOR(F.lit(4096)).alias("k_or_4k"),
        k.bitwiseXOR(F.lit(21845)).alias("k_xor"),
        F.least(k % 97, k % 89).alias("k_least"),
        F.greatest(k % 97, k % 89).alias("k_greatest"),
    )


@register(
    "scalar_predicate_funcs",
    """
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE p_name LIKE '%a%ke%'
       OR (p_size BETWEEN 10 AND 20 AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3'))
       OR (p_type = 'ECONOMY' AND NOT p_size >= 15)
    """,
    doc="Predicate library: LIKE, BETWEEN, IN, AND/OR/NOT — all pushed to the scan.",
)
def scalar_predicate_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%a%ke%")
        | (F.col("p_size").between(10, 20) & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        | ((F.col("p_type") == "ECONOMY") & ~(F.col("p_size") >= 15))
    ).select("p_partkey", "p_name", "p_brand", "p_size")


@register(
    "scalar_timestamp_parse",
    """
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts_str,
           strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS ts_roundtrip,
           CAST(to_timestamp(CAST(epoch(o_orderdate) AS BIGINT)) AS TIMESTAMP) AS ts_from_unix
    FROM orders
    """,
    doc="Timestamp formatting/parsing round-trip + unix-seconds reconstruction.",
)
def scalar_timestamp_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    s = F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
    return o.select(
        "o_orderkey",
        s.alias("ts_str"),
        F.to_timestamp(s, "yyyy-MM-dd HH:mm:ss").alias("ts_roundtrip"),
        F.timestamp_seconds(F.unix_timestamp("o_orderdate")).alias("ts_from_unix"),
    )


@register(
    "scalar_math_funcs2",
    """
    SELECT o_orderkey,
           ROUND(pow(o_totalprice / 1000, 2), 6) AS price_k_sq,
           ROUND(log10(o_totalprice), 6) AS price_log10,
           CAST(sign(o_totalprice - 300000) AS INT) AS above_300k,
           ROUND(exp(o_totalprice / 1000000), 6) AS price_exp
    FROM orders WHERE o_totalprice > 0
    """,
    doc="Math library 2: pow, log10, sign, exp (rounded past double-ulp divergence).",
)
def scalar_math_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(F.pow(p / 1000, 2), 6).alias("price_k_sq"),
        F.round(F.log10(p), 6).alias("price_log10"),
        F.signum(p - 300000).cast("int").alias("above_300k"),
        F.round(F.exp(p / 1000000), 6).alias("price_exp"),
    )


@register(
    "scalar_array_funcs2",
    """
    SELECT doc_id,
           COALESCE(list_position(string_split(text, ' '), 'spark'), 0) AS spark_pos,
           list_has_any(string_split(text, ' '), ['spark', 'sql']) AS mentions_engine,
           array_to_string(list_sort(list_distinct(
             list_concat(string_split(text, ' ')[1:3], ['spark', 'sql']))), ',') AS union_sorted,
           array_to_string(string_split(text, ' ')[2:4], ',') AS slice_2_4,
           array_to_string(list_reverse(string_split(text, ' ')[1:3]), ',') AS first3_rev,
           len(list_filter(list_distinct(string_split(text, ' ')),
               x -> list_contains(['the', 'a', 'data', 'spark'], x))) AS n_common
    FROM documents
    """,
    doc="Array library 2: position, overlap, union/sort, slice, reverse, intersect-count.",
)
def scalar_array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    lit_arr = F.array(F.lit("spark"), F.lit("sql"))
    common = F.array(F.lit("the"), F.lit("a"), F.lit("data"), F.lit("spark"))
    return d.select(
        "doc_id",
        F.array_position(t, "spark").alias("spark_pos"),
        F.arrays_overlap(t, lit_arr).alias("mentions_engine"),
        F.concat_ws(",", F.array_sort(F.array_distinct(F.concat(F.slice(t, 1, 3), lit_arr)))).alias(
            "union_sorted"
        ),
        F.concat_ws(",", F.slice(t, 2, 3)).alias("slice_2_4"),
        F.concat_ws(",", F.reverse(F.slice(t, 1, 3))).alias("first3_rev"),
        F.size(F.array_intersect(t, common)).alias("n_common"),
    )


@register(
    "scalar_json_funcs",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod10,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing_field,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_from_json
    FROM events
    """,
    doc="JSON extraction from string props (from_json/get_json_object path).",
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    # from_json with an explicit schema — the streaming-ingest decode path
    parsed = F.from_json("props", "k BIGINT")
    return e.select(
        "event_id",
        k.alias("k_val"),
        (k % 10).alias("k_mod10"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
        parsed["k"].alias("k_from_json"),
    )


@register(
    "scalar_trycast_funcs",
    """
    SELECT o_orderkey,
           try_cast(o_orderpriority AS INTEGER) AS prio_as_int,
           try_cast(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit,
           CASE WHEN o_orderkey % 5 = 0 THEN NULL
                ELSE CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,4))
                                / NULLIF(CAST(o_orderkey % 5 AS DOUBLE), 0), 4) AS DOUBLE)
           END AS safe_div
    FROM orders
    """,
    doc="Safe casting/arithmetic: try_cast (NULL on failure), division guarded by NULLIF.",
)
def scalar_trycast_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.try_to_number(F.col("o_orderpriority"), F.lit("999")).cast("int").alias("prio_as_int"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("prio_digit"),
        F.round(
            F.try_divide(
                F.col("o_totalprice").cast("decimal(18,4)"),
                F.nullif((F.col("o_orderkey") % 5).cast("double"), F.lit(0.0)),
            ),
            4,
        ).cast("double").alias("safe_div"),
    )


@register(
    "scalar_map_funcs",
    """
    SELECT p_partkey,
           map(['brand', 'type'], [p_brand, p_type])['brand'][1] AS m_brand,
           map(['brand', 'type'], [p_brand, p_type])['type'][1] AS m_type,
           cardinality(map(['brand', 'type'], [p_brand, p_type])) AS m_size
    FROM part
    """,
    doc="Map-typed columns: construct, extract by key, cardinality.",
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    m = F.map_from_arrays(
        F.array(F.lit("brand"), F.lit("type")), F.array(F.col("p_brand"), F.col("p_type"))
    )
    return p.select(
        "p_partkey",
        F.element_at(m, "brand").alias("m_brand"),
        F.element_at(m, "type").alias("m_type"),
        F.size(m).alias("m_size"),
    )


@register(
    "scalar_hash_funcs",
    """
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           to_base64(from_hex(md5(text))) AS md5_b64,
           CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS md5_int60
    FROM documents
    """,
    doc="Hash/codec library: md5, sha256, base64, hex→int (cross-engine stable).",
)
def scalar_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.base64(F.unhex(F.md5("text"))).alias("md5_b64"),
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("bigint").alias("md5_int60"),
    )


# Golden values pinned from Spark's implementations (seed-42 xxhash64 /
# murmur3, standard crc32): if any hash function's output ever changed,
# shuffle placement, bucketing layout, and every md5-free fingerprint in
# a deployment would silently reshuffle — so the face fails the driver
# hash instead.
_XXH64_TRIKE = 1388479953241485912
_CRC32_TRIKE = 4153478673
_MURMUR3_TRIKE = -492938234


@register(
    "scalar_hash_spark_native",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct_texts,
           TRUE AS xxh64_injective_here,
           TRUE AS xxh64_golden_ok,
           TRUE AS crc32_golden_ok,
           TRUE AS murmur3_golden_ok
    FROM documents
    """,
    doc=(
        "Spark-native hashes (xxhash64/crc32/murmur3) certified: golden "
        "literals pinned and xxhash64 collision-free on the corpus, or "
        "the driver hash goes red."
    ),
)
def scalar_hash_spark_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's own hash family (xxhash64 drives shuffle and
    bucketing; murmur3 is `hash()`; crc32 the checksum scalar). The raw
    values are engine-specific — DuckDB cannot recompute them — so the
    driver-hashed output carries the deterministic CONTRACT instead:
    each function still produces its pinned golden value for a fixed
    literal (implementation stability — a changed hash would silently
    re-place every shuffle and bucket layout), and xxhash64 over the
    corpus has exactly as many distinct values as the texts it hashes
    (no collisions at this size; count distinct IS DuckDB-computable)."""
    d = load_table(spark, sf_dir, "documents")
    agg = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("ndt"),
        F.countDistinct(F.xxhash64("text")).alias("ndx"),
        F.min(F.xxhash64(F.lit("trike"))).alias("gx"),
        F.min(F.crc32(F.lit("trike"))).alias("gc"),
        F.min(F.hash(F.lit("trike"))).alias("gm"),
    )
    return agg.select(
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("ndt").cast("bigint").alias("n_distinct_texts"),
        (F.col("ndx") == F.col("ndt")).alias("xxh64_injective_here"),
        (F.col("gx") == F.lit(_XXH64_TRIKE)).alias("xxh64_golden_ok"),
        (F.col("gc") == F.lit(_CRC32_TRIKE)).alias("crc32_golden_ok"),
        (F.col("gm") == F.lit(_MURMUR3_TRIKE)).alias("murmur3_golden_ok"),
    )


@register(
    "scalar_udtf_tokenize",
    """
    SELECT lang, CAST(i - 1 AS INT) AS pos, t AS token, COUNT(*) AS n
    FROM (SELECT lang, unnest(string_split(text, ' ')) AS t,
                 generate_subscripts(string_split(text, ' '), 1) AS i
          FROM documents)
    WHERE i <= 3
    GROUP BY lang, i, t
    """,
    doc="Python UDTF face: lateral row expansion via tokenize_spans, "
    "hash-verified against plain unnest-with-ordinality SQL.",
)
def scalar_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the registered UDTF through SQL LATERAL — the full Spark 4
    UDTF execution path (Python worker row expansion), constrained to the
    first 3 token positions so output stays small. Semantically identical
    to posexplode(split(...)); the UDTF exists to prove the API surface
    with a hard oracle signal (see functions/table_udfs.py)."""
    from trike_spark.functions.table_udfs import register_udtfs
    from trike_spark.io import register_views

    register_udtfs(spark)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT d.lang, s.pos, s.token, COUNT(*) AS n
        FROM documents d, LATERAL tokenize_spans(d.text) s
        WHERE s.pos < 3
        GROUP BY d.lang, s.pos, s.token
        """
    )


@register(
    "scalar_ols_trend_applyinpandas",
    """
    WITH b AS (
      SELECT user_id,
             date_diff('second', TIMESTAMP '2024-01-01', ts) AS x,
             CAST(value AS DECIMAL(20,6)) AS y
      FROM events),
    s AS (SELECT user_id, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(CAST(x AS DECIMAL(38,6)) * y) AS sxy,
                 SUM(x * x) AS sxx
          FROM b GROUP BY user_id)
    SELECT user_id, n AS n_events,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) * 86400.0, 6) AS slope_per_day
    FROM s WHERE n >= 10 AND (n * sxx - sx * sx) <> 0
    """,
    doc=(
        "Grouped-map applyInPandas UDAF: per-user OLS trend of event value "
        "over time (slope per day), exact-integer sums so the hash verifies."
    ),
)
def scalar_ols_trend_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grouped-map escape hatch (``applyInPandas``) demonstrated with
    a hash-verifiable custom UDAF — a per-key least-squares trend, the
    kind of per-entity model fit that genuinely wants imperative code.

    Cross-engine determinism inside a Python UDF: the kernel accumulates
    Python-int sums of integer-quantized inputs (seconds since a fixed
    origin; value in exact micro-units, mirroring the oracle's
    DECIMAL(20,6) cast), so the sums are order-independent and exact, and
    the one float division happens on the same exact operands the oracle
    divides. Arrow batches per group; one shuffle on user_id — the same
    exchange any grouped aggregate pays. Each group's rows must fit one
    worker (bounded here by per-user event counts; a 100 TB deployment
    salts or pre-aggregates pathological keys first)."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")

    def _ols(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        origin = pd.Timestamp("2024-01-01")
        xs = ((pdf["ts"] - origin) // pd.Timedelta(seconds=1)).astype("int64").tolist()
        ys = [int(round(v * 1_000_000)) for v in pdf["value"].tolist()]
        sx = sum(xs)
        sy = sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        den = n * sxx - sx * sx
        if n < 10 or den == 0:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64"),
                 "n_events": pd.Series([], dtype="int64"),
                 "slope_per_day": pd.Series([], dtype="float64")}
            )
        # num is micro-scaled; num / 10**6 is one correctly-rounded double
        # of the exact rational — the same single rounding the oracle's
        # CAST(exact DECIMAL AS DOUBLE) performs.
        num = n * sxy - sx * sy
        slope = (num / 10**6) / float(den) * 86400.0
        return pd.DataFrame(
            {"user_id": [int(pdf["user_id"].iloc[0])],
             "n_events": [n],
             "slope_per_day": [round(slope, 6)]}
        )

    return e.groupBy("user_id").applyInPandas(
        _ols, schema="user_id long, n_events long, slope_per_day double"
    )


@register(
    "scalar_variant_funcs",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k,
           CAST(json_extract(props, '$.absent') AS INT) AS k_missing,
           CASE WHEN json_extract(props, '$.k') IS NOT NULL
                THEN 'OBJECT<k: BIGINT>' END AS vschema,
           CAST(json_extract(props, '$.k') AS INT) % 10 AS k_mod
    FROM events
    """,
    doc=(
        "Spark 4 VARIANT path: parse_json once, typed try_variant_get "
        "extraction, schema_of_variant introspection — the semi-structured "
        "column type that replaces repeated get_json_object string parses."
    ),
)
def scalar_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT type (Spark 4): ``parse_json`` converts the JSON string
    ONCE into a binary semi-structured value; every later field access is
    a typed ``try_variant_get`` on that value — against N
    ``get_json_object`` calls that each re-parse the string (the
    scalar_json_funcs face shows that older path). ``schema_of_variant``
    introspects the stored structure; absent paths come back NULL, not an
    error. The oracle extracts the same typed values via DuckDB's native
    JSON reader, and pins the introspected schema string to the expected
    constant — a drifting variant layout would hash-fail.

    Scale note: at 100 TB the parse-once/read-many difference is the
    whole cost model of semi-structured columns; VARIANT also carries
    binary-encoded shredding potential (columnar field extraction) that
    string JSON never can."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    return e.select(
        "event_id",
        k.alias("k"),
        F.try_variant_get(v, "$.absent", "int").alias("k_missing"),
        F.when(k.isNotNull(), F.schema_of_variant(v)).alias("vschema"),
        (k % 10).alias("k_mod"),
    )


@register(
    "scalar_interval_funcs",
    """
    SELECT event_id,
           ts + INTERVAL 3 DAY AS plus_3d,
           ts - INTERVAL 90 MINUTE AS minus_90m,
           CAST(CAST(ts AS DATE) + INTERVAL 1 MONTH AS DATE) AS plus_1mo,
           CAST(date_trunc('quarter', ts) AS DATE) AS quarter_start,
           CAST(ts AS DATE)
             + CAST(CASE WHEN (8 - isodow(CAST(ts AS DATE))) % 7 = 0 THEN 7
                         ELSE (8 - isodow(CAST(ts AS DATE))) % 7 END AS INT)
             AS next_monday
    FROM events
    """,
    doc=(
        "INTERVAL arithmetic family: timestamp +/- day/minute intervals, "
        "calendar-clamped month addition, quarter truncation, next-weekday "
        "— the date-math surface schedulers and retention policies use."
    ),
)
def scalar_interval_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic where the subtle parts are calendar, not math:
    month addition clamps to month end (Jan 31 + 1 month = Feb 28 in both
    engines — add_months ↔ DATE + INTERVAL agree on the clamp);
    next-weekday is strictly-later (a Monday maps to NEXT Monday, the
    next_day contract — the oracle derives it from isodow so the +7 wrap
    is explicit); interval add/subtract on timestamps is exact
    microsecond integer math. All narrow per-row expressions, pushdown-
    transparent."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 3 DAYS")).alias("plus_3d"),
        (F.col("ts") - F.expr("INTERVAL 90 MINUTES")).alias("minus_90m"),
        F.add_months(F.col("ts").cast("date"), 1).alias("plus_1mo"),
        F.date_trunc("quarter", "ts").cast("date").alias("quarter_start"),
        F.next_day(F.col("ts").cast("date"), "Mon").alias("next_monday"),
    )


@register(
    "scalar_lambda_funcs",
    """
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), t -> length(t) > 5)) > 0
             AS has_long_token,
           len(list_filter(string_split(text, ' '), t -> NOT (length(t) > 0))) = 0
             AS all_nonempty,
           len(list_filter(string_split(text, ' '), t -> length(t) <= 3))
             AS n_short,
           CAST(list_aggregate(list_transform(string_split(text, ' '),
                t -> CAST(length(t) AS BIGINT)), 'sum') AS BIGINT) AS total_chars,
           list_transform(list_zip(string_split(text, ' '),
                                   list_reverse(string_split(text, ' '))),
                          p -> p[1] || '|' || p[2])[1] AS first_last
    FROM documents
    """,
    doc=(
        "Higher-order lambda surface: exists / forall / filter / "
        "transform / aggregate / zip_with over token arrays — array "
        "programming without a single explode or UDF."
    ),
)
def scalar_lambda_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lambda toolkit that keeps array work inside whole-stage
    codegen: ``exists``/``forall`` compile quantifiers, ``filter``/
    ``transform`` map without exploding (no row-count blowup, no
    re-aggregation), ``aggregate`` folds, ``zip_with`` pairs two arrays
    positionally. Every heavy operator in this engine leans on these
    (the cosine fold, BM25's filtered explode, the repetition filters);
    this face pins the primitives themselves cross-engine, including the
    quantifier↔filter-count equivalences the oracle uses where DuckDB
    lacks a direct form.

    Scale note: all narrow per-row expressions — the fastest possible
    shape for per-document feature extraction; the alternative
    (explode → groupBy) pays a shuffle per feature."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.exists(toks, lambda t: F.length(t) > 5).alias("has_long_token"),
        F.forall(toks, lambda t: F.length(t) > 0).alias("all_nonempty"),
        F.size(F.filter(toks, lambda t: F.length(t) <= 3)).alias("n_short"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.element_at(
            F.zip_with(toks, F.reverse(toks), lambda a, b: F.concat(a, F.lit("|"), b)),
            1,
        ).alias("first_last"),
    )


@register(
    "scalar_try_arithmetic",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE ROUND(o_totalprice / (o_orderkey % 7), 4) END AS safe_div,
           CASE WHEN o_custkey = 0 THEN NULL
                ELSE o_orderkey // o_custkey END AS safe_intdiv,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE o_orderkey % (o_orderkey % 7) END AS safe_mod
    FROM orders
    """,
    doc=(
        "try_divide / try_mod null-on-error arithmetic: division by a "
        "sometimes-zero denominator yields NULL rows instead of a failed "
        "job — ANSI safety without losing the strictness elsewhere."
    ),
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Under ANSI mode (this engine's default, matching the oracle's
    strictness) a single zero denominator fails the whole job; the
    ``try_`` family turns exactly the failing rows into NULLs while every
    other row stays strict — the right granularity for dirty-data
    arithmetic (the blanket alternative, disabling ANSI, silently
    corrupts overflow everywhere). Here a seventh of the keys produce a
    zero denominator; those rows surface as NULLs the oracle reproduces
    with explicit CASE guards.

    Scale note: narrow per-row expressions; NULL propagation is free."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderkey") % 7
    return o.select(
        "o_orderkey",
        F.round(F.try_divide(F.col("o_totalprice"), d), 4).alias("safe_div"),
        F.try_divide(F.col("o_orderkey"), F.col("o_custkey")).cast("bigint").alias(
            "safe_intdiv"
        ),
        F.try_mod(F.col("o_orderkey"), d).alias("safe_mod"),
    )


@register(
    "scalar_url_funcs",
    r"""
    WITH u AS (
      SELECT c_custkey,
             'https://' || LOWER(c_mktsegment) || '.example.com:'
               || CAST(8000 + c_nationkey AS VARCHAR)
               || '/customer/' || CAST(c_custkey AS VARCHAR)
               || '?nation=' || CAST(c_nationkey AS VARCHAR)
               || '&seg=' || LOWER(c_mktsegment)
               || '#p' || CAST(c_custkey AS VARCHAR) AS url
      FROM customer WHERE c_custkey <= 20)
    SELECT c_custkey, url,
           REGEXP_EXTRACT(url, '^([a-z]+)://', 1) AS protocol,
           REGEXP_EXTRACT(url, '://([^:/?#]+)', 1) AS host,
           REGEXP_EXTRACT(url, '://[^:/]+:([0-9]+)', 1) AS port,
           REGEXP_EXTRACT(url, '://[^/]+(/[^?#]*)', 1) AS path,
           REGEXP_EXTRACT(url, '\?([^#]*)', 1) AS query,
           REGEXP_EXTRACT(url, '[?&]nation=([^&#]*)', 1) AS q_nation,
           REGEXP_EXTRACT(url, '#(.*)$', 1) AS fragment,
           REGEXP_EXTRACT(url, '://(?:[^:/?#]+\.)?([^:/?#.]+\.[^:/?#.]+)', 1)
             AS reg_domain
    FROM u
    """,
    doc=(
        "URL scalar family: synthesize a URL per customer, then parse "
        "protocol/host/port/path/query/param/fragment plus the registered "
        "domain — the per-domain key extraction every web-crawl pipeline "
        "needs before domain-level dedup or quotas."
    ),
)
def scalar_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing via the JVM-side ``parse_url`` family (the port is the
    one component parse_url('HOST') strips, extracted with one regexp to
    match the oracle's component set; the registered-domain suffix is a
    regexp in both engines — real eTLD+1 needs the public-suffix list,
    which is a broadcast-dimension lookup, not a parser change).

    Why it matters at 100 TB: per-domain keys are the partition unit of
    web-corpus curation (domain quotas, per-domain dedup, robots/spam
    blocklists join on exactly these columns); parsing must stay inside
    whole-stage codegen because it runs on every document of the crawl.
    Pure narrow map work fused into the scan — no shuffle, no UDF."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 20)
    url = F.concat(
        F.lit("https://"),
        F.lower("c_mktsegment"),
        F.lit(".example.com:"),
        (F.lit(8000) + F.col("c_nationkey")).cast("string"),
        F.lit("/customer/"),
        F.col("c_custkey").cast("string"),
        F.lit("?nation="),
        F.col("c_nationkey").cast("string"),
        F.lit("&seg="),
        F.lower("c_mktsegment"),
        F.lit("#p"),
        F.col("c_custkey").cast("string"),
    )
    u = c.select("c_custkey", url.alias("url"))
    return u.select(
        "c_custkey",
        "url",
        F.expr("parse_url(url, 'PROTOCOL')").alias("protocol"),
        F.expr("parse_url(url, 'HOST')").alias("host"),
        F.regexp_extract("url", r"://[^:/]+:([0-9]+)", 1).alias("port"),
        F.expr("parse_url(url, 'PATH')").alias("path"),
        F.expr("parse_url(url, 'QUERY')").alias("query"),
        F.expr("parse_url(url, 'QUERY', 'nation')").alias("q_nation"),
        F.expr("parse_url(url, 'REF')").alias("fragment"),
        F.regexp_extract(
            "url", r"://(?:[^:/?#]+\.)?([^:/?#.]+\.[^:/?#.]+)", 1
        ).alias("reg_domain"),
    )
