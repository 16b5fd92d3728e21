"""Streaming twins of the batch sketch/curation families: a windowed
Count-Min sketch and deterministic hash sampling over an event stream.

Batch answers "what happened in the corpus"; these answer the same
questions over an unbounded stream with bounded state:

  * :func:`streaming_countmin_cells` — per-event-time-window CMS cell
    counts. State is W·D cells per open window regardless of stream rate
    (the sketch's whole point); the watermark bounds how many windows are
    open. The hash family is the SAME md5-affine one the batch
    ``sketch_countmin_heavyhitters`` and its DuckDB oracle use, so a
    windowed streaming sketch can be unioned with / compared against a
    batch-built one cell-by-cell.
  * :func:`streaming_hash_sample` — the ``curation_hash_sample`` predicate
    (md5 draw) applied to a stream: a stateless narrow filter, so it works
    in append mode with no watermark and keeps exactly the rows the batch
    query would keep on the same data (reproducible sampling across
    batch/stream replays).

Both take and return DataFrames, so they compose with any source
(socket/file/Kinesis-replay from streaming/sources.py) and sink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trike_spark.queries.curation import _draw
from trike_spark.queries.sketches import CMS_D, CMS_P, CMS_W, _cms_a, _cms_b
from trike_spark.queries.dedup import _h60


def _cms_cell_dyn(h: Column, d: Column) -> Column:
    """The batch ``_cms_cell`` with the hash-row index as a COLUMN: the
    stream explodes each token into its D sketch rows, so (a, b) come from
    literal arrays indexed by d instead of Python constants."""
    a = F.element_at(F.array(*[F.lit(_cms_a(i)) for i in range(CMS_D)]), d + 1)
    b = F.element_at(F.array(*[F.lit(_cms_b(i)) for i in range(CMS_D)]), d + 1)
    return ((h % (1 << 30)) * a + b) % CMS_P % CMS_W


def streaming_countmin_cells(
    events: DataFrame,
    token_col: str = "token",
    ts_col: str = "ts",
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Windowed Count-Min cells over a token stream.

    Returns (window_start, window_end, d, cell, c) — one row per non-empty
    sketch cell per event-time window. ONE stateful aggregation: each token
    explodes into its D (d, cell) coordinates first, so the D hash rows
    ride a single groupBy instead of a union of D streaming aggs (which
    Structured Streaming would reject as multiple stateful operators).
    Works on a static DataFrame too (same plan, no watermark semantics) —
    the tests exploit that for an exact batch-vs-stream comparison.
    """
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    exploded = src.select(
        F.col(ts_col),
        _h60(F.col(token_col)).alias("hh"),
        F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("d"),
    )
    return (
        exploded.select(
            F.col(ts_col), "d", _cms_cell_dyn(F.col("hh"), F.col("d")).alias("cell")
        )
        .groupBy(F.window(F.col(ts_col), window_duration).alias("w"), "d", "cell")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "d",
            "cell",
            "c",
        )
    )


def streaming_hash_sample(
    events: DataFrame, key_col: str, rate_pct: int
) -> DataFrame:
    """Deterministic Bernoulli sample of a stream: keep rows whose md5
    draw on ``key_col`` falls under ``rate_pct`` — the exact
    ``curation_hash_sample`` predicate, so the streamed sample equals the
    batch sample of the same rows (replay-stable, partitioning-independent,
    unlike ``df.sample``). Stateless narrow filter: append-mode safe, no
    watermark, no state store."""
    return events.filter(_draw(F.col(key_col)) < rate_pct)


def streaming_hll_registers(
    events: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Windowed HyperLogLog registers over a key stream.

    Returns (window_start, window_end, reg, m) — one row per touched
    register per event-time window, built with the SAME md5 hash /
    trailing-zero rho as the batch ``sketch_hll_distinct`` oracle, so a
    windowed streaming sketch merges with (register-wise MAX) or
    cross-checks against a batch-built one. ONE stateful aggregation;
    state is ≤64 registers per open window — the watermark bounds open
    windows, so state is O(windows), never O(distinct keys). Works on a
    static DataFrame too (same plan), which the parity test exploits.
    """
    from trike_spark.queries.sketches import HLL_M, _HLL_W_BITS

    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    split = src.select(
        F.col(ts_col), _h60(F.col(key_col).cast("string")).alias("h")
    ).select(
        F.col(ts_col),
        (F.col("h") % HLL_M).alias("reg"),
        F.expr(f"h div {HLL_M}").alias("w"),
    )
    rho = split.select(
        F.col(ts_col),
        "reg",
        F.expr(
            f"CASE WHEN w = 0 THEN {_HLL_W_BITS + 1} "
            "ELSE bit_count((w & -w) - 1) + 1 END"
        ).alias("r"),
    )
    return (
        rho.groupBy(F.window(F.col(ts_col), window_duration).alias("win"), "reg")
        .agg(F.max("r").alias("m"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "reg",
            "m",
        )
    )


def streaming_lsh_dedup_probe(doc_stream: DataFrame, index_buckets: DataFrame) -> DataFrame:
    """Streaming twin of ``dedup_incremental_lsh``: arriving documents are
    LSH-probed against the standing corpus index as they stream in.

    ``doc_stream`` carries (doc_id, text); ``index_buckets`` is the
    materialized (doc_id, band_idx, band_hash) index — at deployment a
    parquet/Delta table partitioned by band_hash, refreshed by the batch
    job. Bucket computation is the SAME narrow expression chain as the
    batch face (``minhash_buckets_df``), and the probe is a stream-static
    equi-join on (band_idx, band_hash) — stateless, append-mode safe, no
    watermark: each emitted row is a collision candidate
    (doc_id, dup_of, band_idx) for the downstream keep/drop decision.
    State is zero; the static side is broadcast or bucket-pruned by the
    join key, so stream throughput is independent of corpus size."""
    from trike_spark.queries.dedup import minhash_buckets_df

    probe = minhash_buckets_df(doc_stream)
    idx = index_buckets.select(
        F.col("doc_id").alias("dup_of"), "band_idx", "band_hash"
    )
    return probe.join(idx, on=["band_idx", "band_hash"]).select(
        "doc_id", "dup_of", "band_idx"
    )


def streaming_weighted_sample_draws(
    docs: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming twin of ``curation_weighted_sample``: per event-time
    window, each arriving doc's weighted draw key (MIN over w md5
    tickets, w = token count) — MIN is a monoid, so this is ONE stateful
    windowed aggregation whose state is a single 32-char string per
    (window, doc); the downstream top-k consumer just sorts the emitted
    draws. Because the ticket scheme is a pure function of (doc_id, w),
    the stream's draw for a doc is bit-identical to the batch face's —
    sample membership survives a batch→stream migration or a replay.

    Expects (doc_id, text, ts). The ticket explode is the same Σw
    fan-out the batch face pays, applied per micro-batch — narrow until
    the windowed MIN agg."""
    src = docs
    if dict(src.dtypes).get(ts_col) in ("string",):
        src = src.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    w = src.select(
        "doc_id",
        F.col(ts_col),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    tickets = w.select(
        "doc_id",
        ts_col,
        "n_tokens",
        F.explode(F.sequence(F.lit(1), F.col("n_tokens"))).alias("i"),
    ).select(
        "doc_id",
        ts_col,
        "n_tokens",
        F.md5(F.concat_ws(":", F.col("doc_id"), F.col("i"))).alias("ticket"),
    )
    return (
        tickets.groupBy(F.window(ts_col, window_duration).alias("win"), F.col("doc_id"), F.col("n_tokens"))
        .agg(F.min("ticket").alias("draw"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "doc_id",
            "n_tokens",
            "draw",
        )
    )


def point_in_time_enrich(fact_stream: DataFrame, intervals: DataFrame) -> DataFrame:
    """Streaming twin of ``events_scd2_point_in_time_join``: enrich an
    arriving fact stream with the SCD2 dimension interval valid at each
    fact's event time. Stream-static join with the SAME half-open range
    predicate as the batch face — stateless (the dimension is the static
    side, re-read per micro-batch so dimension updates between batches
    are picked up), so it runs in append mode with no watermark.

    ``intervals`` must carry (user_id, state_type, valid_from, valid_to);
    the batch builder (events_scd2_point_in_time_join's `starts` leg) or
    a versioned-table snapshot both qualify. At scale the static side is
    the materialized dimension table — broadcast when it fits, else the
    join keys on user_id exactly like the batch plan."""
    s = intervals.select(
        F.col("user_id").alias("d_user_id"), "state_type", "valid_from", "valid_to"
    )
    p = fact_stream
    return p.join(
        s,
        (p.user_id == s.d_user_id)
        & (s.valid_from <= p.ts)
        & (s.valid_to.isNull() | (p.ts < s.valid_to)),
    ).select("event_id", "user_id", "ts", "state_type", F.col("valid_from").alias("state_since"))


# --- streaming EWMA (online trailing feature) -------------------------------

_EWMA_STATE = "vals ARRAY<BIGINT>, n BIGINT"
_EWMA_OUT = (
    "custkey BIGINT, orderkey BIGINT, rn BIGINT, "
    "total_cents BIGINT, ewma_cents BIGINT"
)


def _ewma_emit(vals: list[int], lags: int) -> int:
    num = 0
    den = 0
    last = len(vals) - 1
    for idx, v in enumerate(vals):
        w = 1 << (lags - (last - idx))
        num += v * w
        den += w
    return num // den


def ewma_stream(orders: DataFrame, lags: int | None = None) -> DataFrame:
    """Streaming twin of ``window_ewma_trailing``: the exponentially-
    weighted trailing average as an ONLINE per-key feature —
    ``applyInPandasWithState`` keyed by customer, state = the last
    ``lags``+1 values (a bounded deque: {16}·8 bytes per live key, the
    O(1)-state property that makes trailing features streamable at all)
    plus the running row count. Each arriving order emits its EWMA
    immediately — the feature-store write a training pipeline consumes.

    Identical integer arithmetic to the batch face (weights 2^k, Σxw div
    Σw), so on an in-order stream the emitted values are bit-equal to the
    batch band-join (parity-tested). Ordering contract: rows are sorted
    by (o_orderdate, o_orderkey) WITHIN each micro-batch; cross-batch
    out-of-order arrivals compute the EWMA over arrival order, the
    standard online-feature semantics (event-time exactness needs the
    batch face or a watermark-delayed replay)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from trike_spark.queries.windows import EWMA_LAGS

    k = EWMA_LAGS if lags is None else lags

    def fn(key, pdfs, state):
        import pandas as pd

        (custkey,) = key
        vals, n = (list(state.get[0]), state.get[1]) if state.exists else ([], 0)
        out: dict[str, list] = {c: [] for c in ("custkey", "orderkey", "rn", "total_cents", "ewma_cents")}
        for pdf in pdfs:
            pdf = pdf.sort_values(["o_orderdate", "o_orderkey"])
            for ok, cents in zip(pdf["o_orderkey"], pdf["total_cents"]):
                vals.append(int(cents))
                del vals[:-(k + 1)]
                n += 1
                out["custkey"].append(custkey)
                out["orderkey"].append(int(ok))
                out["rn"].append(n)
                out["total_cents"].append(int(cents))
                out["ewma_cents"].append(_ewma_emit(vals, k))
        state.update((vals, n))
        if out["custkey"]:
            yield pd.DataFrame(out)

    prepared = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (F.col("o_totalprice").cast("decimal(38,4)") * 100)
        .cast("bigint")
        .alias("total_cents"),
    )
    return prepared.groupBy("o_custkey").applyInPandasWithState(
        fn,
        outputStructType=_EWMA_OUT,
        stateStructType=_EWMA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dsir_score(
    doc_stream: DataFrame,
    llr_entries: list[tuple[str, float]],
    oov_llr: float,
) -> DataFrame:
    """Streaming twin of ``curation_dsir_topk``'s scoring stage: arriving
    documents are scored against a FIXED reference LM (the DSIR unigram
    log-likelihood-ratio table from ``dsir_llr_entries``) as they stream
    in — the production shape for continuously skimming target-looking
    data out of a live crawl.

    Stateless and append-mode safe: the LM ships as one literal
    map-from-arrays expression (vocabulary-sized — the broadcast-model
    deployment shape), each row's score is a fold over its own token
    array (coalesce → ``oov_llr`` for tokens the reference corpus never
    saw), so there is no shuffle, no state store, and no watermark —
    stream throughput is independent of both corpus and vocabulary size.
    The fold order is the token array order, so the emitted score is
    deterministic and replay-stable."""
    keys = [t for t, _ in llr_entries]
    vals = [s for _, s in llr_entries]
    llr_map = F.map_from_arrays(
        F.lit(keys).cast("array<string>"), F.lit(vals).cast("array<double>")
    )
    toks = F.split(F.col("text"), " ")
    total = F.aggregate(
        F.transform(toks, lambda t: F.coalesce(F.element_at(llr_map, t), F.lit(float(oov_llr)))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return doc_stream.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(total / F.size(toks), 6).alias("dsir_score"),
    )


def streaming_anomaly_probe(
    events: DataFrame,
    baselines: DataFrame,
    cutoff: float = 3.5,
) -> DataFrame:
    """Streaming twin of ``events_anomaly_mad``: arriving events are scored
    against FIXED robust baselines (event_type, med, mad — the batch
    job's periodically refreshed model table) and only |modified z| >
    cutoff outliers are emitted.

    Stateless and append-mode safe: the baseline table is |types| rows and
    broadcast, scoring is a narrow per-row expression — no shuffle, no
    state store, no watermark, so alerting latency is one micro-batch
    regardless of history size. Splitting model-build (batch, exact
    medians) from model-serve (stream, broadcast probe) is the standard
    deployment shape for threshold detectors."""
    from trike_spark.queries.events import MAD_K

    z = (F.col("value") - F.col("med")) / (F.lit(MAD_K) * F.col("mad"))
    return (
        events.join(F.broadcast(baselines), "event_type")
        .filter(F.abs(z) > cutoff)
        .select(
            "event_id", "event_type", "value", F.round(z, 6).alias("robust_z")
        )
    )


def trending_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming leg of ``events_windowed_topk``: the watermarked hourly
    windowed count. The per-window RANK deliberately does not run here —
    rank-over-window is not incrementally maintainable inside the
    streaming engine, so the trending twin splits exactly like the CDC
    twin: the engine owns the windowed aggregation state, the foreachBatch
    sink re-ranks the refreshed aggregate and publishes the serving table
    (see :func:`trending_rank_sink`)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def trending_rank_sink(target_path: str, topk: int = 3):
    """foreachBatch half of the trending twin: rank the refreshed windowed
    aggregate per window and publish the serving table — the classic
    'recompute the leaderboard on every refresh'. The publish goes
    through the versioned table layer (``foreach_batch_publisher``:
    atomic snapshot flip, batchId-deduped replays, time-travelable
    history) — the lakehouse contract is the default; read the
    leaderboard with ``versioned.read_version(spark, target_path)``."""
    from pyspark.sql import Window

    from trike_spark.versioned import foreach_batch_publisher

    publish = foreach_batch_publisher(target_path)

    def apply(bdf: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy("window_start").orderBy(
            F.col("n_events").desc(), F.col("event_type")
        )
        ranked = (
            bdf.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= topk)
        )
        publish(ranked, batch_id)

    return apply


def streaming_bm25_score(
    doc_stream: DataFrame,
    idf_entries: list[tuple[str, float]],
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Streaming twin of ``text_bm25_topk``'s scoring stage: arriving
    documents are BM25-scored against a FROZEN index model (per-term idf
    + corpus avgdl — the artifacts the batch index build publishes).

    Same stateless broadcast-model shape as :func:`streaming_dsir_score`:
    the idf table ships as one literal map (|Q|-to-vocabulary sized), the
    per-row score is computed from the row's own token array, so there is
    no shuffle, no state, no watermark. This is how query-scoring a
    firehose against a fixed retrieval index actually deploys; rebuilding
    idf/avgdl stays a batch job. Term frequency within the row uses the
    array filter+size form (no explode), and per-term scores are rounded
    then summed in array order — deterministic and replay-stable."""
    keys = [t for t, _ in idf_entries]
    vals = [v for _, v in idf_entries]
    idf_map = F.map_from_arrays(
        F.lit(keys).cast("array<string>"), F.lit(vals).cast("array<double>")
    )
    toks = F.split(F.col("text"), " ")
    dl = F.size(toks)
    norm = F.lit(1.0 - b) + F.lit(b) * (dl.cast("double") / F.lit(float(avgdl)))

    def term_score(t: Column) -> Column:
        tf = F.size(F.filter(toks, lambda x: x == t)).cast("double")
        idf = F.element_at(idf_map, t)
        return F.round(idf * ((tf * F.lit(k1 + 1.0)) / (tf + F.lit(k1) * norm)), 6)

    # score only the model's terms present in the row: fold over the
    # DISTINCT tokens that hit the idf map (unseen terms contribute 0).
    hits = F.filter(F.array_distinct(toks), lambda t: F.element_at(idf_map, t).isNotNull())
    total = F.aggregate(
        F.transform(hits, term_score), F.lit(0.0), lambda acc, x: acc + x
    )
    return doc_stream.select(
        "doc_id", dl.alias("n_tokens"), F.round(total, 6).alias("bm25")
    )


def streaming_slo_burn(events: DataFrame, budget: float | None = None) -> DataFrame:
    """Streaming twin of ``events_slo_burn_rate``: error-budget burn per
    event-time day computed on the live stream (watermarked tumbling
    windows), emitting the same (day, counts, rate, burn, exceeded)
    shape the batch face derives from the archive — alert online,
    account offline.

    State is one (count, error-count) pair per open day window, bounded
    by the 1-day watermark; the division happens per emitted row, so the
    parity with the batch face is exact once a window finalizes."""
    from trike_spark.queries.events import SLO_ERROR_BUDGET

    b = SLO_ERROR_BUDGET if budget is None else budget
    agg = (
        events.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("n_errors"),
        )
    )
    rate = F.col("n_errors").cast("double") / F.col("n_events")
    return agg.select(
        F.col("w.start").cast("date").alias("day"),
        "n_events",
        "n_errors",
        F.round(rate, 6).alias("error_rate"),
        F.round(rate / b, 4).alias("burn_rate"),
        (rate / b > 1.0).alias("budget_exceeded"),
    )


def sprt_daily_stream(events: DataFrame, watermark: str = "2 days") -> DataFrame:
    """Streaming leg of ``events_sprt_sequential``: the watermarked DAILY
    (n, k) aggregation for the B arm. Splits exactly like the trending and
    CDC twins: the engine owns the per-day counting state (|open days|
    rows, watermark-bounded); the cumulative log-likelihood walk and the
    stopping decision are not incrementally maintainable inside the engine
    (a running sum over all closed days is a second stateful operator), so
    they run in the foreachBatch publish (:func:`sprt_decision_sink`) over
    the kilobyte-sized daily table. Assignment is the same md5 draw as
    every experiment face — a user keeps their arm across batches and
    replays."""
    draw = _h60(F.col("user_id").cast("string")) % 100
    return (
        events.withWatermark("ts", watermark)
        .filter(draw >= 50)  # B arm
        .groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_day"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("k_day"),
        )
    )


def sprt_decision_sink(target_path: str, p0: float, delta: float, ln_bound: float):
    """foreachBatch half of the SPRT twin: fold the refreshed daily table
    into the cumulative LLR trajectory and publish the decision table —
    same recompute-the-readout shape as the trending sink, landing
    through the versioned layer (atomic snapshot flip, batchId-deduped,
    time-travelable — an auditor can replay WHEN the boundary was
    crossed, which for a sequential test is part of the result). p0 is
    the frozen H0 rate (from the A arm's history or a config), matching
    the batch face's pooled-A p0. Read with ``versioned.read_version``."""
    from pyspark.sql import Window

    from trike_spark.versioned import foreach_batch_publisher

    publish = foreach_batch_publisher(target_path)

    def apply(bdf: DataFrame, batch_id: int) -> None:
        w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        llr = F.col("k_cum") * F.log(F.lit((p0 + delta) / p0)) + (
            F.col("n_cum") - F.col("k_cum")
        ) * F.log(F.lit((1.0 - p0 - delta) / (1.0 - p0)))
        decisions = (
            bdf.select(
                "day",
                F.sum("n_day").over(w).cast("bigint").alias("n_cum"),
                F.sum("k_day").over(w).cast("bigint").alias("k_cum"),
            )
            .withColumn("llr", F.round(llr, 6))
            .withColumn(
                "decision",
                F.when(F.col("llr") >= ln_bound, "accept_h1")
                .when(F.col("llr") <= -ln_bound, "accept_h0")
                .otherwise("continue"),
            )
        )
        publish(decisions, batch_id)

    return apply


def streaming_pii_redact(doc_stream: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming twin of ``curation_pii_redact``'s scan/replace/re-scan
    stage: arriving text is scrubbed AT INGEST — the shape privacy teams
    actually require (PII must not land in the raw zone at all, so the
    scrub rides the ingest stream, not a nightly batch).

    Stateless and append-mode safe: the detectors are the batch face's
    exact regex constants compiled into narrow string expressions — no
    shuffle, no state store, no watermark; per-row output carries the
    found counts, the redacted text, and the same self-auditing
    ``residual_pii`` re-scan column (must be 0 on every row; a nonzero
    value in a micro-batch is an alert, not a silent leak). Parity with
    the batch face is pytest-pinned on identical input."""
    from trike_spark.queries.curation import PII_EMAIL_RE, PII_PHONE_RE

    email, phone = F.lit(PII_EMAIL_RE), F.lit(PII_PHONE_RE)
    text = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(text, email, F.lit("[EMAIL]")), phone, F.lit("[PHONE]")
    )
    return doc_stream.select(
        "*",
        F.size(F.regexp_extract_all(text, email, F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(text, phone, F.lit(0))).alias("n_phones"),
        redacted.alias("redacted"),
        (
            F.regexp_like(redacted, email) | F.regexp_like(redacted, phone)
        ).cast("int").alias("residual_pii"),
    )


def streaming_decode_quarantine(file_stream: DataFrame) -> DataFrame:
    """Streaming twin of ``multimodal_decode_quarantine``'s decode-route
    stage: media records arriving on a stream are magic-sniffed, decoded
    by the real in-repo codecs, and routed to per-reason quarantine
    buckets as they land, with a streaming aggregate maintaining the
    bucket counts.

    ``file_stream`` carries (path, content binary) — the same contract
    as the batch face's binaryFile scan, so the Arrow kernel
    (``_decode_or_quarantine_batch``) is literally shared; any source
    that yields those two columns works (tests feed a JSON spool with
    base64 content; a deployment feeds the object-store notification
    stream). The aggregate keys on the closed reason set, so state is
    O(reasons) — bounded regardless of stream length; run it in update/
    complete mode (no watermark needed: the rollup is global, the
    per-file routing itself is stateless and append-safe if emitted
    pre-aggregate). Parity with the batch face is pytest-pinned on an
    identical corpus."""
    from trike_spark.queries.multimodal import (
        _QUARANTINE_SCHEMA,
        _decode_or_quarantine_batch,
    )

    per_batch = file_stream.select("path", "content").mapInPandas(
        _decode_or_quarantine_batch, schema=_QUARANTINE_SCHEMA
    )
    return per_batch.groupBy("reason").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_verified").alias("n_verified"),
    )
