"""Streaming twins of the sketch/curation families
(trike_spark/streaming/analytics.py): a windowed Count-Min sketch and
deterministic hash sampling over a file-backed stream, each verified
against the identical batch computation on the same rows — the
batch/stream parity the md5-derived determinism exists to provide.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType, TimestampType

from trike_spark.streaming.analytics import (
    streaming_countmin_cells,
    streaming_hash_sample,
)

SCHEMA = StructType(
    [
        StructField("token", StringType()),
        StructField("ts", TimestampType()),
    ]
)

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


def _write(src, name, rows):
    with open(src / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _poll(spark, q, table, pred, timeout=90):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if q.exception():
            raise AssertionError(str(q.exception()))
        rows = spark.table(table).collect()
        if pred(rows):
            return rows
        time.sleep(1)
    raise AssertionError(f"timeout; rows={spark.table(table).collect()}")


TOKENS_B1 = [
    {"token": t, "ts": f"2024-01-01T10:00:{i % 50:02d}.000Z"}
    for i, t in enumerate(["the", "cat", "the", "dog", "the", "cat", "a", "b"])
]
TOKENS_B2 = [
    {"token": t, "ts": f"2024-01-01T10:01:{i % 50:02d}.000Z"}
    for i, t in enumerate(["the", "zebra", "cat", "the"])
]


def test_streaming_countmin_matches_batch_cells(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write(src, "b1.json", TOKENS_B1)

    stream = (
        spark.readStream.schema(SCHEMA).option("timestampFormat", TS_FMT).json(str(src))
    )
    cells = streaming_countmin_cells(stream)
    q = (
        cells.writeStream.format("memory")
        .queryName("cms_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        _poll(spark, q, "cms_out", lambda rows: len(rows) > 0)
        _write(src, "b2.json", TOKENS_B2)
        # batch reference over the SAME rows — identical operator code path
        batch = spark.createDataFrame(
            [(r["token"], r["ts"].replace("Z", "")) for r in TOKENS_B1 + TOKENS_B2],
            "token string, ts_s string",
        ).select("token", F.to_timestamp("ts_s").alias("ts"))
        expected = {
            (r["window_start"], r["d"], r["cell"], r["c"])
            for r in streaming_countmin_cells(batch).collect()
        }
        got = _poll(
            spark,
            q,
            "cms_out",
            lambda rows: {(r["window_start"], r["d"], r["cell"], r["c"]) for r in rows}
            == expected,
        )
        # both event-time windows present, state is cells — not per-token
        assert len({r["window_start"] for r in got}) == 2
    finally:
        q.stop()


def test_streaming_hash_sample_matches_batch_filter(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    rows = [
        {"token": f"doc-{i}", "ts": "2024-01-01T10:00:00.000Z"} for i in range(200)
    ]
    _write(src, "b1.json", rows)

    stream = (
        spark.readStream.schema(SCHEMA).option("timestampFormat", TS_FMT).json(str(src))
    )
    sampled = streaming_hash_sample(stream, key_col="token", rate_pct=10)
    q = (
        sampled.writeStream.format("memory")
        .queryName("sample_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        batch = spark.createDataFrame([(r["token"],) for r in rows], "token string")
        expected = {
            r["token"]
            for r in streaming_hash_sample(batch, "token", 10).collect()
        }
        assert 0 < len(expected) < 200  # the draw really samples
        got = _poll(
            spark,
            q,
            "sample_out",
            lambda rs: {r["token"] for r in rs} == expected,
        )
        assert {r["token"] for r in got} == expected
    finally:
        q.stop()


KEYS_B1 = [
    {"token": f"user{i}", "ts": f"2024-01-01T10:00:{i % 50:02d}.000Z"} for i in range(20)
]
KEYS_B2 = [
    {"token": f"user{i}", "ts": f"2024-01-01T10:01:{i % 50:02d}.000Z"}
    for i in (3, 5, 21, 22)
]


def test_streaming_hll_matches_batch_registers(spark, tmp_path):
    from trike_spark.streaming.analytics import streaming_hll_registers

    src = tmp_path / "in"
    src.mkdir()
    _write(src, "b1.json", KEYS_B1)

    stream = (
        spark.readStream.schema(SCHEMA).option("timestampFormat", TS_FMT).json(str(src))
    )
    regs = streaming_hll_registers(stream, key_col="token")
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        _poll(spark, q, "hll_out", lambda rows: len(rows) > 0)
        _write(src, "b2.json", KEYS_B2)
        batch = spark.createDataFrame(
            [(r["token"], r["ts"].replace("Z", "")) for r in KEYS_B1 + KEYS_B2],
            "token string, ts_s string",
        ).select("token", F.to_timestamp("ts_s").alias("ts"))
        expected = {
            (r["window_start"], r["reg"], r["m"])
            for r in streaming_hll_registers(batch, key_col="token").collect()
        }
        got = _poll(
            spark,
            q,
            "hll_out",
            lambda rows: {(r["window_start"], r["reg"], r["m"]) for r in rows}
            == expected,
        )
        # state is registers, bounded by HLL_M per window — not per-key
        from trike_spark.queries.sketches import HLL_M

        per_window = {}
        for r in got:
            per_window.setdefault(r["window_start"], 0)
            per_window[r["window_start"]] += 1
        assert all(n <= HLL_M for n in per_window.values())
        assert len(per_window) == 2
    finally:
        q.stop()


DOCS_IDX = [
    (1, "the quick brown fox jumps over the lazy dog again and again today"),
    (2, "completely different content about spark shuffles and parquet files"),
]
DOCS_NEW = [
    {"doc_id": 100, "text": "the quick brown fox jumps over the lazy dog again and again today"},
    {"doc_id": 101, "text": "nothing like anything in the index at all whatsoever truly unique"},
]


def test_streaming_lsh_dedup_probe_matches_batch(spark, tmp_path):
    from pyspark.sql.types import LongType

    from trike_spark.queries.dedup import minhash_buckets_df
    from trike_spark.streaming.analytics import streaming_lsh_dedup_probe

    doc_schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    index = minhash_buckets_df(
        spark.createDataFrame(DOCS_IDX, "doc_id long, text string")
    )

    src = tmp_path / "docs_in"
    src.mkdir()
    _write(src, "batch1.json", DOCS_NEW)
    stream = spark.readStream.schema(doc_schema).json(str(src))
    hits = streaming_lsh_dedup_probe(stream, index)
    q = (
        hits.writeStream.format("memory")
        .queryName("lsh_probe_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        got = _poll(spark, q, "lsh_probe_out", lambda rows: len(rows) > 0)
        expected = {
            (r["doc_id"], r["dup_of"], r["band_idx"])
            for r in streaming_lsh_dedup_probe(
                spark.createDataFrame(
                    [(d["doc_id"], d["text"]) for d in DOCS_NEW],
                    "doc_id long, text string",
                ),
                index,
            ).collect()
        }
        got = _poll(
            spark,
            q,
            "lsh_probe_out",
            lambda rows: {(r["doc_id"], r["dup_of"], r["band_idx"]) for r in rows}
            == expected,
        )
        # the exact duplicate collides with its index twin; the unique doc not
        assert {r["doc_id"] for r in got} == {100}
        assert {r["dup_of"] for r in got} == {1}
    finally:
        q.stop()


DOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("text", StringType()),
        StructField("ts", TimestampType()),
    ]
)

DOCS_B1 = [
    {"doc_id": str(i), "text": " ".join(f"w{i}{j}" for j in range(3 + i % 5)),
     "ts": "2024-01-01T10:00:05.000Z"}
    for i in range(12)
]
DOCS_B2 = [
    {"doc_id": str(100 + i), "text": " ".join(f"v{i}{j}" for j in range(2 + i % 4)),
     "ts": "2024-01-01T10:01:10.000Z"}
    for i in range(8)
]


def test_streaming_weighted_sample_matches_batch_draws(spark, tmp_path):
    """The min-ticket draw is a MIN monoid: the stream's per-window draws
    must be bit-identical to the same computation on the same rows as a
    static DataFrame (sample membership survives batch→stream replay)."""
    from trike_spark.streaming.analytics import streaming_weighted_sample_draws

    src = tmp_path / "in"
    src.mkdir()
    _write(src, "b1.json", DOCS_B1)

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("timestampFormat", TS_FMT)
        .json(str(src))
    )
    draws = streaming_weighted_sample_draws(stream, window_duration="1 minute")
    q = (
        draws.writeStream.format("memory")
        .queryName("wsample_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        _poll(spark, q, "wsample_out", lambda rows: len(rows) >= len(DOCS_B1))
        _write(src, "b2.json", DOCS_B2)
        batch = spark.createDataFrame(
            [(r["doc_id"], r["text"], r["ts"].replace("Z", "")) for r in DOCS_B1 + DOCS_B2],
            "doc_id string, text string, ts_s string",
        ).select("doc_id", "text", F.to_timestamp("ts_s").alias("ts"))
        expected = {
            (r["window_start"], r["doc_id"], r["n_tokens"], r["draw"])
            for r in streaming_weighted_sample_draws(batch).collect()
        }
        got = _poll(
            spark,
            q,
            "wsample_out",
            lambda rows: {
                (r["window_start"], r["doc_id"], r["n_tokens"], r["draw"]) for r in rows
            }
            == expected,
        )
        assert {
            (r["window_start"], r["doc_id"], r["n_tokens"], r["draw"]) for r in got
        } == expected
        # two event-time windows (10:00 and 10:01) must both be present
        assert len({r["window_start"] for r in got}) == 2
    finally:
        q.stop()


def test_streaming_dsir_score_matches_batch(spark, tmp_path):
    from pyspark.sql.types import LongType

    from trike_spark.queries.curation import dsir_llr_entries
    from trike_spark.streaming.analytics import streaming_dsir_score

    corpus = spark.createDataFrame(
        [
            (0, "en", "hash join merge scan"),
            (1, "en", "join join filter"),
            (2, "de", "der hash filter"),
            (3, "fr", "le scan le merge"),
        ],
        "doc_id long, lang string, text string",
    )
    entries, oov = dsir_llr_entries(corpus)
    assert oov != 0.0 and len(entries) > 0

    new_docs = [
        {"doc_id": 10, "text": "hash join unseen"},
        {"doc_id": 11, "text": "der der filter"},
    ]
    doc_schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )

    src = tmp_path / "dsir_in"
    src.mkdir()
    _write(src, "b1.json", new_docs)
    stream = spark.readStream.schema(doc_schema).json(str(src))
    scored = streaming_dsir_score(stream, entries, oov)
    q = (
        scored.writeStream.format("memory")
        .queryName("dsir_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dsir_ckpt"))
        .start()
    )
    try:
        got = _poll(spark, q, "dsir_out", lambda rows: len(rows) == len(new_docs))
    finally:
        q.stop()

    # parity: the same function on a static frame, plus a pure-Python fold
    # in token-array order (both IEEE doubles → bit-identical before the
    # one final round).
    static = streaming_dsir_score(
        spark.createDataFrame(
            [(d["doc_id"], d["text"]) for d in new_docs], "doc_id long, text string"
        ),
        entries,
        oov,
    ).collect()
    lut = dict(entries)
    for rows in (got, static):
        by_id = {r["doc_id"]: r for r in rows}
        for d in new_docs:
            toks = d["text"].split(" ")
            acc = 0.0
            for t in toks:
                acc += lut.get(t, oov)
            exp = round(acc / len(toks), 6)
            assert by_id[d["doc_id"]]["dsir_score"] == exp, (d, rows)
            assert by_id[d["doc_id"]]["n_tokens"] == len(toks)
    assert {r["doc_id"] for r in got} == {r["doc_id"] for r in static}


def test_streaming_anomaly_probe_matches_batch(spark, tmp_path):
    from pyspark.sql.types import DoubleType, LongType

    from trike_spark.streaming.analytics import streaming_anomaly_probe

    baselines = spark.createDataFrame(
        [("click", 10.0, 2.0), ("view", 5.0, 1.0)],
        "event_type string, med double, mad double",
    )
    events = [
        {"event_id": 1, "event_type": "click", "value": 10.5},   # z ~ 0.17
        {"event_id": 2, "event_type": "click", "value": 30.0},   # z ~ 6.7 -> out
        {"event_id": 3, "event_type": "view", "value": 4.9},     # z ~ -0.07
        {"event_id": 4, "event_type": "view", "value": -10.0},   # z ~ -10.1 -> out
    ]
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    src = tmp_path / "anom_in"
    src.mkdir()
    _write(src, "b1.json", events)
    stream = spark.readStream.schema(schema).json(str(src))
    out = streaming_anomaly_probe(stream, baselines)
    q = (
        out.writeStream.format("memory")
        .queryName("anom_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "anom_ckpt"))
        .start()
    )
    try:
        got = _poll(spark, q, "anom_out", lambda rows: len(rows) >= 2)
    finally:
        q.stop()
    # stateless ⇒ the identical function on a static frame is the oracle
    static = streaming_anomaly_probe(
        spark.createDataFrame(
            [(e["event_id"], e["event_type"], e["value"]) for e in events],
            "event_id long, event_type string, value double",
        ),
        baselines,
    ).collect()
    key = lambda r: (r["event_id"], r["robust_z"])
    assert sorted(map(key, got)) == sorted(map(key, static))
    assert {r["event_id"] for r in got} == {2, 4}


def test_streaming_bm25_score_matches_python_fold(spark, tmp_path):
    from pyspark.sql.types import LongType

    from trike_spark.streaming.analytics import streaming_bm25_score

    idf = [("hash", 1.2), ("join", 0.9)]
    avgdl = 4.0
    docs = [
        {"doc_id": 1, "text": "hash join hash scan"},
        {"doc_id": 2, "text": "scan filter merge"},
        {"doc_id": 3, "text": "join join join"},
    ]
    doc_schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    src = tmp_path / "bm25_in"
    src.mkdir()
    _write(src, "b1.json", docs)
    stream = spark.readStream.schema(doc_schema).json(str(src))
    q = (
        streaming_bm25_score(stream, idf, avgdl)
        .writeStream.format("memory")
        .queryName("bm25_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "bm25_ckpt"))
        .start()
    )
    try:
        got = _poll(spark, q, "bm25_out", lambda rows: len(rows) == len(docs))
    finally:
        q.stop()
    lut = dict(idf)
    by_id = {r["doc_id"]: r for r in got}
    k1, b = 1.2, 0.75
    for d in docs:
        toks = d["text"].split(" ")
        dl = len(toks)
        norm = (1.0 - b) + b * (float(dl) / avgdl)
        seen = []
        for t in toks:  # distinct, first-occurrence order (array_distinct)
            if t not in seen:
                seen.append(t)
        acc = 0.0
        for t in seen:
            if t in lut:
                tf = float(toks.count(t))
                acc += round(lut[t] * ((tf * (k1 + 1.0)) / (tf + k1 * norm)), 6)
        assert by_id[d["doc_id"]]["bm25"] == round(acc, 6), (d, got)
        assert by_id[d["doc_id"]]["n_tokens"] == dl


def test_streaming_slo_burn_matches_batch_face(spark, tmp_path):
    """The streaming burn-rate twin must reproduce the batch face's rows
    exactly once windows finalize (complete-mode read of a bounded
    stream)."""
    from trike_spark.queries.events import events_slo_burn_rate
    from trike_spark.streaming.analytics import streaming_slo_burn

    sf_dir = "/root/testdata/sf0.001"
    batch = {tuple(r) for r in events_slo_burn_rate(spark, sf_dir).collect()}

    from trike_spark.io import load_table

    src = tmp_path / "slo_events"
    load_table(spark, sf_dir, "events").write.parquet(str(src))
    schema = load_table(spark, sf_dir, "events").schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = streaming_slo_burn(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("slo_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_slo"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM slo_out").collect()}
    assert got == batch


def test_streaming_pii_redact_matches_batch_face(spark, tmp_path):
    """The streaming scrub must produce byte-identical redactions and
    counts to the batch face's scan stage on the same lines, and its
    residual_pii audit must be 0 on every row."""
    from trike_spark.streaming.analytics import streaming_pii_redact

    lines = [
        ("reach rep at user7@example.com re Customer#7",),
        ("call +1-555-0042 or mail ops@example.com cc admin@example.com",),
        ("no contact info here",),
    ]
    batch = spark.createDataFrame(lines, "text string")
    want = sorted(
        map(tuple, streaming_pii_redact(batch).collect())
    )  # the twin runs identically on a batch frame
    assert [r[-1] for r in want] == [0, 0, 0]
    assert any("[EMAIL]" in r[3] for r in want)
    assert any("[PHONE]" in r[3] for r in want)

    src = tmp_path / "pii_src"
    batch.write.parquet(str(src))
    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    q = (
        streaming_pii_redact(stream)
        .writeStream.format("memory")
        .queryName("pii_twin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_pii"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    q.stop()
    got = sorted(map(tuple, spark.table("pii_twin").collect()))
    assert got == want
