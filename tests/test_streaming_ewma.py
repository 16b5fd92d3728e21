"""Parity test: the streaming EWMA (applyInPandasWithState bounded-deque
state) emits bit-identical values to the batch band-join face
``window_ewma_trailing`` on an in-order single-batch stream of the real
sf0.001 orders table."""

from __future__ import annotations

import shutil
import time

from trike_spark.queries.windows import window_ewma_trailing
from trike_spark.streaming.analytics import ewma_stream

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_ewma_matches_batch_face(spark, tmp_path):
    src = tmp_path / "orders_src"
    src.mkdir()
    # one parquet file → one micro-batch → per-key in-batch sort gives the
    # exact batch ordering (o_orderdate, o_orderkey)
    shutil.copy(f"{SF_DIR}/orders.parquet", src / "orders.parquet")

    batch = {
        (r.custkey, r.orderkey): (r.rn, r.total_cents, r.ewma_cents)
        for r in window_ewma_trailing(spark, SF_DIR).collect()
    }
    assert batch  # non-trivial input

    orders_schema = spark.read.parquet(f"{SF_DIR}/orders.parquet").schema
    stream = spark.readStream.schema(orders_schema).parquet(str(src))
    q = (
        ewma_stream(stream)
        .writeStream.format("memory")
        .queryName("ewma_twin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ewma"))
        .start()
    )
    try:
        deadline = time.time() + 90
        rows = []
        while time.time() < deadline:
            if q.exception():
                raise AssertionError(str(q.exception()))
            rows = spark.table("ewma_twin").collect()
            if len(rows) >= len(batch) and not q.status["isDataAvailable"]:
                break
            time.sleep(1)
        got = {(r.custkey, r.orderkey): (r.rn, r.total_cents, r.ewma_cents) for r in rows}
        assert got == batch
    finally:
        q.stop()


def test_streaming_ewma_state_is_bounded_across_batches(spark, tmp_path):
    """Two sequential files for one customer: the second batch's EWMA must
    continue from carried state (not restart), proving the deque persists
    across micro-batches and stays bounded."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime as dt

    src = tmp_path / "seq_src"
    src.mkdir()

    def write(name, rows):
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                    "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                    "o_orderstatus": pa.array(["O"] * len(rows)),
                    "o_totalprice": pa.array([float(r[2]) for r in rows], pa.float64()),
                    "o_orderdate": pa.array([r[3] for r in rows], pa.date32()),
                    "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
                }
            ),
            str(src / name),
        )

    d = dt.date(2024, 1, 1)
    write("b1.parquet", [(1, 7, 100.0, d), (2, 7, 200.0, dt.date(2024, 1, 2))])

    schema = (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        ewma_stream(stream)
        .writeStream.format("memory")
        .queryName("ewma_seq")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_seq"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and len(spark.table("ewma_seq").collect()) < 2:
            if q.exception():
                raise AssertionError(str(q.exception()))
            time.sleep(1)
        write("b2.parquet", [(3, 7, 300.0, dt.date(2024, 1, 3))])
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = {r.orderkey: r for r in spark.table("ewma_seq").collect()}
            if len(rows) >= 3:
                break
            time.sleep(1)
        # hand-computed truncated EWMA in cents, weights 2^15, 2^14, ...
        assert rows[1].ewma_cents == 10000
        assert rows[2].ewma_cents == (10000 * (1 << 14) + 20000 * (1 << 15)) // ((1 << 14) + (1 << 15))
        w3, w2_, w1_ = 1 << 15, 1 << 14, 1 << 13
        assert rows[3].ewma_cents == (
            (10000 * w1_ + 20000 * w2_ + 30000 * w3) // (w1_ + w2_ + w3)
        ), "batch-2 row must continue from carried state"
    finally:
        q.stop()
