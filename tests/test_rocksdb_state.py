"""The framing op runs unchanged on the RocksDB state store provider —
the bounded-memory configuration for 100 TB streaming state."""

from __future__ import annotations

import json
import time


from trike_spark.streaming.framing import CHUNK_SCHEMA, EOT, framed_stream

MSG = "4994,TSCH,02:00:06,R,RLD,W"


def test_framing_on_rocksdb_provider(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    with open(src / "c.json", "w") as f:
        f.write(
            json.dumps(
                {
                    "conn_id": "conn-1",
                    "chunk": MSG + EOT,
                    "arrival_ts": "2021-08-13T12:00:00.000Z",
                    "arrival_seq": 0,
                }
            )
            + "\n"
        )
    chunks = (
        spark.readStream.schema(CHUNK_SCHEMA)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
        .json(str(src))
    )
    # provider is read from session conf when the query starts
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    q = (
        framed_stream(chunks, stale_timeout_ms=600_000)
        .writeStream.format("memory")
        .queryName("rocks_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            if q.exception():
                raise AssertionError(str(q.exception()))
            rows = spark.table("rocks_out").collect()
            if rows:
                break
            time.sleep(1)
    finally:
        q.stop()
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    assert any(r["raw"] == MSG for r in rows)
