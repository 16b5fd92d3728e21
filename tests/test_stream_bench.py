"""tools/stream_bench.py: the streaming-throughput harness must run the
full ingest path and emit one well-formed JSON line (the contract the
round notes and future drivers consume)."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest


@pytest.mark.parametrize("sink", ["driver", "distributed"])
def test_stream_bench_emits_contract_json(sink):
    # One retry with a longer window: when the whole suite (its own Spark
    # JVM on all cores) runs alongside, the subprocess can start micro-
    # batches slowly enough that a short run yields < 3 of them — that is
    # harness-under-load noise, not a contract violation. A genuine
    # contract break (bad JSON, wrong keys) fails on both attempts.
    for duration in ("14", "30"):
        out = subprocess.run(
            [
                sys.executable,
                "/root/repo/tools/stream_bench.py",
                "--rows-per-second",
                "1500",
                "--duration",
                duration,
                "--connections",
                "4",
                "--sink",
                sink,
            ],
            capture_output=True,
            text=True,
            timeout=180,
        )
        if out.returncode == 0 or "too few micro-batches" not in (
            out.stderr + out.stdout
        ):
            break
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["metric"] == "ingest_events_per_sec"
    assert payload["unit"] == "events/sec"
    assert payload["value"] > 0
    assert payload["events_delivered"] > 0
    assert payload["micro_batches"] >= 3
    assert payload["connections"] == 4
    assert payload["sink"] == sink
    assert payload["batch_gap_p50_sec"] >= 0
    assert payload["batch_gap_p95_sec"] >= payload["batch_gap_p50_sec"]
