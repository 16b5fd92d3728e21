"""Config precedence contract — trike's compile-default → env layering
(reference config/config.exs:15-21, config/runtime.exs:51-65; behavior O3)."""

from __future__ import annotations

from trike_spark.session import EngineConfig


def test_defaults_match_reference(monkeypatch):
    for var in ("STALE_TIMEOUT_MS", "KINESIS_STREAM", "OCS_HEARTBEAT"):
        monkeypatch.delenv(var, raising=False)
    cfg = EngineConfig()
    assert cfg.stale_timeout_ms == 300_000  # config.exs:19
    assert cfg.heartbeat == "HEARTBEAT"  # config.exs:21
    assert cfg.kinesis_stream == "console"  # runtime.exs:11-15 fake default


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("STALE_TIMEOUT_MS", "1234")
    monkeypatch.setenv("KINESIS_STREAM", "prod-stream")
    monkeypatch.setenv("OCS_HEARTBEAT", "PING")
    cfg = EngineConfig()
    assert cfg.stale_timeout_ms == 1234
    assert cfg.kinesis_stream == "prod-stream"
    assert cfg.heartbeat == "PING"


def test_local_cluster_memory_guard(monkeypatch):
    """local-cluster[n,c,m] with worker MB below the executor heap hangs
    with no diagnostic (executors can't register); the session factory
    must fail fast instead."""
    import pytest

    from trike_spark.session import _check_local_cluster_memory, _heap_mb

    assert _heap_mb("8g") == 8192
    assert _heap_mb("4096m") == 4096
    assert _heap_mb("4096") == 4096  # bare master-string field is MB
    monkeypatch.setenv("SPARK_EXECUTOR_MEMORY", "8g")
    _check_local_cluster_memory("local-cluster[2,8,8192]")  # fits: no raise
    with pytest.raises(ValueError, match="executors cannot"):
        _check_local_cluster_memory("local-cluster[2,8,4096]")
    with pytest.raises(ValueError, match="malformed"):
        _check_local_cluster_memory("local-cluster[2,8]")
    monkeypatch.setenv("SPARK_EXECUTOR_MEMORY", "2g")
    _check_local_cluster_memory("local-cluster[2,8,4096]")  # now fits
