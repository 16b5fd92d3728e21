"""SparkSession factory with config-from-env precedence mirroring the
reference's compile-default → runtime-env layering (reference
config/config.exs:15-21, config/runtime.exs:51-65).

Scale posture: these defaults are tuned for the test harness (local[N],
single JVM) but every knob is env-overridable so the same code deploys to a
1000-executor cluster by changing config only, never code. AQE is on so
shuffle partition counts, skew joins, and broadcast decisions re-plan at
runtime from real statistics.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class EngineConfig:
    """Engine configuration, env-overridable (names mirror the reference's
    LISTEN_PORT / STALE_TIMEOUT_MS / KINESIS_STREAM contract,
    reference config/runtime.exs:3,11-15,51-65)."""

    master: str = field(
        default_factory=lambda: os.environ.get(
            "SPARK_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
        )
    )
    shuffle_partitions: int = field(
        default_factory=lambda: int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    )
    # trike's stale connection timeout (reference config/config.exs:19)
    stale_timeout_ms: int = field(
        default_factory=lambda: int(os.environ.get("STALE_TIMEOUT_MS", "300000"))
    )
    # trike's heartbeat packet (reference config/config.exs:21)
    heartbeat: str = field(
        default_factory=lambda: os.environ.get("OCS_HEARTBEAT", "HEARTBEAT")
    )
    # "console" selects the fake sink, like KINESIS_STREAM=console
    # (reference config/runtime.exs:11-15)
    kinesis_stream: str = field(
        default_factory=lambda: os.environ.get("KINESIS_STREAM", "console")
    )
    sf_dir: str = field(
        default_factory=lambda: os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
    )


def _heap_mb(spec: str) -> int:
    """JVM memory string ('8g', '4096m', '512k', bare MB count) → MB."""
    s = spec.strip().lower()
    units = {"k": 1 / 1024, "m": 1, "g": 1024, "t": 1024 * 1024}
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(s)  # Spark treats a bare number in the master string as MB


def _check_local_cluster_memory(master: str) -> None:
    """Fail fast when local-cluster[n, c, m]'s worker capacity m (MB) can't
    fit the configured executor heap: executors then never register and the
    job HANGS with no diagnostic (observed under the stream bench). The
    master string sizes the WORKER; the executor still launches at
    spark.executor.memory — both knobs must agree."""
    m = re.fullmatch(r"local-cluster\[\s*\d+\s*,\s*\d+\s*,\s*(\d+)\s*\]", master)
    if not m:
        raise ValueError(
            f"malformed local-cluster master {master!r} "
            "(expected local-cluster[n,cores,memoryMB])"
        )
    worker_mb = int(m.group(1))
    executor_mb = _heap_mb(os.environ.get("SPARK_EXECUTOR_MEMORY", "8g"))
    if worker_mb < executor_mb:
        raise ValueError(
            f"local-cluster worker memory {worker_mb} MB < executor heap "
            f"{executor_mb} MB (spark.executor.memory): executors cannot "
            "register and the job hangs. Raise the master string's third "
            "field or lower SPARK_EXECUTOR_MEMORY."
        )


def get_spark(app_name: str = "trike_spark", config: EngineConfig | None = None) -> SparkSession:
    """Build (or fetch) the SparkSession.

    Settings that matter at 100 TB:
      * AQE + skew-join handling: runtime re-planning from observed stats.
      * autoBroadcastJoinThreshold stays default (10 MiB) — dimension tables
        (region/nation/supplier) broadcast automatically; we additionally
        hint ``broadcast()`` where we *know* the dim is small.
      * Arrow enabled for every pandas interchange (the two stateful ops).
      * UTC session timezone so results are oracle-comparable and
        cluster-location-independent.
    """
    cfg = config or EngineConfig()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Optimization-guide §9 knobs, env-parameterized so cluster
        # deployments can flip them without code changes.
        # preferSortMergeJoin stays TRUE by default: SMJ spills, a
        # shuffled-hash build side must fit task memory — the safe
        # default for 100 TB fact-fact joins; flip per-job where the
        # build side provably fits (measurement in OPTIMIZATION_r10.md).
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_PREFER_SMJ", "true"),
        )
        # AQE target for post-shuffle partition size: 64m default keeps
        # local-mode partitions parallel; production guidance is 256m
        # (guide §9) via env, scaling reducer counts with data, not code.
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_ADVISORY_PARTITION_BYTES", "64m"),
        )
        # Shuffle/spill codec (guide §2.3/§9 "measure both"): default stays
        # Spark's lz4 — the r10 interleaved A/B on the five heaviest-
        # shuffle faces split 3-2 with the two largest deltas cancelling
        # (numbers in OPTIMIZATION_r10.md): no consistent local winner,
        # because local[] shuffles never cross a NIC, so zstd's ratio win
        # buys nothing here while its CPU cost shows on label-pair-heavy
        # shuffles. A 100 TB deployment shuffling over real networks
        # should re-measure with SPARK_IO_COMPRESSION=zstd.
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_IO_COMPRESSION", "lz4"),
        )
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.ui.showConsoleProgress", "false")
        # In local[] mode the driver JVM IS the executor: all task memory,
        # shuffle buffers, and broadcast blocks live in this one heap. 8g
        # across 32 task threads (~250 MB/thread) thrashes GC by the tail of
        # a long suite (measured: the last five bench queries inflate
        # 40-50% vs standalone at 8g, flat at 16g+). On a real cluster the
        # driver only coordinates, so this default is local-mode-specific
        # and env-overridable either way.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    # RocksDB state store: bounds streaming state memory at scale (millions
    # of live sessions) — the reference's unbounded per-process heap buffer
    # is its acknowledged risk (SURVEY §4.2). Env-gated; HDFS-backed default
    # store is fine for tests.
    if os.environ.get("SPARK_STATE_STORE", "").lower() == "rocksdb":
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    # nanos-as-long for the events table's TIMESTAMP(NANOS) column — set at
    # build time here; ensure_session_confs covers foreign sessions.
    builder = builder.config("spark.sql.legacy.parquet.nanosAsLong", "true")
    # local-cluster[n,c,m] rehearses REAL multi-executor execution (separate
    # executor JVMs + their own Python workers, network shuffle, broadcast
    # over the wire) on one machine — the scale-out posture the stream
    # bench measures (tools/stream_bench.py --master local-cluster[...]).
    # Executor Python processes don't inherit the driver's sys.path, so
    # ship the repo root; executor heap comes from the master string.
    if cfg.master.startswith("local-cluster"):
        _check_local_cluster_memory(cfg.master)
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        builder = (
            builder.config(
                "spark.executorEnv.PYTHONPATH",
                os.pathsep.join([repo_root, os.environ.get("PYTHONPATH", "")]).rstrip(
                    os.pathsep
                ),
            )
            # The streaming micro-batch planner recurses a Java regex over
            # a long generated string during cluster-mode planning; the
            # default 1 MiB thread stack overflows (measured: framing
            # pipeline dies with StackOverflowError in the stream
            # execution thread under local-cluster, fine at -Xss64m).
            # Wide stacks are cheap (virtual memory, committed on use).
            .config("spark.driver.extraJavaOptions", "-Xss64m")
            .config("spark.executor.extraJavaOptions", "-Xss64m")
            # The master string's third field is the WORKER's capacity;
            # executors still launch at spark.executor.memory (default
            # 1g — measured OOM under the stream bench's backlog
            # batches). Size the executor heap explicitly and keep the
            # master's MB at least this large.
            .config(
                "spark.executor.memory",
                os.environ.get("SPARK_EXECUTOR_MEMORY", "8g"),
            )
        )
    # Only set master when not already inside a cluster-provided session.
    if "SPARK_CONNECT_MODE_ENABLED" not in os.environ:
        builder = builder.master(cfg.master)
    return builder.getOrCreate()


_ADAPTED_SESSIONS: set[int] = set()


def ensure_session_confs(spark: SparkSession) -> None:
    """Adapter for CALLER-PROVIDED sessions (the correctness driver builds
    its own plain SparkSession): idempotently pin the two runtime-settable
    confs query results depend on — UTC session timezone (timestamps
    compare against a naive-UTC oracle) and nanos-as-long parquet reads
    (the events table stores TIMESTAMP(NANOS), which Spark can't represent
    natively). Sessions built by :func:`get_spark` already have both.

    Runs once per session object: repeated ``load_table`` calls must not
    keep mutating shared session state as a read side effect (a conf flip
    mid-flight by a concurrent caller would otherwise be silently undone).
    Contract for callers who manage their own session: either route reads
    through ``trike_spark.io`` (which calls this) or set these two confs
    themselves.
    """
    key = id(spark)
    if key in _ADAPTED_SESSIONS:
        return
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _ADAPTED_SESSIONS.add(key)
