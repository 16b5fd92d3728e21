"""Health observability — trike's T3 HealthChecker re-expressed as a
StreamingQueryListener (reference lib/trike/health_checker.ex:43-75; log
contract O4).

The reference logs, every 60 s, listener counters and per-connection
mailbox depth (its backpressure metric). The Spark analogues are query
progress (rows/s, batch duration) and state-store size (live sessions).
"""

from __future__ import annotations

import logging

from pyspark.sql.streaming import StreamingQueryListener

logger = logging.getLogger("trike_spark.health")


class HealthListener(StreamingQueryListener):
    """Logs one structured line per micro-batch — same role as
    health_checker.ex's periodic :check_health scan."""

    def onQueryStarted(self, event) -> None:
        logger.info("query_started id=%s name=%s", event.id, event.name)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        state_rows = sum(s.numRowsTotal for s in p.stateOperators) if p.stateOperators else 0
        # keys mirror the reference's got_data/connection scan lines (O4)
        logger.info(
            "health batch_id=%s rows_per_sec=%.1f batch_duration_ms=%s state_rows=%d",
            p.batchId,
            p.processedRowsPerSecond or 0.0,
            p.durationMs.get("triggerExecution") if p.durationMs else None,
            state_rows,
        )

    def onQueryTerminated(self, event) -> None:
        logger.info("query_terminated id=%s exception=%s", event.id, event.exception)

    def onQueryIdle(self, event) -> None:
        logger.debug("query_idle id=%s", event.id)
