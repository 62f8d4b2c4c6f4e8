"""Pipeline metrics emission (SURVEY.md §2 B13) + structured logging
(B14).

The reference grants the integration CloudWatch PutMetricData on the
``AWS/Glue/ZeroETL`` namespace (reference ts:119-123; README.md:182)
and a log group/stream per run (ts:125-128). The Spark-native
realization:

* batch metrics ride on ``DataFrame.observe`` — Spark evaluates the
  metric expressions *during* the action that materializes the frame,
  so counting committed rows costs zero extra jobs;
* streaming metrics come from a ``StreamingQueryListener`` capturing
  each microbatch's progress (rows/sec, batch duration, state size);
* logs are JSON lines (one object per event) through the stdlib
  ``logging`` machinery — structured, greppable, no extra deps.
"""

from __future__ import annotations

import json
import logging
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

#: engine metric namespace — mirrors the reference's AWS/Glue/ZeroETL
METRIC_NAMESPACE = "engine/zero_etl"


# ---------------------------------------------------------------------------
# B13 batch: observe-based metrics (no extra jobs)
# ---------------------------------------------------------------------------

@dataclass
class CommitMetrics:
    """Metrics of one table commit, filled by the observed action."""

    operation: str
    row_count: int
    observed: dict[str, Any] = field(default_factory=dict)
    elapsed_sec: float = 0.0

    def to_dict(self) -> dict[str, Any]:
        return {
            "namespace": METRIC_NAMESPACE,
            "operation": self.operation,
            "row_count": self.row_count,
            "elapsed_sec": round(self.elapsed_sec, 3),
            **self.observed,
        }


def observe_rows(df: DataFrame, name: str = "commit") -> tuple[DataFrame, Observation]:
    """Attach a row-count observation to ``df``. The count is computed
    by the SAME job that materializes the frame (e.g. the parquet
    write) — the idiomatic replacement for a separate ``.count()``."""
    obs = Observation(f"{METRIC_NAMESPACE}/{name}-{time.time_ns()}")
    return df.observe(obs, F.count(F.lit(1)).alias("row_count")), obs


# ---------------------------------------------------------------------------
# B13 streaming: microbatch progress listener
# ---------------------------------------------------------------------------

class MicrobatchMetricsListener(StreamingQueryListener):
    """Collects per-microbatch progress for CDC streams (H7/H8):
    rows ingested, processing rate, batch duration. ``progress`` is a
    plain list of dicts — queryable, serializable, test-assertable."""

    def __init__(self) -> None:
        self.progress: list[dict[str, Any]] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.progress.append(
            {
                "namespace": METRIC_NAMESPACE,
                "query_id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "processed_rows_per_sec": p.processedRowsPerSecond,
                "duration_ms": dict(p.durationMs or {}),
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def attach_streaming_metrics(spark: SparkSession) -> MicrobatchMetricsListener:
    """Attach a fresh microbatch-metrics listener. Listeners are
    SESSION-wide: pair every attach with :func:`detach_streaming_metrics`
    when the monitored run ends, or repeated runs accumulate listeners
    (N-fold recording) and a long-lived stream retains every progress
    dict forever (r8 review)."""
    listener = MicrobatchMetricsListener()
    spark.streams.addListener(listener)
    return listener


def detach_streaming_metrics(
    spark: SparkSession, listener: MicrobatchMetricsListener
) -> None:
    """Remove a listener attached by :func:`attach_streaming_metrics`."""
    spark.streams.removeListener(listener)


# ---------------------------------------------------------------------------
# B14: structured (JSON-lines) logging
# ---------------------------------------------------------------------------

class JsonLineFormatter(logging.Formatter):
    """One JSON object per log record; extra dict fields pass through
    via ``logger.info("msg", extra={"event": {...}})``."""

    def format(self, record: logging.LogRecord) -> str:
        payload: dict[str, Any] = {
            "ts": round(record.created, 3),
            "level": record.levelname,
            "logger": record.name,
            "msg": record.getMessage(),
        }
        event = getattr(record, "event", None)
        if isinstance(event, dict):
            payload.update(event)
        return json.dumps(payload, default=str)


def get_logger(name: str = "ddb_zero_etl", run_id: str | None = None) -> logging.Logger:
    """Structured logger, one stream handler with the JSON formatter.
    ``run_id`` scopes a child logger per pipeline run — the analog of
    the reference's log stream per run (ts:125-128). The JSON handler
    attaches to the NAMED base logger (a custom name previously fell
    through to the hardcoded 'ddb_zero_etl' base and emitted nothing
    in JSON form — r8 review), and propagation stops at the base so
    an application root handler does not double-emit every record."""
    logger = logging.getLogger(name if run_id is None else f"{name}.{run_id}")
    base = logging.getLogger(name)
    if not base.handlers:
        h = logging.StreamHandler()
        h.setFormatter(JsonLineFormatter())
        base.addHandler(h)
        base.setLevel(logging.INFO)
        base.propagate = False
    return logger
