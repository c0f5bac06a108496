"""Streaming observability — per-batch progress collection via
``StreamingQueryListener``.

The production numbers an operator watches on a continuously-ingesting
pipeline, captured WITHOUT touching the query plan (the listener rides
the engine's own progress events, so it costs the hot path nothing):

- ``num_input_rows`` per micro-batch (throughput / starvation);
- ``dropped_by_watermark`` (late data silently discarded by a
  watermarked stateful operator — the number that explains "rows went
  in but never came out");
- ``state_rows`` (total stateful-operator state size — unbounded
  growth here is the classic leak of a missing watermark);
- batch duration.

The reference's Airflow DAGs get these numbers from the scheduler UI;
a Structured Streaming deployment gets them from query progress, and
this module makes them a plain list of dicts a job can assert on, log,
or append to a metrics table.

Events are delivered asynchronously on the listener bus — a batch's
entry appears shortly after the batch commits, so tests and callers
that need to observe a specific batch should poll (``wait_for``).
"""

from __future__ import annotations

import json
import time

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

__all__ = ["ProgressLog"]


class ProgressLog(StreamingQueryListener):
    """Collects one dict per micro-batch into ``self.batches``.

    Usage::

        log = ProgressLog().attach(spark)
        try:
            ...run the stream...
            log.wait_for(lambda b: len(b) >= 3)
        finally:
            log.detach(spark)

    Entries: ``{"query_id", "batch_id", "num_input_rows",
    "dropped_by_watermark", "state_rows", "duration_ms"}``. Parsed
    from the progress event's JSON form — the stable cross-version
    surface (typed accessors moved between Spark releases).
    """

    def __init__(self) -> None:
        self.batches: list[dict] = []

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        state = p.get("stateOperators") or []
        self.batches.append(
            {
                "query_id": p.get("id"),
                "batch_id": p.get("batchId"),
                "num_input_rows": int(p.get("numInputRows") or 0),
                "dropped_by_watermark": sum(
                    int(op.get("numRowsDroppedByWatermark") or 0)
                    for op in state
                ),
                "state_rows": sum(
                    int(op.get("numRowsTotal") or 0) for op in state
                ),
                "duration_ms": (p.get("durationMs") or {}).get("triggerExecution"),
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- lifecycle ----------------------------------------------------------
    def attach(self, spark: SparkSession) -> "ProgressLog":
        spark.streams.addListener(self)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)

    def wait_for(self, predicate, timeout_s: float = 60.0) -> bool:
        """Poll until ``predicate(self.batches)`` is true (events arrive
        asynchronously after each batch commits). Returns False on
        timeout instead of raising — the caller owns the assertion."""
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            if predicate(self.batches):
                return True
            time.sleep(0.2)
        return bool(predicate(self.batches))
