"""Watermark state table for incremental pipelines.

Reference semantics (sql_search_incremental_dag.py:118-140): the
incremental lower bound is the last indexed modified-time fetched from
the downstream service, shifted to local time minus a 1-hour overlap
window (late rows get reprocessed; the idempotent MERGE sink absorbs
the duplicates); a missing watermark falls back to now − 1 day.

Here the state lives in a VersionedTable keyed by pipeline name, so
watermark advances are themselves versioned and restorable.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import SparkSession

from .table import VersionedTable

_SCHEMA = "pipeline string, last_modified timestamp"


class WatermarkStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.table = VersionedTable(spark, root)

    def get(self, pipeline: str) -> datetime | None:
        if not self.table.exists():
            return None
        from pyspark.sql import functions as F

        # column expression, not an interpolated SQL string: a pipeline
        # name containing a quote must select nothing, not break parsing
        rows = (
            self.table.read()
            .where(F.col("pipeline") == F.lit(pipeline))
            .select("last_modified")
            .collect()
        )
        return rows[0]["last_modified"] if rows else None

    def lower_bound(
        self,
        pipeline: str,
        overlap: timedelta = timedelta(hours=1),
        fallback: timedelta = timedelta(days=1),
        now: datetime | None = None,
    ) -> datetime:
        """Watermark − overlap, or now − fallback when absent (ST3)."""
        now = now or datetime.now()
        wm = self.get(pipeline)
        return (wm - overlap) if wm is not None else (now - fallback)

    def advance(self, pipeline: str, ts: datetime) -> None:
        """Monotonic advance: never move a watermark backwards."""
        current = self.get(pipeline)
        if current is not None and ts <= current:
            return
        updated = self.spark.createDataFrame([(pipeline, ts)], _SCHEMA)
        self.table.merge(updated, keys=["pipeline"], when_matched="update")
