"""Incremental search-index job (SURVEY §3.3, hourly path, end to end).

Composes the pieces the reference spreads over four Airflow tasks
(sql_search_incremental_dag.py:205-229):

    get_time   → WatermarkStore.lower_bound (overlap-shifted, ST3)
    extract    → search_index_incremental(watermark)
    transform  → (inside the query: all scalar work is columnar)
    load       → idempotent MERGE upsert keyed on id (ST4)

then advances the watermark to the max modified_date actually indexed
— monotonic, so a failed run never loses ground and the 1-hour overlap
re-reads the boundary rows, which the MERGE absorbs.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import SparkSession

from ..queries.search_index import search_index_incremental
from ..storage import VersionedTable, WatermarkStore

PIPELINE = "search_index"


def run_incremental(
    spark: SparkSession,
    sf_dir: str,
    index: VersionedTable,
    watermarks: WatermarkStore,
    now: datetime | None = None,
    overlap: timedelta = timedelta(hours=1),
    fallback: timedelta = timedelta(days=365 * 50),
) -> dict:
    """One incremental run: returns merge metrics + the new watermark.

    ``fallback`` defaults very wide here because the harness data is
    historical; production uses the reference's 1 day.
    """
    lb = watermarks.lower_bound(
        PIPELINE, overlap=overlap, fallback=fallback, now=now
    )
    batch = search_index_incremental(
        spark, sf_dir, watermark=lb.strftime("%Y-%m-%d %H:%M:%S")
    )
    commit = index.merge(batch, keys=["id"], when_matched="update")

    max_row = batch.selectExpr("max(modified_date) AS m").first()
    if max_row and max_row["m"] is not None:
        watermarks.advance(PIPELINE, max_row["m"])
    return {
        "lower_bound": lb,
        "inserted": commit.metrics["inserted"],
        "updated": commit.metrics["updated"],
        "watermark": watermarks.get(PIPELINE),
    }
