"""Streaming-semantics queries, batch twins (SURVEY §2.9).

The streaming pipeline's windowed aggregate (streaming.pipeline.
windowed_event_counts) is one expression usable in both batch and
streaming mode; the batch run is what the oracle checks — tumbling
windows reduce to time_bucket in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import read_table
from ..streaming.pipeline import windowed_event_counts


def st_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return windowed_event_counts(e, window="5 minutes", watermark="10 minutes")


SPARK_QUERIES = {"st_windowed_counts": st_windowed_counts}

ORACLE_SQL = {
    "st_windowed_counts": """
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
               event_type,
               COUNT(*) AS n,
               ROUND(SUM(value), 6) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
}
