"""Streaming-semantics queries, batch twins (SURVEY §2.9).

Every streaming operator here is ONE expression usable in both batch
and streaming mode (the streaming runs are exercised in
tests/test_streaming.py); the batch run is what the oracle checks:

    tumbling window  → time_bucket
    sliding window   → time_bucket × unnested slide offsets
    session window   → gaps-and-islands (lag + running sum)
    stream dedup     → DISTINCT ON key
    stateful totals  → plain GROUP BY (the state's fixed point)
    interval join    → plain SQL interval join (stream-stream in
                       streaming mode, state bounded by the watermark)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import read_table
from pyspark.sql import functions as F

from ..streaming.pipeline import (
    dedup_events,
    session_event_stats,
    sliding_event_counts,
    stream_interval_join,
    windowed_event_counts,
)
from ..streaming.stateful import running_user_totals_batch


def st_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return windowed_event_counts(e, window="5 minutes", watermark="10 minutes")


def st_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return sliding_event_counts(e, window="10 minutes", slide="5 minutes")


def st_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return session_event_stats(e, gap="10 minutes")


def st_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return dedup_events(e, keys=["event_id"]).select("event_id", "user_id", "event_type")


def st_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→click attribution: clicks by the same user within 10
    minutes after a view — the stream-stream interval join's batch
    twin (the streaming run is exercised in tests/test_streaming.py).
    """
    e = read_table(spark, sf_dir, "events")
    views = e.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("view_ts")
    )
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    return stream_interval_join(
        views, clicks, key="user_id", left_ts="view_ts", right_ts="click_ts",
        upper_seconds=600,
    ).select("view_id", "user_id", "view_ts", "click_id", "click_ts")


def st_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return running_user_totals_batch(e)


SPARK_QUERIES = {
    "st_windowed_counts": st_windowed_counts,
    "st_sliding_counts": st_sliding_counts,
    "st_session_windows": st_session_windows,
    "st_dedup": st_dedup,
    "st_interval_join": st_interval_join,
    "st_running_totals": st_running_totals,
}

ORACLE_SQL = {
    "st_windowed_counts": """
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
               event_type,
               COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(20,6))), 6) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    # every event belongs to the slide-bucket window and the one before
    "st_sliding_counts": """
        SELECT time_bucket(INTERVAL '5 minutes', ts) - to_minutes(5 * k) AS window_start,
               event_type,
               COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(20,6))), 6) AS DOUBLE) AS total_value
        FROM events CROSS JOIN (VALUES (0), (1)) offs(k)
        GROUP BY 1, 2
    """,
    "st_session_windows": """
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w > INTERVAL '10 minutes'
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sess AS (
            SELECT user_id, ts, value,
                   SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM flagged
        )
        SELECT MIN(ts) AS session_start, user_id,
               COUNT(*) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(20,6))), 6) AS DOUBLE) AS total_value
        FROM sess GROUP BY user_id, sid
    """,
    "st_dedup": """
        SELECT event_id, user_id, event_type FROM (
            SELECT event_id, user_id, event_type,
                   ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts) rn
            FROM events
        ) WHERE rn = 1
    """,
    "st_running_totals": """
        SELECT user_id, COUNT(*) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(20,6))), 6) AS DOUBLE) AS total_value
        FROM events GROUP BY user_id
    """,
    "st_interval_join": """
        SELECT v.event_id AS view_id, v.user_id, v.ts AS view_ts,
               c.event_id AS click_id, c.ts AS click_ts
        FROM events v JOIN events c
          ON v.user_id = c.user_id
         AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL '10 minutes'
        WHERE v.event_type = 'view' AND c.event_type = 'click'
    """,
}
