"""Temporal-join queries over the events table.

as-of: for each 'click' event, the most recent 'error' value by the
same user at or before it (DuckDB checks with its native ASOF JOIN).
range: click→error within 10 minutes after, per user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table
from ..operators.temporal import asof_join, range_join


def _sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    e = read_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    # unique (user_id, ts) on the right side: keep the max-value error
    # so the as-of match is deterministic in both engines
    errors = (
        e.where(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("err_value"))
    )
    return clicks, errors


def t_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    clicks, errors = _sides(spark, sf_dir)
    out = asof_join(
        clicks, errors, key="user_id", ts="ts", payload_cols=["err_value"]
    )
    return out.select("event_id", "user_id", "ts", "err_value", "matched_ts")


def t_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    clicks, errors = _sides(spark, sf_dir)
    out = asof_join(
        clicks,
        errors,
        key="user_id",
        ts="ts",
        payload_cols=["err_value"],
        tolerance_seconds=3600,
    )
    return out.select("event_id", "user_id", "ts", "err_value", "matched_ts")


def t_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    clicks, errors = _sides(spark, sf_dir)
    joined = range_join(
        clicks,
        errors.withColumnRenamed("ts", "err_ts"),
        key="user_id",
        left_ts="ts",
        right_ts="err_ts",
        lower_seconds=0,
        upper_seconds=600,
    )
    return joined.select("event_id", "user_id", "ts", "err_ts", "err_value")


def t_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build from the purchase change log: one
    validity interval per (user, ts) state, closed by the next change
    (null valid_to = current row). The dimension the as-of joins and
    point-in-time snapshots consume."""
    from ..operators.temporal import scd2_intervals

    e = read_table(spark, sf_dir, "events")
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    out = scd2_intervals(purchases, "user_id", "ts", ["value"])
    return out.select(
        "user_id", "value", "valid_from", "valid_to", "is_current"
    )


SPARK_QUERIES = {
    "t_asof_join": t_asof_join,
    "t_asof_join_tolerance": t_asof_join_tolerance,
    "t_range_join": t_range_join,
    "t_scd2_intervals": t_scd2_intervals,
}

_ERRORS = """
    SELECT user_id, ts, MAX(value) AS err_value
    FROM events WHERE event_type = 'error' GROUP BY user_id, ts
"""

ORACLE_SQL = {
    "t_asof_join": f"""
        WITH clicks AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'click'
        ), errors AS ({_ERRORS})
        SELECT c.event_id, c.user_id, c.ts, e.err_value, e.ts AS matched_ts
        FROM clicks c ASOF LEFT JOIN errors e
          ON c.user_id = e.user_id AND c.ts >= e.ts
    """,
    "t_asof_join_tolerance": f"""
        WITH clicks AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'click'
        ), errors AS ({_ERRORS})
        SELECT c.event_id, c.user_id, c.ts,
               CASE WHEN e.ts >= c.ts - INTERVAL '3600 seconds'
                    THEN e.err_value END AS err_value,
               CASE WHEN e.ts >= c.ts - INTERVAL '3600 seconds'
                    THEN e.ts END AS matched_ts
        FROM clicks c ASOF LEFT JOIN errors e
          ON c.user_id = e.user_id AND c.ts >= e.ts
    """,
    "t_range_join": f"""
        WITH clicks AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'click'
        ), errors AS ({_ERRORS})
        SELECT c.event_id, c.user_id, c.ts, e.ts AS err_ts, e.err_value
        FROM clicks c JOIN errors e
          ON c.user_id = e.user_id
         AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL '600 seconds'
    """,
    "t_scd2_intervals": """
        WITH p AS (
            SELECT user_id, ts, MAX(value) AS value FROM events
            WHERE event_type = 'purchase' GROUP BY user_id, ts
        )
        SELECT user_id, value,
               ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   AS is_current
        FROM p
    """,
}
