"""Scalar-function queries (SURVEY §2.6 generic forms) — each exercises
a family of the F-operators on harness columns, with a DuckDB twin."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import read_table

# F1 family: character translation. The harness strings carry no
# Persian digits, so the generic form translates vowels — the operator
# under test is `translate`, not the alphabet.


def f_translate(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.translate(F.col("c_name"), "0123456789", "۰۱۲۳۴۵۶۷۸۹").alias("fa_name"),
        F.translate(
            F.translate(F.col("c_name"), "0123456789", "۰۱۲۳۴۵۶۷۸۹"),
            "۰۱۲۳۴۵۶۷۸۹",
            "0123456789",
        ).alias("roundtrip"),
    )


def f_regex_extract_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F6 — regex numeric extraction + cast (null on failure)."""
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract(F.col("c_name"), r"#(\d+)", 1).try_cast("long").alias("name_num"),
        F.regexp_replace(F.col("c_name"), r"[^0-9]", "").try_cast("double").alias("digits_only"),
    )


def f_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/F12/P4 — interval arithmetic, truncation, extraction."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 1 MONTH")).alias("plus_month"),
        (F.col("o_orderdate") - F.expr("INTERVAL 7 DAYS")).alias("minus_week"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
    )


def f_case_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13/F21 — when-chain bucketing (age→build-year shape)."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "premium")
        .when(F.col("o_totalprice") > 150000, "standard")
        .otherwise("budget")
        .alias("tier"),
    )


def f_json_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F33 — JSON-path extraction over the events props column."""
    e = read_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").try_cast("long").alias("k_value"),
    )


def f_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17/F18/F31 — trim/lower/slug/substring/concat family."""
    p = read_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace(F.trim(F.lower(F.col("p_name"))), r"\s+", "-").alias("slug"),
        F.substring(F.col("p_name"), -8, 8).alias("tail8"),
        F.concat(F.lit("https://parts.example/"), F.col("p_brand")).alias("url"),
    )


SPARK_QUERIES = {
    "f_translate": f_translate,
    "f_regex_extract_cast": f_regex_extract_cast,
    "f_date_arithmetic": f_date_arithmetic,
    "f_case_buckets": f_case_buckets,
    "f_json_navigation": f_json_navigation,
    "f_string_ops": f_string_ops,
}

ORACLE_SQL = {
    "f_translate": """
        SELECT c_custkey,
               translate(c_name, '0123456789', '۰۱۲۳۴۵۶۷۸۹') AS fa_name,
               translate(translate(c_name, '0123456789', '۰۱۲۳۴۵۶۷۸۹'),
                         '۰۱۲۳۴۵۶۷۸۹', '0123456789') AS roundtrip
        FROM customer
    """,
    "f_regex_extract_cast": """
        SELECT c_custkey,
               TRY_CAST(regexp_extract(c_name, '#(\\d+)', 1) AS BIGINT) AS name_num,
               TRY_CAST(regexp_replace(c_name, '[^0-9]', '', 'g') AS DOUBLE) AS digits_only
        FROM customer
    """,
    "f_date_arithmetic": """
        SELECT o_orderkey,
               o_orderdate + INTERVAL 1 MONTH AS plus_month,
               o_orderdate - INTERVAL 7 DAY AS minus_week,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(month(o_orderdate) AS INTEGER) AS mo
        FROM orders
    """,
    "f_case_buckets": """
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 300000 THEN 'premium'
                    WHEN o_totalprice > 150000 THEN 'standard'
                    ELSE 'budget' END AS tier
        FROM orders
    """,
    "f_json_navigation": """
        SELECT event_id,
               TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
        FROM events
    """,
    "f_string_ops": """
        SELECT p_partkey,
               regexp_replace(trim(lower(p_name)), '\\s+', '-', 'g') AS slug,
               CASE WHEN length(p_name) >= 8
                    THEN substring(p_name, length(p_name) - 7, 8)
                    ELSE p_name END AS tail8,
               concat('https://parts.example/', p_brand) AS url
        FROM part
    """,
}
