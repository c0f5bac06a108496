"""Tabular file sources (SURVEY §2.1 S10/S15).

CSV round-trips are Spark-native. Excel (S15 —
``map_divar_data_to_delta.py:50-52`` reads per-city xlsx dumps with
pandas) needs an engine library (openpyxl/xlrd) that is not in this
container, so the loader import-gates it: the Spark-side path
(pandas frame → createDataFrame with explicit schema) is real and
tested through the CSV/pandas entry points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """CSV source with explicit schema (inference is a full extra scan
    — never at scale); header expected, matching mongoexport output."""
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV export (↔ mongoexport S10). ``single_file`` coalesces to one
    part — only for small exports; the distributed default otherwise."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", "true").csv(path)


def pandas_to_spark(spark: SparkSession, pdf, schema: StructType | str | None = None) -> DataFrame:
    """pandas → Spark with optional explicit schema (the landing step
    shared by the Excel and any driver-side tabular source)."""
    if schema is not None:
        return spark.createDataFrame(pdf, schema=schema)
    return spark.createDataFrame(pdf)


def read_excel(
    spark: SparkSession,
    path: str,
    sheet_name: int | str = 0,
    schema: StructType | str | None = None,
) -> DataFrame:
    """S15 — Excel → Spark via pandas.

    Raises ImportError with guidance when no Excel engine is installed
    (this container has none); everything after ``pd.read_excel`` is
    the tested ``pandas_to_spark`` path.
    """
    import pandas as pd

    try:
        pdf = pd.read_excel(path, sheet_name=sheet_name)
    except ImportError as exc:  # openpyxl/xlrd missing
        raise ImportError(
            "read_excel needs an Excel engine (openpyxl); install one or "
            "convert the workbook to CSV and use read_csv"
        ) from exc
    return pandas_to_spark(spark, pdf, schema)
