"""Loaders for the harness test tables (TESTDATA.md).

Ten parquet tables per scale factor:
    region nation customer supplier part orders lineitem events
    documents embeddings

``load(spark, sf_dir)`` returns a dict of DataFrames; ``register`` also
creates temp views so pipelines can be written in Spark SQL. Reads are
plain ``spark.read.parquet`` — Catalyst pushes filters and prunes
columns into the scan, which is exactly what we want at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one harness table.

    ``events.parquet`` carries TIMESTAMP(NANOS). Depending on the Spark
    version this surfaces three ways, and we normalize all of them to a
    session-TZ ``TIMESTAMP`` (the session TZ is pinned UTC, so the
    values are identical to the micros DuckDB sees):

    * Spark ≥4.1 reads nanos natively as ``TIMESTAMP_NTZ`` — cast to
      ``timestamp`` (event-time watermarks reject NTZ).
    * older Spark rejects nanos unless ``nanosAsLong`` is set, yielding
      ``bigint`` — truncate to micros and rebuild the timestamp.
    * a build that already yields ``timestamp`` passes through.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        dtypes = dict(df.dtypes)
        if dtypes.get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif dtypes.get("ts") == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in names}


def register(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    dfs = load(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
