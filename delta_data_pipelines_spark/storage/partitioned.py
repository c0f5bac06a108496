"""Hive-partitioned dataset layout (the scan-side scale lever).

The reference never partitions storage (MongoDB + SQL Server own the
layout); at 100 TB the physical layout IS the query plan: a dataset
partitioned by a low-cardinality time/category key turns time-window
predicates into directory pruning — the scan never opens irrelevant
files (PartitionFilters in the plan, vs PushedFilters which still
reads footers).

Guidance encoded here:
  - partition on a derived low-cardinality column (a DAY, not a raw
    timestamp: one directory per distinct value);
  - aim for 100 MB-1 GB per partition file at scale — repartition by
    the partition key before the write so each directory gets few,
    large files instead of one shard per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_by_day(
    df: DataFrame, path: str, ts_col: str, mode: str = "overwrite"
) -> None:
    """Write parquet partitioned by the DAY of ``ts_col``."""
    out = df.withColumn("p_date", F.to_date(F.col(ts_col)))
    out.repartition("p_date").write.mode(mode).partitionBy("p_date").parquet(path)


def read_day_range(
    spark: SparkSession, path: str, start_date: str, end_date: str
) -> DataFrame:
    """Read only the partitions inside [start_date, end_date] — the
    filter lands in PartitionFilters (directory pruning), asserted in
    tests/test_plans.py."""
    return spark.read.parquet(path).where(
        (F.col("p_date") >= F.lit(start_date)) & (F.col("p_date") <= F.lit(end_date))
    )
