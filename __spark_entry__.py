"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query registry is assembled from the engine's query modules — each
module exposes SPARK_QUERIES / ORACLE_SQL dicts (see
delta_data_pipelines_spark/queries/__init__.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from delta_data_pipelines_spark.queries import search_index

    return search_index.search_index_full(spark, "/root/testdata/sf0.001")


def _modules():
    from delta_data_pipelines_spark.queries import (
        relational,
        scalar,
        search_index,
        streaming_q,
        temporal_q,
        tpch,
        training_data,
    )

    return [
        search_index,
        relational,
        training_data,
        scalar,
        streaming_q,
        tpch,
        temporal_q,
    ]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        out.update(mod.SPARK_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twins for each query (same column names)."""
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLE_SQL)
    return out
