"""JDBC SQL source (SURVEY §2.1 S13).

The reference reads its star schema from SQL Server with pymssql and a
hand-written query string (utils_of_searchengine.py:25-48). The Spark
replacement is ``spark.read.jdbc`` with the options that make the read
scale:

- **pushdown**: pass ``query`` (or a ``(SELECT ...) src`` dbtable
  subquery) so filtering/projection happens in the database, and only
  the needed rows cross the wire;
- **parallel partitioned reads**: ``partition_column`` +
  ``lower/upper_bound`` + ``num_partitions`` make every executor pull
  its own key-range slice instead of one task draining the whole
  table;
- **fetchsize** controls the per-round-trip row count (JDBC drivers
  default absurdly low, e.g. 10 for Oracle).

No database server ships in this container, so ``build_jdbc_options``
is a pure function contract-tested in tests/test_ingest.py; at a real
deployment ``read_jdbc`` is the one-liner over it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def build_jdbc_options(
    url: str,
    table: str | None = None,
    query: str | None = None,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Assemble the options dict for ``spark.read.format("jdbc")``.

    Exactly one of ``table`` / ``query`` is required. ``query`` is the
    full-pushdown path (the reference's hand-written SELECT belongs
    here verbatim); ``table`` may itself be a ``(SELECT ...) src``
    subquery for projection pushdown with partitioned reads (Spark
    forbids combining ``query`` with ``partitionColumn``).
    """
    if (table is None) == (query is None):
        raise ValueError("exactly one of table/query is required")
    if query is not None and partition_column is not None:
        raise ValueError(
            "partition_column requires table=, not query= "
            "(wrap the query as table='(SELECT ...) src')"
        )
    opts: dict[str, str] = {"url": url, "fetchsize": str(fetchsize)}
    if table is not None:
        opts["dbtable"] = table
    if query is not None:
        opts["query"] = query
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if driver is not None:
        opts["driver"] = driver
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and num_partitions"
            )
        opts["partitionColumn"] = partition_column
        opts["lowerBound"] = str(lower_bound)
        opts["upperBound"] = str(upper_bound)
        opts["numPartitions"] = str(num_partitions)
    opts.update(extra or {})
    return opts


def read_jdbc(spark: SparkSession, **kwargs) -> DataFrame:
    """``spark.read`` over :func:`build_jdbc_options` (same keywords)."""
    return spark.read.format("jdbc").options(**build_jdbc_options(**kwargs)).load()
