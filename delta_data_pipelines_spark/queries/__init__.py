"""End-to-end query pipelines.

Each module exposes:
    SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
    ORACLE_SQL:    dict[str, str]   (DuckDB-runnable ANSI SQL twins)

``__spark_entry__.py`` aggregates these into the driver contract.
"""
