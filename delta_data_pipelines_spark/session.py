"""SparkSession factory.

Tuned for the harness's local[32] single-JVM mode but with settings that
carry to a real multi-executor cluster: AQE on (runtime coalesce + skew
join), shuffle partitions sized to cores (overridable via env for a
1000-executor deployment), UTC session timezone so results compare
bit-for-bit with the DuckDB oracle, and Arrow enabled for the few
Pandas-UDF code paths (HTML parsing, multimodal decode).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # AQE: runtime re-planning — coalesces tiny post-shuffle partitions at
    # sf0.01 and splits skewed ones at 100 TB without code changes.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # DuckDB oracle compares UTC-naive timestamps; pin the session TZ.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for pandas_udf / mapInPandas / toPandas round-trips.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Keep the 10 MB default broadcast threshold; dims here are tiny and
    # at 100 TB the dims (region/nation/options) stay broadcast-sized.
    "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
    # Quieter local runs.
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(
    app_name: str = "delta_data_pipelines_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``SPARK_GRAFT_CPUS`` (harness contract) sizes both local parallelism
    and shuffle partitions; on a real cluster pass ``master=None`` with
    ``spark-submit`` managing the master URL and set
    ``shuffle_partitions`` to ~2-3x total executor cores.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    # local mode: driver is the only JVM; give it headroom if not set.
    if master.startswith("local") and "spark.driver.memory" not in (extra_conf or {}):
        conf.setdefault("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
