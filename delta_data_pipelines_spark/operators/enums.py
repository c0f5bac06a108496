"""Broadcast mapping-table enum resolution (F21 at scale).

The reference hard-codes ~10 dict maps of up to ~50 entries each
(map_divar_data_to_delta.py:69-155, divar_transformer.py:406-472).
Tiny maps inline fine as literal CREATE MAP expressions
(functions.text.map_enum); this module is the scale path — a mapping
DataFrame broadcast-joined so the map can be thousands of entries,
versioned, and loaded from a table instead of code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def mapping_table(
    spark: SparkSession, mapping: dict, key_type: str = "string", value_type: str = "string"
) -> DataFrame:
    """dict → (key, value) DataFrame (the in-code convenience; real
    deployments read the mapping from a versioned table)."""
    return spark.createDataFrame(
        list(mapping.items()), f"key {key_type}, value {value_type}"
    )


def enum_lookup(
    df: DataFrame,
    col: str,
    mapping: DataFrame,
    out_col: str | None = None,
    default=None,
    keep_unmapped: bool = False,
) -> DataFrame:
    """Resolve ``col`` through a broadcast-joined mapping table.

    - ``default``: value when the key is unmapped (else NULL)
    - ``keep_unmapped=True``: pass the original value through instead
      (the reference's ``d.get(k, k)`` pattern)
    """
    out_col = out_col or f"{col}_mapped"
    m = mapping.select(
        F.col("key").alias("_ek"), F.col("value").alias("_ev")
    )
    joined = df.join(F.broadcast(m), df[col] == F.col("_ek"), "left")
    if keep_unmapped:
        resolved = F.coalesce(F.col("_ev"), df[col].cast("string"))
    elif default is not None:
        resolved = F.coalesce(F.col("_ev"), F.lit(default))
    else:
        resolved = F.col("_ev")
    return joined.withColumn(out_col, resolved).drop("_ek", "_ev")
