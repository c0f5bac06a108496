"""Price-prediction dataset pipeline (SURVEY §3, 4th path).

Reference: ``dags/price_prediction/price_prediction_data_pipeline.py``
— mongoexport → chunked pandas filter (cat3_slug == 'apartment-sell',
construction_year −1370 → 1369, drop excluded columns :100-138) →
MinIO last-data/old-data rotation (:140-177) → validate (:179-195) →
rollback on downstream failure (:228-268).

Spark shape: one declarative filter+clean query; rotation, validation
and rollback collapse onto the versioned table's commit log (restore =
``RESTORE TABLE``), replacing ~130 lines of object juggling.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import VersionedTable

# mongoexport exclusion list analog (price_prediction_data_pipeline.py:57-64):
# drop free-text + bookkeeping columns from the ML export.
EXCLUDED_COLUMNS = ("title", "description", "images")


def build_price_dataset(
    listings: DataFrame,
    category: str = "apartment-sell",
) -> DataFrame:
    """Filter + clean pass over canonical listings.

    - keep one category (P9: chunk filter :118)
    - construction_year −1370 → 1369 (F28 follow-up fix :120-121)
    - drop excluded free-text columns (S10 fieldFile exclusion)
    - require a usable target: price_value present and > 0
      (empty-result guard :135-138 becomes a row-level predicate)
    """
    keep = [c for c in listings.columns if c not in EXCLUDED_COLUMNS]
    return (
        listings.select(*keep)
        .where(F.col("cat3_slug") == category)
        .where(F.col("price_value").isNotNull() & (F.col("price_value") > 0))
        .withColumn(
            "construction_year",
            F.when(F.col("construction_year") == -1370, F.lit(1369)).otherwise(
                F.col("construction_year")
            ),
        )
    )


def default_validator(df: DataFrame) -> bool:
    """Upload validation analog (:179-195): dataset exists & nonempty."""
    return not df.isEmpty()


def publish_dataset(
    table: VersionedTable,
    dataset: DataFrame,
    validator: Callable[[DataFrame], bool] = default_validator,
    downstream: Callable[[DataFrame], None] | None = None,
) -> dict:
    """Versioned publish with automatic rollback.

    Commits the new dataset, runs the validator and the downstream
    consumer (model retrain + sanity predict in the reference); any
    failure restores the previous version — the engine's form of
    "delete new object, move old-data back" (:228-268).
    """
    prev = table.latest_version()
    commit = table.overwrite(dataset)
    try:
        if not validator(table.read()):
            raise ValueError("dataset validation failed")
        if downstream is not None:
            downstream(table.read())
    except Exception:
        if prev is not None:
            table.restore(prev)
        else:
            # first publish failed: leave an explicit empty rollback state
            table.overwrite(dataset.limit(0))
        raise
    return {"version": commit.version, "rows": commit.metrics["rows"]}
