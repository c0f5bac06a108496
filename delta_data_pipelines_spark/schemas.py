"""Canonical schemas.

The reference enforces its ~60-field canonical listing document purely
by convention — every site transformer emits every field, None when
absent (sheypoor "FINAL REQUIRED COLUMN ORDER"
sheypoor_transformer.py:232-298; divar null-init
divar_transformer.py:110-123,254-265,496-497,557-562). Here the shape
is an explicit StructType and transformers are *required* to produce
exactly these columns (ingest.registry.conform enforces it).
"""

from __future__ import annotations

from pyspark.sql import types as T

# (name, type) in the reference's canonical column order (FIXTURES.md B1)
_L = [
    ("content_url", T.StringType()),
    ("created_at", T.TimestampType()),
    ("cat1_slug", T.StringType()),
    ("cat2_slug", T.StringType()),
    ("cat3_slug", T.StringType()),
    ("city_slug", T.StringType()),
    ("neighborhood_slug", T.StringType()),
    ("created_at_month", T.TimestampType()),
    ("user_type", T.StringType()),
    ("title", T.StringType()),
    ("description", T.StringType()),
    ("rent_mode", T.StringType()),
    ("rent_type", T.StringType()),
    ("credit_mode", T.StringType()),
    ("price_mode", T.StringType()),
    ("rent_to_single", T.StringType()),
    ("price_value", T.LongType()),
    ("rent_value", T.DoubleType()),
    ("credit_value", T.DoubleType()),
    ("rent_credit_transform", T.BooleanType()),
    ("transformable_price", T.BooleanType()),
    ("transformable_credit", T.BooleanType()),
    ("transformable_rent", T.BooleanType()),
    ("transformed_credit", T.DoubleType()),
    ("transformed_rent", T.DoubleType()),
    ("land_size", T.DoubleType()),
    ("building_size", T.DoubleType()),
    ("deed_type", T.StringType()),
    ("has_business_deed", T.BooleanType()),
    ("floor", T.IntegerType()),
    ("rooms_count", T.IntegerType()),
    ("total_floors_count", T.IntegerType()),
    ("unit_per_floor", T.IntegerType()),
    ("has_balcony", T.BooleanType()),
    ("has_elevator", T.BooleanType()),
    ("has_warehouse", T.BooleanType()),
    ("has_parking", T.BooleanType()),
    ("construction_year", T.IntegerType()),
    ("is_rebuilt", T.BooleanType()),
    ("has_water", T.BooleanType()),
    ("has_electricity", T.BooleanType()),
    ("has_gas", T.BooleanType()),
    ("has_security_guard", T.BooleanType()),
    ("has_barbecue", T.BooleanType()),
    ("has_pool", T.BooleanType()),
    ("has_jacuzzi", T.BooleanType()),
    ("has_sauna", T.BooleanType()),
    ("has_warm_water_provider", T.StringType()),
    ("has_cooling_system", T.StringType()),
    ("has_heating_system", T.StringType()),
    ("has_restroom", T.StringType()),
    ("building_direction", T.StringType()),
    ("floor_material", T.StringType()),
    ("property_type", T.StringType()),
    ("regular_person_capacity", T.IntegerType()),
    ("extra_person_capacity", T.IntegerType()),
    ("cost_per_extra_person", T.DoubleType()),
    ("rent_price_on_regular_days", T.DoubleType()),
    ("rent_price_on_special_days", T.DoubleType()),
    ("rent_price_at_weekends", T.DoubleType()),
    ("location_latitude", T.DoubleType()),
    ("location_longitude", T.DoubleType()),
    ("location_radius", T.DoubleType()),
    ("images", T.ArrayType(T.StringType())),
    ("image", T.StringType()),
    ("bread_crumb", T.StringType()),
    ("breadcrumbs", T.StringType()),
    ("source", T.StringType()),
    ("status", T.StringType()),
]

LISTING_COLUMNS: list[str] = [n for n, _ in _L]
LISTING_SCHEMA = T.StructType([T.StructField(n, t, True) for n, t in _L])
LISTING_TYPES: dict[str, T.DataType] = dict(_L)

# URL work-queue message (↔ RabbitMQ {"content_url": ...} + kilid extras,
# crawler_dag_factory.py:39 / kilid_crawler.py:234-241)
URL_QUEUE_SCHEMA = T.StructType(
    [
        T.StructField("content_url", T.StringType(), False),
        T.StructField("site", T.StringType(), True),
        T.StructField("listingType", T.StringType(), True),
        T.StructField("propertyType", T.StringType(), True),
        T.StructField("landuseType", T.StringType(), True),
        T.StructField("enqueued_at", T.TimestampType(), True),
    ]
)

# seen_urls membership table (exact replacement for per-site blooms)
SEEN_URLS_SCHEMA = T.StructType(
    [
        T.StructField("site", T.StringType(), False),
        T.StructField("content_url", T.StringType(), False),
    ]
)
