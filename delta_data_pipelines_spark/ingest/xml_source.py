"""XML payload parsing (SURVEY §2.1 S3 / §2.6 F36).

Reference: ``kilid_crawler.py:13-33`` — the kilid search API sometimes
answers XML instead of JSON; an ElementTree fallback walks
``.//result`` elements into id/listingType/propertyType/landuseType
dicts.

Spark 4 ships ``from_xml`` natively, so the fallback is a column
expression: parse the envelope into an array of result structs and
explode — no Python, codegen-friendly, and the same shape the JSON
path produces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RESULT_SCHEMA = (
    "STRUCT<result: ARRAY<STRUCT<id: STRING, listingType: STRING, "
    "propertyType: STRING, landuseType: STRING>>>"
)


def parse_results_xml(xml: Column | str) -> Column:
    """XML envelope string → array<struct> of result records."""
    c = F.col(xml) if isinstance(xml, str) else xml
    return F.from_xml(c, RESULT_SCHEMA)["result"]


def xml_results_to_rows(df: DataFrame, xml_col: str = "xml_body") -> DataFrame:
    """One row per ``<result>`` element, keeping all other columns.

    Unparseable XML yields a NULL struct → zero rows for that payload
    (the reference's try/except-continue, kilid_crawler.py:29-33).
    """
    others = [c for c in df.columns if c != xml_col]
    return (
        df.select(*others, F.explode(parse_results_xml(xml_col)).alias("r"))
        .select(
            *others,
            F.col("r.id").alias("listing_id"),
            F.col("r.listingType").alias("listing_type"),
            F.col("r.propertyType").alias("property_type"),
            F.col("r.landuseType").alias("landuse_type"),
        )
    )
