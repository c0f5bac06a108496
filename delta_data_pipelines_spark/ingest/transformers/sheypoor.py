"""sheypoor raw payload → canonical listing.

Reference: sheypoor_transformer.py:103-298. Input schema: FIXTURES.md
B3 ``raw_sheypoor``. Price labels dispatch to rent/credit/price roles
(sheypoor_transformer.py:169-183); rent_type derives from which of
credit/rent are present (:213-218).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ... import functions as fn
from ..registry import conform


def _price_for(labels: tuple[str, ...]) -> Column:
    """Amount of the first price entry whose label contains any of the
    given keywords (label dispatch, sheypoor_transformer.py:169-183)."""
    prices = F.col("data.attributes.price")
    hit = F.try_element_at(
        F.filter(
            prices,
            lambda p: F.aggregate(
                F.array(*[p["label"].contains(k) for k in labels]),
                F.lit(False),
                lambda acc, x: acc | x,
            ),
        ),
        F.lit(1),
    )
    return fn.parse_price(hit["amount"])


def transform(raw: DataFrame, now: Column | None = None) -> DataFrame:
    if now is None:
        now = F.current_timestamp()

    attrs = F.col("data.attributes")
    rent = _price_for(("اجاره",))
    credit = _price_for(("ودیعه", "رهن"))
    price = _price_for(("قیمت",))

    # fullAttributes key/value list → map for feature lookups
    fa = F.map_from_entries(
        F.transform(
            F.col("data.fullAttributes"), lambda kv: F.struct(kv["key"], kv["value"])
        )
    )

    produced: dict[str, Column] = {
        "content_url": F.col("content_url"),
        "created_at": now,
        # categories[last] → cat3 slug; [first] → cat2
        "cat2_slug": fn.to_slug(F.try_element_at(attrs["categories"], F.lit(1))["name"]),
        "cat3_slug": fn.to_slug(F.try_element_at(attrs["categories"], F.lit(-1))["name"]),
        # "city، neighborhood" split (sheypoor_transformer.py:144-149)
        "city_slug": fn.to_slug(fn.split_location(attrs["location"], 0)),
        "neighborhood_slug": fn.to_slug(fn.split_location(attrs["location"], 1)),
        "created_at_month": fn.text_to_date(
            attrs["timePassedLabel"], now=now, variant="sheypoor"
        ),
        "title": attrs["title"],
        "description": F.col("data.description"),
        "rent_value": rent,
        "credit_value": credit,
        "price_value": price.cast("long"),
        "rent_type": fn.rent_type(credit, rent),
        "building_size": fn.parse_price(fa[F.lit("متراژ")]),
        "rooms_count": fn.normalize_rooms(
            F.coalesce(fa[F.lit("تعداد اتاق")], F.lit(""))
        ).try_cast("int"),
        "location_latitude": F.col("data.geo.lat"),
        "location_longitude": F.col("data.geo.lon"),
        "image": F.col("data.attributes.images.thumbnails.round"),
        "status": F.lit("active"),
    }
    return conform(raw, produced, source="sheypoor")
