"""mrestate raw payload → canonical listing.

Reference: mrestate_transformer.py:29-213. Input schema: FIXTURES.md
B3 ``raw_mrestate`` (Next.js pageProps envelope). Rent/sell/mortgage
prices map to rent/price/credit roles (:105-120); breadcrumb join with
"\\n/\\n" (:189-193); relative media URLs absolutized (:182-184).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ... import functions as fn
from ..registry import conform

MEDIA_BASE = "https://mrestate.example"  # placeholder host for relative /media URLs


def transform(raw: DataFrame, now: Column | None = None) -> DataFrame:
    if now is None:
        now = F.current_timestamp()

    d = F.col("data.pageProps.data.data")
    more = d["more_details"]

    produced: dict[str, Column] = {
        "content_url": F.col("content_url"),
        "created_at": now,
        "city_slug": fn.to_slug(d["city"]),
        "neighborhood_slug": fn.to_slug(d["neighbourhood"]),
        # "N روز پیش" relative publish text (mrestate via F9)
        "created_at_month": fn.text_to_date(d["date_publish"], now=now, variant="divar"),
        # is_owner → شخصی else agency (mrestate_transformer.py creator logic)
        "user_type": F.when(d["is_owner"], F.lit("شخصی")).otherwise(
            F.coalesce(
                d["creator_properties"]["real_estate"],
                d["creator_properties"]["consultant"],
                F.lit("مشاور املاک"),
            )
        ),
        "title": d["title"],
        "description": d["more_description"],
        "rent_value": d["price_rent"].cast("double"),
        "price_value": d["price_sell"],
        "credit_value": d["price_mortgage"].cast("double"),
        "rent_type": fn.rent_type(
            d["price_mortgage"].cast("double"), d["price_rent"].cast("double")
        ),
        "building_size": d["area"],
        "rooms_count": d["num_bedrooms"],
        "construction_year": d["year_constructed"],
        "floor": more["floor"],
        "has_balcony": more["balcony"],
        "has_elevator": more["elevator"],
        "has_warehouse": more["storeHouse"],
        # parking count "N" → N > 0 (mrestate_transformer.py:144-145)
        "has_parking": more["parking"] > 0,
        "has_security_guard": more["security"],
        "has_pool": more["pool"],
        "has_jacuzzi": more["jacuzzi"],
        "has_sauna": more["sauna"],
        "location_latitude": d["latitude"],
        "location_longitude": d["longitude"],
        "images": F.transform(
            d["list_image"],
            lambda i: fn.relative_to_absolute_url(i["url"], MEDIA_BASE),
        ),
        # breadcrumb names joined (mrestate_transformer.py:189-193)
        "bread_crumb": F.array_join(
            F.transform(F.col("data.pageProps.data.breadcrumb"), lambda b: b["name"]),
            "\n/\n",
        ),
        "status": F.lit("active"),
    }
    return conform(raw, produced, source="mrestate")
