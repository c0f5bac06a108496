"""divar raw payload → canonical listing.

Reference: divar_transformer.py:89-637 — deep dict navigation over the
``sections[].widgets[]`` payload. Input schema: FIXTURES.md B3
``raw_divar`` (content_url string, data struct<...>). All navigation is
native struct access + higher-order array functions; no Python row
loop (the reference iterates ``for item in fetched_data``,
divar_transformer.py:11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ... import functions as fn
from ..registry import conform

USER_TYPE_MAP = {"personal": "شخصی", "premium-panel": "مشاور املاک"}


def _section(name: str) -> Column:
    """First section with the given name (divar_transformer.py:124-127)."""
    return F.try_element_at(
        F.filter(F.col("data.sections"), lambda s: s["section_name"] == name), F.lit(1)
    )


def transform(raw: DataFrame, now: Column | None = None) -> DataFrame:
    if now is None:
        now = F.current_timestamp()

    title_widgets = _section("TITLE")["widgets"]
    legend = F.try_element_at(
        F.filter(title_widgets, lambda w: w["widget_type"] == "LEGEND_TITLE_ROW"),
        F.lit(1),
    )["data"]
    # publish time: subtitle "X در Y" → X → text_to_date (F10 + F9,
    # divar_transformer.py:58-87)
    publish_txt = F.split(legend["subtitle"], " در ")[0]

    list_widgets = _section("LIST_DATA")["widgets"]
    # UNEXPANDABLE_ROW widgets → title→value map (divar_transformer.py:266-298)
    info = fn.widgets_to_map(list_widgets)

    seo = F.col("data.seo.post_seo_schema")
    map_widget = F.try_element_at(
        F.filter(
            _section("MAP")["widgets"], lambda w: w["data"]["location"].isNotNull()
        ),
        F.lit(1),
    )["data"]["location"]
    # geo fallback chain seo → fuzzy point → exact (divar_transformer.py:563-594)
    lat = F.coalesce(
        seo["geo"]["latitude"],
        map_widget["fuzzy_data"]["point"]["latitude"],
        map_widget["exact_data"]["latitude"],
    )
    lon = F.coalesce(
        seo["geo"]["longitude"],
        map_widget["fuzzy_data"]["point"]["longitude"],
        map_widget["exact_data"]["longitude"],
    )

    floor_txt = info[F.lit("طبقه")]

    produced: dict[str, Column] = {
        "content_url": F.col("content_url"),
        "created_at": now,
        "cat2_slug": F.col("data.analytics.cat2"),
        "cat3_slug": F.col("data.analytics.cat3"),
        # city: analytics.city, else city.second_slug (divar_transformer.py:95-98)
        "city_slug": F.coalesce(F.col("data.analytics.city"), F.col("data.city.second_slug")),
        "neighborhood_slug": F.col("data.webengage.district"),
        "created_at_month": fn.text_to_date(publish_txt, now=now, variant="divar"),
        "user_type": fn.map_enum(F.col("data.webengage.business_type"), USER_TYPE_MAP),
        "title": F.col("data.share.title"),
        "description": seo["description"],
        "rent_value": F.col("data.webengage.rent"),
        "credit_value": F.col("data.webengage.credit"),
        # price: LIST_DATA widget titled "قیمت کل" (divar_transformer.py:153-161)
        "price_value": fn.parse_price(info[F.lit("قیمت کل")]).cast("long"),
        "price_mode": fn.price_mode_from_title(F.coalesce(info[F.lit("قیمت کل")], F.lit(""))),
        "building_size": fn.parse_price(info[F.lit("متراژ")]),
        "rooms_count": fn.normalize_rooms(info[F.lit("اتاق")]).try_cast("int"),
        # floor "X از Y" (divar_transformer.py:349-357,377-391)
        "floor": fn.floor_of(floor_txt),
        "total_floors_count": fn.total_floors_of(floor_txt),
        "construction_year": fn.normalize_construction_year(info[F.lit("ساخت")]),
        "location_latitude": lat,
        "location_longitude": lon,
        "location_radius": map_widget["fuzzy_data"]["radius"],
        # ordered image dedup (divar_transformer.py:595-609)
        "images": F.array_distinct(seo["image"]),
        "status": F.lit("active"),
    }
    return conform(raw, produced, source="divar")
