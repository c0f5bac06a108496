"""kilid raw HTML → canonical listing.

Reference: kilid_transformer.py:187-367 parses detail-page HTML with
BeautifulSoup CSS selectors (≈180 LoC); kilid_fetcher.py:25-33 ships
``html_content`` + crawl metadata (listingType BUY/RENT, propertyType,
landuseType).

Spark mapping: the selector patterns the reference uses resolve to
regexes over well-formed fragments, so extraction stays native
(``regexp_extract`` / ``regexp_extract_all`` — codegen, no Python).
The positional label↔value pairing of price blocks
(``zip(label_blocks, price_rent_blocks)``, kilid_transformer.py:335,466)
is ``arrays_zip``. A BeautifulSoup ``mapInPandas`` path would drop in
here if page markup outgrew regexes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ... import functions as fn
from ..registry import conform


def _tag_text(html: Column, cls: str) -> Column:
    """Text of the first element carrying class ``cls``."""
    return F.regexp_extract(html, f'class="[^"]*{cls}[^"]*"[^>]*>([^<]*)<', 1)


def _all_tag_texts(html: Column, cls: str) -> Column:
    return F.regexp_extract_all(
        html, F.lit(f'class="[^"]*{cls}[^"]*"[^>]*>([^<]*)<'), F.lit(1)
    )


def transform(raw: DataFrame, now: Column | None = None) -> DataFrame:
    if now is None:
        now = F.current_timestamp()

    html = F.col("html_content")
    is_rent = F.upper(F.col("listingType")) == "RENT"

    # breadcrumb <a> texts → joined path; [2]=city, [4]=neighborhood
    # (kilid_transformer.py:192-196)
    crumbs = F.regexp_extract_all(
        html, F.lit(r'<a[^>]*class="[^"]*breadcrumb[^"]*"[^>]*>([^<]*)</a>'), F.lit(1)
    )
    # positional pairing: label blocks ↔ price blocks (W7)
    labels = _all_tag_texts(html, "price-label")
    amounts = _all_tag_texts(html, "price-value")
    pairs = F.arrays_zip(labels.alias("label"), amounts.alias("amount"))

    def amount_for(keyword: str) -> Column:
        hit = F.try_element_at(
            F.filter(pairs, lambda p: p["label"].contains(keyword)), F.lit(1)
        )
        return fn.parse_toman_amount(F.coalesce(hit["amount"], F.lit("")))

    price = amount_for("قیمت")
    rent = amount_for("اجاره")
    credit = F.coalesce(amount_for("رهن"), amount_for("ودیعه"))
    # "رهن کامل" → rent 0 (F24, kilid_transformer.py:235-238)
    full_credit = html.contains("رهن کامل")
    rent = F.when(full_credit, F.lit(0).cast("long")).otherwise(rent)

    published = fn.text_to_date(_tag_text(html, "publish-date"), now=now, variant="divar")

    produced: dict[str, Column] = {
        "content_url": F.col("content_url"),
        "created_at": now,
        "cat1_slug": F.lower(F.col("listingType")),
        "cat2_slug": fn.to_slug(F.col("landuseType")),
        "cat3_slug": fn.to_slug(F.col("propertyType")),
        "city_slug": fn.to_slug(F.try_element_at(crumbs, F.lit(3))),
        "neighborhood_slug": fn.to_slug(F.try_element_at(crumbs, F.lit(5))),
        "created_at_month": published,
        "title": fn.clean_text(F.regexp_extract(html, r"<h1[^>]*>([^<]*)</h1>", 1)),
        "description": fn.clean_text(_tag_text(html, "description")),
        # BUY nulls rent fields, RENT nulls price fields (F24,
        # kilid_transformer.py:474-521)
        "price_value": F.when(~is_rent, price),
        "rent_value": F.when(is_rent, rent.cast("double")),
        "credit_value": F.when(is_rent, credit.cast("double")),
        "rent_type": F.when(is_rent, fn.rent_type(credit.cast("double"), rent.cast("double"))),
        "deed_type": fn.normalize_deed_type(
            F.regexp_extract(html, r"(سند[^<]*)<", 1)
        ),
        "building_size": fn.parse_price(_tag_text(html, "area")),
        "rooms_count": fn.normalize_rooms(
            F.coalesce(_tag_text(html, "rooms"), F.lit(""))
        ).try_cast("int"),
        "bread_crumb": F.array_join(crumbs, "/"),
        "breadcrumbs": F.array_join(crumbs, "/"),
        "status": F.lit("active"),
    }
    return conform(raw, produced, source="kilid")
