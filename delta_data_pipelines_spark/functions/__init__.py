"""Scalar expression library (SURVEY.md §2.6, F1-F37).

Every function here is a *column-expression builder*: it takes Columns
(or column names) and returns a Column built only from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, no Python
in the hot path. Functions whose reference semantics depend on "now"
accept an injectable ``now`` Column so tests can freeze the clock.

Reference parity notes live in each docstring (file:line into
/root/reference). Where the reference returns mixed Python types from
one function (e.g. ``parse_toman_amount`` → int | str), the library
splits it into one typed column per role (amount: long, mode: string)
— the schema-clean equivalent.
"""

from .fa import (  # noqa: F401
    persian_to_english_digits,
    safe_int,
    try_parse_float,
    parse_price,
    normalize_more_than_value,
    more_than_plus_one,
)
from .money import parse_toman_amount, toman_mode  # noqa: F401
from .dates import (  # noqa: F401
    text_to_date,
    iran_to_utc,
    utc_to_iran,
    iran_datetime_to_utc_iso,
    age_to_build_year,
    try_parse_datetime,
    clamp_timestamp,
    watermark_with_overlap,
)
from .text import (  # noqa: F401
    clean_text,
    to_slug,
    normalize_property_type,
    normalize_deed_type,
    map_enum,
    price_mode_from_title,
    feature_presence,
    rent_type,
    floor_of,
    total_floors_of,
    normalize_rooms,
    normalize_construction_year,
    join_breadcrumbs,
    split_location,
    token_to_url,
    fix_url,
    relative_to_absolute_url,
)
from .jsonnav import (  # noqa: F401
    json_path,
    section_widgets,
    first_widget_value,
    widgets_to_map,
    next_data_json,
)
