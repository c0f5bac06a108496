"""JSON / nested-struct navigation (F33-F34, F37).

The reference walks deeply nested dicts with chained ``.get(..., {})``
(divar_transformer.py:89-127,563-594) and linear scans over
``sections[].widgets[]`` (divar_transformer.py:124-175). On typed
nested columns those become struct field access + higher-order array
functions; on raw JSON strings, ``get_json_object`` — both stay inside
codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .fa import _c


def json_path(col: Column | str, path: str) -> Column:
    """F33 — deep JSON-path get with NULL default
    (``data.get("seo",{}).get(...)`` chains → ``$.seo...``)."""
    return F.get_json_object(_c(col), path)


def section_widgets(sections: Column | str, section_name: str) -> Column:
    """F34 — widgets of the first section with the given name
    (``next(s for s in sections if s.section_name == X)``,
    divar_transformer.py:124-127). NULL-safe: empty filter → NULL."""
    hit = F.filter(_c(sections), lambda s: s["section_name"] == section_name)
    return F.element_at(hit, 1)["widgets"]


def first_widget_value(
    widgets: Column, widget_type: str | None = None, title: str | None = None
) -> Column:
    """F34 — first widget matching type and/or data.title, returning its
    ``data`` struct (divar_transformer.py:153-175)."""

    def pred(w: Column) -> Column:
        conds = []
        if widget_type is not None:
            conds.append(w["widget_type"] == widget_type)
        if title is not None:
            conds.append(w["data"]["title"] == title)
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out

    return F.element_at(F.filter(widgets, pred), 1)["data"]


def widgets_to_map(widgets: Column) -> Column:
    """F34 — UNEXPANDABLE_ROW widgets → map(title → value)
    (divar_transformer.py:266-298 dict-build)."""
    rows = F.filter(widgets, lambda w: w["widget_type"] == "UNEXPANDABLE_ROW")
    return F.map_from_entries(
        F.transform(rows, lambda w: F.struct(w["data"]["title"], w["data"]["value"]))
    )


def next_data_json(html: Column | str) -> Column:
    """F37 — extract the ``__NEXT_DATA__`` script-tag JSON body from an
    HTML string (mrestate_crawler.py:36-44)."""
    return F.regexp_extract(
        _c(html),
        r'<script id="__NEXT_DATA__"[^>]*>(.*?)</script>',
        1,
    )
