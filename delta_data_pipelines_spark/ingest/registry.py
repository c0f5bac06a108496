"""Transformer registry and canonical-schema conformance.

``conform`` is the engine's replacement for the reference's
"every transformer must emit every field" convention: a transformer
returns whatever subset of canonical columns its source provides, and
conform fills the rest with typed NULLs, casts everything to the
canonical type, and orders columns — so all four sites union cleanly
into one listings table.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import LISTING_COLUMNS, LISTING_TYPES


def conform(df: DataFrame, produced: dict[str, Column], source: str) -> DataFrame:
    """Project ``produced`` columns onto the full canonical schema."""
    cols = []
    for name in LISTING_COLUMNS:
        t = LISTING_TYPES[name]
        if name == "source":
            cols.append(F.lit(source).cast(t).alias(name))
        elif name in produced:
            cols.append(produced[name].try_cast(t).alias(name))
        else:
            cols.append(F.lit(None).cast(t).alias(name))
    return df.select(*cols)


def _load() -> dict[str, Callable[[DataFrame], DataFrame]]:
    from .transformers import divar, kilid, mrestate, sheypoor

    return {
        "divar": divar.transform,
        "sheypoor": sheypoor.transform,
        "mrestate": mrestate.transform,
        "kilid": kilid.transform,
    }


TRANSFORMERS: dict[str, Callable[[DataFrame], DataFrame]] = {}


def transform(site: str, raw: DataFrame) -> DataFrame:
    """Dispatch raw payloads to the site transformer (↔ dynamic import
    by dotted path, fetcher_dag_factory.py:19-22)."""
    if not TRANSFORMERS:
        TRANSFORMERS.update(_load())
    if site not in TRANSFORMERS:
        raise KeyError(f"unknown site: {site}; known: {sorted(TRANSFORMERS)}")
    return TRANSFORMERS[site](raw)
