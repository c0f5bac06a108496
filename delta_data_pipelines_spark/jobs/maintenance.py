"""Maintenance jobs (SURVEY §2.1 S12, §2.8 D6).

Reference: ``scripts/format_divar_collection.py:105-178`` — cursor over
the whole collection, backfill content_url from post_token, then a
second pass type-normalizing every document in bulk_write batches of
1000; ``maintenance/mongo_to_bf_dag.py:38-83`` — rebuild the per-site
bloom filters by streaming every content_url back through BF.MADD.

Spark shape: the full-scan update is one ``select(normalize(*))``
overwrite (no cursor, no batching — partitioning is the batching); the
bloom rebuild is ``SELECT DISTINCT site, content_url``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dates import clamp_timestamp, try_parse_datetime
from ..functions.fa import persian_to_english_digits, try_parse_float
from ..storage import VersionedTable

URL_TEMPLATE = "https://divar.ir/v/{token}"


def normalize_listings(
    listings: DataFrame,
    url_prefix: str = "https://divar.ir/v/",
    clamp_limit: str = "2026-01-01 00:00:00",
    clamp_reset: str = "2025-12-01 00:00:00",
) -> DataFrame:
    """One-pass full-table normalize (S12).

    - backfill content_url from post_token (format_divar_collection.py:
      110-121): the reference derives the URL from the token when the
      column is missing
    - digit-fold + numeric re-coercion for size columns (F4, :128-141)
    - created_at_month re-parse + clamp (F14/F15, :38-48,100-101)
    """
    out = listings
    if "post_token" in out.columns:
        out = out.withColumn(
            "content_url",
            F.coalesce(
                F.col("content_url"), F.concat(F.lit(url_prefix), F.col("post_token"))
            ),
        )
    for c in ("land_size", "building_size"):
        if c in out.columns:
            out = out.withColumn(
                c, try_parse_float(F.col(c).cast("string")).cast("double")
            )
    for c in ("title", "description"):
        if c in out.columns:
            out = out.withColumn(c, persian_to_english_digits(F.col(c)))
    if "created_at_month" in out.columns:
        reparsed = F.coalesce(
            F.col("created_at_month"),
            try_parse_datetime(F.col("created_at_month").cast("string")),
        )
        out = out.withColumn(
            "created_at_month", clamp_timestamp(reparsed, clamp_limit, clamp_reset)
        )
    return out


def rebuild_seen_urls(listings: DataFrame, site_col: str = "cat1_slug") -> DataFrame:
    """D6 — rebuild the membership key table from the authoritative
    store: the exact-set replacement for re-streaming every URL through
    BF.MADD (mongo_to_bf_dag.py:38-83)."""
    return (
        listings.where(F.col("content_url").isNotNull())
        .select(F.col(site_col).alias("site"), "content_url")
        .distinct()
    )


def check_url(
    url: str,
    queue: VersionedTable,
    seen: VersionedTable,
    listings: VersionedTable,
) -> dict:
    """D7 — cross-store consistency probe: where does one URL live?
    (↔ scripts/check_url_in_bf_and_db.py:17-63 probing Mongo + bloom +
    RabbitMQ). Three point lookups; at scale each is a data-skipped
    scan of a key-sorted table."""
    def present(t: VersionedTable) -> bool:
        if not t.exists():
            return False
        return not t.read().where(F.col("content_url") == url).isEmpty()

    state = {
        "url": url,
        "in_queue": present(queue),
        "in_seen": present(seen),
        "in_listings": present(listings),
    }
    # consistent end states: everywhere, or seen+queued but not yet
    # fetched, or nowhere. Seen-without-queue means a dropped publish.
    state["consistent"] = (
        state["in_seen"] or not (state["in_queue"] or state["in_listings"])
    )
    return state


def run_normalize(table: VersionedTable) -> dict:
    """Apply the normalize pass in place (new table version)."""
    commit = table.overwrite(normalize_listings(table.read()))
    return {"version": commit.version, "rows": commit.metrics["rows"]}
