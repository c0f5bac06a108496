"""Crawl-side set logic: URL dedup, queue publication, early stop.

The page-fetch loops themselves stay driver-side code (as in the
reference — network cursors are inherently sequential); everything
after "a page of candidate URLs exists" is DataFrame logic:

    partition_new(urls, seen)    BF.MEXISTS split → anti/semi joins
                                 (redis_utils.py:17-32, crawler_dag_factory.py:38-49)
    publish(queue, new)          RabbitMQ publish → queue-table MERGE
                                 (rabbitmq_utils.py:141-159)
    mark_seen(seen, new)         BF.MADD → seen-table MERGE
    dup_ratio(urls, seen)        per-page duplicate ratio for the
                                 early-stop heuristic (divar_crawler.py:144-155)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import VersionedTable


def partition_new(urls: DataFrame, seen: DataFrame, site: str) -> tuple[DataFrame, DataFrame]:
    """(new, duplicate) split of candidate URLs against the membership
    table — the exact version of the bloom probe (false-positive-free)."""
    site_seen = seen.where(F.col("site") == site).select("content_url")
    new = urls.join(site_seen, "content_url", "left_anti")
    dup = urls.join(site_seen, "content_url", "left_semi")
    return new, dup


def dup_ratio(urls: DataFrame, seen: DataFrame, site: str) -> float:
    """Duplicate ratio of one page batch. Driver reads one scalar —
    the crawl loop stops when it crosses the site threshold (≥0.5
    divar / ≥0.3 others, BASELINE.md)."""
    total = urls.count()
    if total == 0:
        return 1.0
    _, dup = partition_new(urls, seen, site)
    return dup.count() / total


def publish(queue: VersionedTable, new_urls: DataFrame, site: str) -> int:
    """Enqueue new URLs (idempotent on content_url — re-publishing a
    URL is a no-op, unlike RabbitMQ where dedup waits for Mongo)."""
    msg = new_urls.select(
        "content_url",
        F.lit(site).alias("site"),
        *[
            F.col(c) if c in new_urls.columns else F.lit(None).cast("string").alias(c)
            for c in ("listingType", "propertyType", "landuseType")
        ],
        F.current_timestamp().alias("enqueued_at"),
    )
    commit = queue.merge(msg, keys=["content_url"])
    return commit.metrics["inserted"]


def mark_seen(seen: VersionedTable, urls: DataFrame, site: str) -> int:
    commit = seen.merge(
        urls.select(F.lit(site).alias("site"), "content_url"),
        keys=["site", "content_url"],
    )
    return commit.metrics["inserted"]
