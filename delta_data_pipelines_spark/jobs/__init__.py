"""Composed pipelines (SURVEY §3's entry-point paths as Spark jobs)."""

from .maintenance import normalize_listings, rebuild_seen_urls
from .price_dataset import build_price_dataset, publish_dataset

__all__ = [
    "build_price_dataset",
    "publish_dataset",
    "normalize_listings",
    "rebuild_seen_urls",
]

from .incremental_index import run_incremental  # noqa: E402

__all__.append("run_incremental")

from .curate_corpus import curate_corpus, publish_corpus  # noqa: E402

__all__ += ["curate_corpus", "publish_corpus"]
