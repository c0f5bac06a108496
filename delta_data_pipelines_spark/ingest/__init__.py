"""Ingestion: per-site transformer registry + crawl/queue helpers.

Mirrors the reference's YAML-registered crawler/fetcher/transformer
triples (web_scraping/websites.yaml, loaded by dotted path in
crawler_dag_factory.py:18-22) as a plain registry of
``DataFrame -> DataFrame`` pipelines, all emitting the canonical
listing schema (schemas.LISTING_SCHEMA).
"""

from .registry import TRANSFORMERS, conform, transform  # noqa: F401
