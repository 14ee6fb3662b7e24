"""Structured Streaming variants of the KG pipeline (incremental crawl)."""
