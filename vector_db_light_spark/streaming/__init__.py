"""Structured Streaming surface (incremental ingest, windowed aggregation)."""
