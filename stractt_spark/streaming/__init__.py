"""Structured-Streaming ingest: incremental segment appends."""
