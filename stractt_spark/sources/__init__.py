"""Corpus sources: synthetic code-corpus generator + parquet/table readers."""
