"""Structured Streaming ingest + incremental entity resolution."""
