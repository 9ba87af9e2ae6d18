"""Structured Streaming ingest (stretch, SURVEY.md §2 O-32)."""
