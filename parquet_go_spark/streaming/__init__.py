"""Structured Streaming ingestion for the encode engine."""
