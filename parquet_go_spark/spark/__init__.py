"""Spark-side jobs: session, synthetic pages table, encode/decode, manifest."""
