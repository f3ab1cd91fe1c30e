"""Parquet interop layer: decode real Parquet pages with this engine's
kernels (golden cross-check against other writers)."""
