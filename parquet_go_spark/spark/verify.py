"""Round-trip verification: the per-row invariant from BASELINE.json
``input_hint`` — byte-identical values per key after encode->decode —
checked distributed (join on key, null-safe compare of every column)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def verify_roundtrip(original: DataFrame, decoded: DataFrame, key: str) -> dict:
    """Returns {rows, missing, mismatches:{col: n}, ok}; ok = all zero."""
    cols = [c for c in original.columns if c != key]
    missing = original.select(key).join(decoded.select(key), key, "left_anti").count()
    o = original.select(key, *[F.col(c).alias(f"o_{c}") for c in cols])
    d = decoded.select(key, *[F.col(c).alias(f"d_{c}") for c in cols])
    j = o.join(d, key, "inner")
    row = j.agg(
        F.count("*").alias("rows"),
        *[
            F.sum((~F.col(f"o_{c}").eqNullSafe(F.col(f"d_{c}"))).cast("long")).alias(f"mm_{c}")
            for c in cols
        ],
    ).collect()[0]
    mismatches = {c: (row[f"mm_{c}"] or 0) for c in cols}
    return {
        "rows": row["rows"],
        "missing": missing,
        "mismatches": mismatches,
        "ok": missing == 0 and all(v == 0 for v in mismatches.values()),
    }
