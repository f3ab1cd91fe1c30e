"""Column-statistics operator: the engine's stats collection (reference
O13, ``stats.go`` + ``chunk_writer.go:283-290``) exposed as a DataFrame
op. ``table_column_stats`` computes per-column (num_rows, null_count,
n_distinct) by running the chunk encoder's own stat path over the table
as one chunk — the semantics the manifest records per partition chunk.

At scale, stats stay per-chunk in the manifest (additive counts sum;
distinct needs a sketch) — the single-chunk mode here exists so the
numbers are exactly SQL-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame

from ..core.chunk import _factorize
from ..core.columns import from_arrow

__all__ = ["table_column_stats", "table_numeric_minmax"]


def table_column_stats(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    cols = columns or df.columns

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tables = [pa.Table.from_pandas(b, preserve_index=False) for b in batches]
        if not tables:
            return
        table = pa.concat_tables(tables)
        rows = []
        for name in cols:
            cd = from_arrow(table.column(name))
            if cd.num_values:
                _, _, distinct = _factorize(cd)
            else:
                distinct = 0
            rows.append(
                {
                    "col_name": name,
                    "num_rows": cd.num_rows,
                    "null_count": cd.num_rows - cd.num_values,
                    "n_distinct": distinct,
                }
            )
        yield pd.DataFrame(rows)

    return df.coalesce(1).mapInPandas(
        stats, schema="col_name string, num_rows long, null_count long, n_distinct long"
    )


def table_numeric_minmax(df: DataFrame, columns: list[str]) -> DataFrame:
    """Per-column min/max (as double) via the encoder's stat path."""

    def mm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tables = [pa.Table.from_pandas(b, preserve_index=False) for b in batches]
        if not tables:
            return
        table = pa.concat_tables(tables)
        rows = []
        for name in columns:
            cd = from_arrow(table.column(name))
            v = cd.values
            rows.append(
                {
                    "col_name": name,
                    "min_v": float(v.min()) if len(v) else None,
                    "max_v": float(v.max()) if len(v) else None,
                }
            )
        yield pd.DataFrame(rows)

    return df.coalesce(1).mapInPandas(mm, schema="col_name string, min_v double, max_v double")
