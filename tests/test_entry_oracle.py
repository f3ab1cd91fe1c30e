"""Mimics the driver's correctness gate: run every ``queries()`` entry and
its DuckDB ``oracle_sql()`` side by side at sf0.001 and require identical
row count, column names, and (order-insensitively) identical values."""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod

pytestmark = pytest.mark.spark

import os

SF_DIR = os.environ.get("ENTRY_TEST_SF_DIR", "/root/testdata/sf0.001")
# data-derived oracle constants (embedding_pq_trained trains its
# codebooks from the table) must come from the SAME sf dir the queries
# run at; oracle_sql() reads this env var (driver default: sf0.01)
os.environ["ENTRY_TEST_SF_DIR"] = SF_DIR
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.tz_localize(None) if getattr(s.dt, "tz", None) is not None else s
            df[c] = df[c].astype("datetime64[us]")
        elif s.dtype == object and len(s) and isinstance(s.iloc[0], (list, np.ndarray)):
            df[c] = s.map(lambda v: tuple(np.asarray(v).tolist()))
        elif s.dtype == object and len(s) and isinstance(s.iloc[0], bytes):
            df[c] = s
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype(bool)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    key = df.apply(lambda r: tuple(str(v) for v in r), axis=1)
    return df.iloc[np.argsort(key.to_numpy(), kind="stable")].reset_index(drop=True)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    want = duck.sql(ORACLES[name]).df()
    assert list(sorted(got.columns)) == list(sorted(want.columns)), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    g, w = _normalize(got), _normalize(want)
    for c in g.columns:
        gv, wv = g[c], w[c]
        if pd.api.types.is_float_dtype(gv):
            assert np.allclose(gv.to_numpy(dtype=float), wv.to_numpy(dtype=float), rtol=0, atol=0, equal_nan=True), (
                f"{name}.{c}: float values differ"
            )
        else:
            same = (gv.to_numpy() == wv.to_numpy()) | (gv.isna().to_numpy() & wv.isna().to_numpy())
            assert same.all(), f"{name}.{c}: values differ at {np.nonzero(~same)[0][:5]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
