"""Replicates the driver's correctness gate: run every queries() entry at
sf0.01 and diff against oracle_sql() via DuckDB (row count + column names +
order-insensitive values)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


ORACLES = entrymod.oracle_sql()
ALL = entrymod.queries()
SQL_CHECKED = sorted(set(ALL) & set(ORACLES))
ROWS_ONLY = sorted(set(ALL) - set(ORACLES))


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(spark, ddb, name):
    got = ALL[name](spark, SF_DIR).toPandas()
    want = ddb.sql(ORACLES[name]).df()
    assert sorted(got.columns) == sorted(want.columns), (
        name, list(got.columns), list(want.columns)
    )
    assert len(got) == len(want), (name, len(got), len(want))
    g, w = _canon(got), _canon(want)
    try:
        pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-9)
    except AssertionError as e:
        raise AssertionError(f"{name}: {e}\nGOT:\n{g.head(10)}\nWANT:\n{w.head(10)}")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = ALL[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert {"rank", "doc_id", "score"} <= set(df.columns)


def test_oracle_keys_subset():
    assert set(ORACLES) <= set(ALL)


def test_every_entry_inside_driver_window():
    """The driver checks only the FIRST 50 queries() entries; the registry
    holds exactly <= 50 (merged tagged-union entries keep every operator
    value-checked) with all oracle-backed entries before the rows-only
    tail, so NO entry is ever outside the check window."""
    assert len(ALL) <= 50, len(ALL)
    keys = list(ALL)
    first_rows_only = next(
        (i for i, k in enumerate(keys) if k not in ORACLES), len(keys)
    )
    misplaced = [k for k in keys[first_rows_only:] if k in ORACLES]
    assert misplaced == [], misplaced
