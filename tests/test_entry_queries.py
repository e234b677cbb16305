"""Mirror of the driver's correctness gate: run every queries() entry at
sf0.001 and compare against oracle_sql() via DuckDB (row count + sorted
column names + values)."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod

SF_DIR = os.environ.get("MIRROR_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(result):
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64).round(9)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


# Golden-parquet oracles are pinned at sf0.01 (the driver's correctness
# scale) — at this module's sf0.001 mirror they are exercised rows-only;
# tests/test_golden_oracles.py compares them against the goldens at sf0.01.
ORACLE_KEYS = sorted(
    set(entrymod.oracle_sql()) - set(entrymod.GOLDEN_ORACLE_KEYS)
)
ROWS_ONLY_KEYS = sorted(set(entrymod.queries().keys()) - set(ORACLE_KEYS))


def test_entry_smoke():
    res = _to_pandas(entrymod.entry())
    assert len(res) > 0
    assert set(res.columns) >= {"event_type", "bucket_us", "cnt", "p95_v"}


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(con, name):
    got = _normalize(_to_pandas(entrymod.queries()[name](SF_DIR)))
    want = _normalize(con.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9, rtol=1e-9)


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_queries_run(name):
    got = _to_pandas(entrymod.queries()[name](SF_DIR))
    assert got is not None
    assert len(got.columns) > 0
