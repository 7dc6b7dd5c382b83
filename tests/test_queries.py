"""Driver-contract test: run every queries() entry at sf0.001 and compare
against its oracle_sql() through DuckDB — the same shape of check the
graft driver performs at sf0.01 (row count + order-insensitive values)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(np.asarray(v).tolist()) if isinstance(v, (list, np.ndarray)) else v
            )
        if str(df[c].dtype).startswith("datetime64[ns"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_con():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as mod

    return mod


def _compare(name, mine: pd.DataFrame, oracle: pd.DataFrame):
    assert len(mine) == len(oracle), f"{name}: rows {len(mine)} != {len(oracle)}"
    assert sorted(mine.columns) == sorted(oracle.columns), (
        f"{name}: cols {sorted(mine.columns)} != {sorted(oracle.columns)}"
    )
    a, b = canon(mine), canon(oracle)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            np.testing.assert_allclose(
                av.astype(float), bv.astype(float), rtol=0, atol=0,
                err_msg=f"{name}.{c}",
            )
        else:
            assert (av == bv).all(), f"{name}.{c}: value mismatch"


def test_entry_smoke(entry_mod):
    res = entry_mod.entry()
    df = to_pandas(res)
    assert len(df) >= 0 and len(df.columns) >= 1


ORACLE_KEYS = None


def _oracle_keys():
    import __ray_entry__ as mod

    return sorted(mod.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_keys())
def test_query_matches_oracle(entry_mod, oracle_con, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    mine = to_pandas(q(SF_DIR))
    oracle = oracle_con.execute(sql).df()
    _compare(name, mine, oracle)


def test_rows_only_queries_run(entry_mod):
    qs = entry_mod.queries()
    oracles = set(entry_mod.oracle_sql())
    for name, fn in qs.items():
        if name in oracles:
            continue
        df = to_pandas(fn(SF_DIR))
        assert df is not None and len(df.columns) >= 1, name
