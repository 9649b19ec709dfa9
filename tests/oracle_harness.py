"""Local replica of the driver's correctness gate.

Runs a registered query on Spark and its oracle SQL on DuckDB over the
same parquet tables, normalizes (column order by name, row order by all
columns, floats rounded) and asserts equality. Used by
tests/test_oracle_parity.py so oracle drift is caught before the driver
runs CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64").round(6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(spark_df, oracle_df: pd.DataFrame, name: str, atol: float = 1e-9) -> None:
    got = _normalize(spark_df.toPandas())
    want = _normalize(oracle_df)
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        if np.issubdtype(got[c].dtype, np.floating):
            if not np.allclose(got[c], want[c], atol=atol, equal_nan=True):
                bad = np.where(~np.isclose(got[c], want[c], atol=atol, equal_nan=True))[0][:5]
                raise AssertionError(
                    f"{name}.{c}: value mismatch at {bad}: "
                    f"{got[c].iloc[bad].tolist()} vs {want[c].iloc[bad].tolist()}"
                )
            exact = np.array_equal(
                got[c].fillna(0).values, want[c].fillna(0).values
            )
            if not exact:
                d = np.nanmax(np.abs(got[c].values - want[c].values))
                if d > 0 and not math.isnan(d):
                    print(f"  note {name}.{c}: float not bit-exact, max diff {d:.2e}")
        else:
            if not got[c].equals(want[c]):
                bad = got[c][got[c] != want[c]].index[:5]
                raise AssertionError(
                    f"{name}.{c}: mismatch at {list(bad)}: "
                    f"{got[c].loc[bad].tolist()} vs {want[c].loc[bad].tolist()}"
                )
