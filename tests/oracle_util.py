"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side by side, sorts columns by name and
rows by value, and compares cell-by-cell (floats via exact equality after the
queries' own deterministic rounding; timestamps normalized to naive UTC).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_array_cell(v):
    """Array-valued cells (e.g. emb_pq_codes' ``codes``) come back as
    numpy arrays / lists with engine-specific dtypes; canonicalize to one
    string so rows sort and compare identically (ints exact, floats via
    repr -- array floats in this repo are pre-rounded by the queries)."""
    import numpy as np

    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_canon_array_cell(x) for x in v) + "]"
    if isinstance(v, (bool, np.bool_)):
        return repr(bool(v))
    if isinstance(v, np.integer):
        return repr(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, int):
        return repr(v)
    return repr(v)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: _canon_array_cell(v)
                if isinstance(v, (list, tuple, np.ndarray))
                else v
            )
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    got = _normalize(spark_df.toPandas())
    want = _normalize(con.execute(sql).fetchdf())
    problems: list[str] = []
    if list(got.columns) != list(want.columns):
        return [f"columns differ: spark={list(got.columns)} duckdb={list(want.columns)}"]
    if len(got) != len(want):
        return [f"row count differs: spark={len(got)} duckdb={len(want)}"]
    for c in got.columns:
        a, b = got[c], want[c]
        for i, (x, y) in enumerate(zip(a, b)):
            xn = x is None or (isinstance(x, float) and math.isnan(x)) or pd.isna(x)
            yn = y is None or (isinstance(y, float) and math.isnan(y)) or pd.isna(y)
            if xn or yn:
                if bool(xn) != bool(yn):
                    problems.append(f"{c}[{i}]: null mismatch {x!r} vs {y!r}")
                continue
            if isinstance(x, float) or isinstance(y, float):
                if not math.isclose(float(x), float(y), rel_tol=0, abs_tol=0):
                    problems.append(f"{c}[{i}]: {x!r} != {y!r}")
            else:
                if str(x) != str(y):
                    problems.append(f"{c}[{i}]: {x!r} != {y!r}")
            if len(problems) > 5:
                return problems
    return problems
