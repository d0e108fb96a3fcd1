"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL on the same parquet fixtures, sorts
columns by name and rows by value, and asserts exact equality — the same
(order-insensitive, hash-style) contract the driver applies, surfaced as a
readable diff instead of a hash mismatch.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from sheetsetl_spark.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df, oracle: str, sf_dir: str) -> None:
    con = duck_connection(sf_dir)
    expected = _normalize(con.execute(oracle).df())
    actual = _normalize(spark_df.toPandas())
    con.close()

    assert list(actual.columns) == list(expected.columns), (
        f"column mismatch: spark={list(actual.columns)} oracle={list(expected.columns)}"
    )
    assert len(actual) == len(expected), f"row count: spark={len(actual)} oracle={len(expected)}"
    for c in actual.columns:
        a, e = actual[c], expected[c]
        if a.dtype.kind == "f" or e.dtype.kind == "f":
            # The driver compares STRINGIFIED values, so an int column on
            # one side vs float on the other ("1791" vs "1791.0") is a
            # hash mismatch even when numerically equal. The classic
            # cause: DuckDB SUM(int) returns HUGEINT -> pandas float —
            # CAST such sums to BIGINT in the oracle SQL.
            assert a.dtype.kind == e.dtype.kind or (
                a.dtype.kind not in "iu" and e.dtype.kind not in "iu"
            ), (
                f"column {c!r}: integer/float dtype split "
                f"(spark={a.dtype}, oracle={e.dtype}) — the driver's "
                f"stringified hash would mismatch"
            )
            a = a.astype("float64")
            e = e.astype("float64")
            mism = ~((a == e) | (a.isna() & e.isna()))
        else:
            mism = ~((a == e) | (a.isna() & e.isna()))
        if mism.any():
            idx = mism[mism].index[:5]
            raise AssertionError(
                f"value mismatch in column {c!r} ({int(mism.sum())} rows), e.g. "
                f"spark={a[idx].tolist()} oracle={e[idx].tolist()}"
            )
