"""Local mirror of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.001 and compare row count, column names, and (column-name-sorted,
row-order-insensitive) values.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from marketstore_spark.catalog import TABLES
from marketstore_spark.queries import ORACLE_SQL, SPARK_QUERIES


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> None:
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            both_nan = pd.isna(av) & pd.isna(bv)
            close = [
                bool(bn) or (not pd.isna(x) and not pd.isna(y) and math.isclose(x, y, rel_tol=0, abs_tol=0))
                for x, y, bn in zip(av, bv, both_nan)
            ]
            assert all(close), f"{name}: float column {c} differs (exact compare)"
        else:
            assert a[c].equals(b[c]), f"{name}: column {c} differs"


@pytest.mark.parametrize("name", sorted(SPARK_QUERIES))
def test_parity(name, spark, sf_dir):
    sdf = SPARK_QUERIES[name](spark, sf_dir)
    spark_pdf = sdf.toPandas()
    # Vacuous-green guard: a 0-row result matching a 0-row oracle
    # proves nothing (VERDICT r01 on range_join) — every registered
    # query must produce rows at every test sf.
    assert len(spark_pdf) > 0, f"{name}: empty result — parity would be vacuous"

    if name not in ORACLE_SQL:
        return

    con = _duck(sf_dir)
    duck_pdf = con.execute(ORACLE_SQL[name]).df()
    _compare(name, spark_pdf, duck_pdf)
