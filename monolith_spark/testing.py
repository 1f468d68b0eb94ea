"""Oracle-parity harness: run a workload query on Spark and DuckDB
side-by-side and diff the results the way the driver does (row count,
column names, order-insensitive exact values)."""

from __future__ import annotations

import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_object_dtype(df[c]) or isinstance(df[c].dtype, pd.StringDtype):
            df[c] = df[c].astype(str)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions; empty = parity."""
    problems: list[str] = []
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return [f"column mismatch: spark={s_cols} oracle={o_cols}"]
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s, o = _normalize(spark_pdf), _normalize(oracle_pdf)
    if problems:
        return problems
    for c in s.columns:
        a, b = s[c].to_numpy(), o[c].to_numpy()
        if a.dtype.kind == "f":
            eq = np.array_equal(a, b, equal_nan=True)
            if not eq:
                diff = np.abs(a - b)
                idx = int(np.nanargmax(diff))
                problems.append(
                    f"col {c}: max abs diff {np.nanmax(diff):.3e} at row {idx}"
                    f" (spark={a[idx]!r} oracle={b[idx]!r})"
                )
        else:
            neq = a != b
            if neq.any():
                idx = int(np.argmax(neq))
                problems.append(f"col {c}: first mismatch row {idx}: spark={a[idx]!r} oracle={b[idx]!r}")
    return problems


def run_parity(spark, sf_dir: str, name: str) -> list[str]:
    from monolith_spark.workload import all_queries

    q = all_queries()[name]
    spark_pdf = q.spark_fn(spark, sf_dir).toPandas()
    if q.oracle is None:
        return []
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.sql(q.oracle).df()
    finally:
        con.close()
    return compare_frames(spark_pdf, oracle_pdf)
