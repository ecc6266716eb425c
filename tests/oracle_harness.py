"""Shared harness: compare queries() vs oracle_sql() the way the driver
does — row count + schema + order-insensitive value comparison."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float") or str(df[c].dtype).startswith("Float"):
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype) in ("bool", "boolean"):
            df[c] = df[c].astype("int64")
        else:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return [f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"]
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}")
        return errs
    a, b = canon(spark_pdf), canon(duck_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            bad = ~(
                np.isclose(av.astype(float), bv.astype(float),
                           rtol=0, atol=1e-9, equal_nan=True)
            )
        else:
            bad = av != bv
        if bad.any():
            i = int(np.argmax(bad))
            errs.append(
                f"{name}: col {c} differs at sorted-row {i}: "
                f"spark={av[i]!r} duck={bv[i]!r} ({int(bad.sum())} total)"
            )
    return errs
