"""Local mirror of the driver's Spark-vs-DuckDB comparison: row count,
column-name set, and order-insensitive value equality (columns sorted by
name, rows sorted by all columns)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLE_NAMES = (
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


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # multi-file layout (scaled perf corpora)
            path += "/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.map(lambda v: _canon_val(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _canon_val(v):
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def compare(spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems = []
    sp = spark_df.toPandas()
    du = con.execute(sql).df()
    if len(sp) != len(du):
        problems.append(f"row count: spark={len(sp)} duckdb={len(du)}")
    if sorted(sp.columns) != sorted(du.columns):
        problems.append(f"columns: spark={sorted(sp.columns)} duckdb={sorted(du.columns)}")
        return problems
    a, b = _canon(sp), _canon(du)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
                # Bit-faithful, like the driver's serialized value-hash: the
                # sign of zero matters (-0.0 != +0.0 at repr level even though
                # they compare numerically equal) and NaN only equals NaN.
                ok = [
                    (math.isnan(x) and math.isnan(y))
                    or (x == y and math.copysign(1.0, x) == math.copysign(1.0, y))
                    for x, y in zip(av.fillna(float("nan")), bv.fillna(float("nan")))
                ]
                if not all(ok):
                    i = ok.index(False)
                    problems.append(f"col {c} differs at sorted row {i}: {av[i]!r} vs {bv[i]!r}")
            else:
                neq = av.astype(str) != bv.astype(str)
                if neq.any():
                    i = int(neq.idxmax())
                    problems.append(f"col {c} differs at sorted row {i}: {av[i]!r} vs {bv[i]!r}")
    return problems
