"""Spark-vs-DuckDB comparison used by the parity tests.

Replicates the driver's check shape: row count + column names + an
order-insensitive value comparison (columns sorted by name, rows sorted by
all columns). Floats must already be rounded inside the queries; here we
only normalize representation (e.g. numpy vs python scalars, NaN vs None).
"""

from __future__ import annotations

import math
from datetime import datetime, date

import duckdb

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


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        if v == int(v) and abs(v) < 2**52:
            return float(v)
        return v
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, int):
        return int(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare(spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = [c.lower() for c in spark_df.columns]
    d = con.sql(sql)
    d_cols = [c.lower() for c in d.columns]
    d_rows = [tuple(r) for r in d.fetchall()]
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
    a, b = _canon(s_rows, s_cols), _canon(d_rows, d_cols)
    if a != b:
        diff_i = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
        for i in diff_i:
            problems.append(f"row {i}: spark={a[i]} duckdb={b[i]}")
        if not diff_i and len(a) != len(b):
            only_a = [r for r in a if r not in set(b)][:2]
            only_b = [r for r in b if r not in set(a)][:2]
            problems.append(f"spark-only={only_a} duckdb-only={only_b}")
    return problems
