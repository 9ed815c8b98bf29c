"""Local mirror of the driver's DuckDB-oracle differential check.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, then compares row count, column names, and order-insensitive
values (exact for ints/strings/timestamps, tight tolerance for doubles).
"""

from __future__ import annotations

import math

import duckdb

TABLES = [
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
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert the Spark result and the DuckDB oracle result match."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    con = duck_con(sf_dir)
    res = con.sql(oracle_sql)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(o_cols), f"columns differ: {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), f"row count differs: {len(s_rows)} vs {len(o_rows)}"
    sc, sr = _norm_rows(s_cols, s_rows)
    _, orr = _norm_rows(o_cols, o_rows)
    for i, (a, b) in enumerate(zip(sr, orr)):
        assert _row_eq(a, b), f"row {i} differs:\n  spark : {a}\n  oracle: {b}\n  cols: {sc}"


def _row_eq(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if math.isnan(x) and math.isnan(y):
                continue
            if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                return False
        elif x != y:
            return False
    return True
