"""DuckDB-oracle comparison harness mirroring the driver's t2 gate:
row-count + schema (column-name set) + order-insensitive value match.

Cells are canonicalized to strings (floats via ``repr`` — EXACT, no
tolerance) so any query whose values aren't bit-stable across engines
fails here first; the fix is to make the query itself deterministic
(round aggregates, total ordering for LIMIT), not to loosen the test.
"""

from __future__ import annotations

import datetime as dt
import math
from typing import Any

import duckdb

from inf2106_map_reduce_spark.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the test tables pre-registered as views, exactly
    like the driver does."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_cell(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return repr(round(v, 9))
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon_cell(row[i]) for i in order) for row in rows]
    out.sort()
    return out


def spark_result(df) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = list(df.columns)
    rows = [tuple(row) for row in df.collect()]
    return cols, canon_rows(cols, rows)


def duckdb_result(
    con: duckdb.DuckDBPyConnection, sql: str
) -> tuple[list[str], list[tuple[str, ...]]]:
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    rows = res.fetchall()
    return cols, canon_rows(cols, rows)


def assert_matches_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    s_cols, s_rows = spark_result(spark_df)
    d_cols, d_rows = duckdb_result(con, sql)
    assert sorted(s_cols) == sorted(d_cols), (
        f"schema mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    mism = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ][:5]
    assert not mism, f"value mismatch (first 5 of sorted rows): {mism}"
