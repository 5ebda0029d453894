"""Local differential-test harness: Spark vs DuckDB on the same parquet.

Mirrors the driver's t2 gate (BASELINE.json): run each declared query
through Spark AND through DuckDB on the identical fixture tables, then
compare row-count + schema-insensitive sorted value matrices. This is
the engine's own copy so mismatches are caught in pytest before the
driver runs (SURVEY.md §5 item 1).
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
from typing import Any

import duckdb

from golang_db_query_engine_elasticsearch_indexer_spark.session import FIXTURE_TABLES


def duckdb_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    """DuckDB connection with the fixture tables registered as views,
    matching the driver's pre-registered-view setup."""
    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        path = f"{sf_dir}/{name}.parquet"
        try:
            con.sql(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{path}'")
        except duckdb.Error:
            continue
    return con


def canon_value(v: Any) -> Any:
    """Engine-independent canonical form for one cell."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 2**53:
            return float(v)
        return v
    if isinstance(v, int):
        return v
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return tuple(canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon_value(x)) for k, x in v.items()))
    return v


def canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Column-name-sorted, row-sorted canonical matrix."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    mat = [tuple(canon_value(r[i]) for i in order) for r in rows]
    return sorted(mat, key=lambda t: tuple((x is None, str(x)) for x in t))


def spark_rows(df) -> tuple[list[str], list[tuple]]:
    return list(df.columns), [tuple(r) for r in df.collect()]


def duckdb_rows(con, sql: str) -> tuple[list[str], list[tuple]]:
    rel = con.sql(sql)
    return list(rel.columns), rel.fetchall()


def compare(spark_df, con, oracle_sql: str) -> tuple[bool, str]:
    """Returns (match, diagnostic)."""
    s_cols, s_rows = spark_rows(spark_df)
    d_cols, d_rows = duckdb_rows(con, oracle_sql)
    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row-count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    s_mat = canon_rows(s_cols, s_rows)
    d_mat = canon_rows(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(s_mat, d_mat)):
        if a != b:
            return False, f"first differing row {i}:\n  spark : {a}\n  duckdb: {b}"
    return True, "ok"
