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


# Result-dtype parity. The driver's hash canonicalization goes through a
# dataframe conversion in which DuckDB HUGEINT (the default sum(int)
# result) and engine DECIMALs take a different representation than plain
# BIGINT/DOUBLE — so two result sets with identical cell VALUES can still
# hash-differently if their column types diverge across engines. The
# value-coercing comparison below (canon_value turns Decimal into float
# and compares ints regardless of width) is blind to that, which is how
# six dtype-misaligned oracle pairs stayed pytest-green while failing the
# round-2 driver gate (VERDICT r02 "What's wrong" #2). canon_type maps
# each engine's column type to a coarse tag at exactly the driver's
# observed granularity: int widths collapse (driver-green text_token_count
# pairs Spark INT with DuckDB BIGINT), but hugeint, decimal, float, str,
# bool, date, timestamp, binary, and array element tags must all agree.
_INT_TYPES = {
    "tinyint", "smallint", "int", "integer", "bigint", "long", "byte",
    "short", "utinyint", "usmallint", "uinteger", "ubigint",
}
_FLOAT_TYPES = {"float", "real", "double", "double precision", "float4", "float8"}


def canon_type(t: Any) -> str:
    """Coarse engine-independent tag for a column type string (Spark
    ``DataType.simpleString()`` or DuckDB type repr)."""
    s = str(t).strip().lower()
    if s.endswith("[]"):
        return f"array<{canon_type(s[:-2])}>"
    if s.startswith("array<") and s.endswith(">"):
        return f"array<{canon_type(s[6:-1])}>"
    if s in _INT_TYPES:
        return "int"
    if s == "hugeint":
        return "hugeint"
    if s in _FLOAT_TYPES:
        return "float"
    if s.startswith(("decimal", "numeric")):
        return "decimal"
    if s.startswith(("varchar", "char")) or s in {"string", "text"}:
        return "str"
    if s in {"boolean", "bool"}:
        return "bool"
    if s.startswith("timestamp"):
        return "timestamp"
    if s in {"blob", "binary", "varbinary", "bytea"}:
        return "binary"
    return s


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


def type_mismatches(spark_df, con, oracle_sql: str) -> list[str]:
    """Per-column canonical type-tag differences between the Spark result
    schema and the DuckDB oracle result schema (empty = parity)."""
    s_tags = {f.name: canon_type(f.dataType.simpleString()) for f in spark_df.schema}
    rel = con.sql(oracle_sql)
    d_tags = {c: canon_type(t) for c, t in zip(rel.columns, rel.types)}
    return [
        f"{name}: spark={s_tags[name]} duckdb={d_tags[name]}"
        for name in sorted(set(s_tags) & set(d_tags))
        if s_tags[name] != d_tags[name]
    ]


def compare(spark_df, con, oracle_sql: str) -> tuple[bool, str]:
    """Returns (match, diagnostic)."""
    s_cols, s_rows = spark_rows(spark_df)
    d_cols, d_rows = duckdb_rows(con, oracle_sql)
    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    bad_types = type_mismatches(spark_df, con, oracle_sql)
    if bad_types:
        return False, "column-type mismatch (driver hash would differ): " + "; ".join(
            bad_types
        )
    if len(s_rows) != len(d_rows):
        return False, f"row-count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    s_mat = canon_rows(s_cols, s_rows)
    d_mat = canon_rows(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(s_mat, d_mat)):
        if a != b:
            return False, f"first differing row {i}:\n  spark : {a}\n  duckdb: {b}"
    return True, "ok"
