"""Canonical JSON result envelope.

Reference parity: ``sqltojson.SqlToJson`` renders a result set as a
JSON array of row-objects (call site query_controller.go:98), which
``responses.JSON`` writes to HTTP (responses.go:9-15). The reference's
round-trip through ``map[string]interface{}`` coerces all numbers to
float64 (elastic_controller.go:129; SURVEY.md §1.2) — int64 above 2^53
silently loses precision. We keep int64 exact, serialize timestamps as
ISO-8601 (what ES dynamic mapping detects as ``date``), and expose the
result schema (the reference cannot — SURVEY.md §1.3).

Scale posture: ``collect_envelope`` is the explicit driver-side
materialization point and is guarded by ``max_rows`` (SURVEY.md §7
hard-part #5). Everything else in the engine keeps data on executors.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import json
import math
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

from golang_db_query_engine_elasticsearch_indexer_spark.errors import RowLimitExceededError

DEFAULT_MAX_ROWS = 100_000


def _canon_value(v: Any) -> Any:
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep="T")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, dict):
        return {k: _canon_value(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_canon_value(x) for x in v]
    return v


def rows_to_documents(rows: list[dict]) -> list[str]:
    """One canonical JSON string per row — the unit the indexer writes.

    Parity with the per-row re-marshal loop (elastic_controller.go:129-137)
    minus its float64 lossiness.
    """
    return [
        json.dumps(_canon_value(r), ensure_ascii=False, separators=(",", ":"))
        for r in rows
    ]


@dataclass
class QueryResult:
    """Response envelope: data + schema + count.

    The reference returns the bare JSON array (responses.go:9-15); we
    add ``schema`` and ``count`` (SURVEY.md §1.3 recommendation).
    """

    data: list[dict] = field(default_factory=list)
    schema: list[dict] = field(default_factory=list)
    count: int = 0
    truncated: bool = False

    def to_json(self) -> str:
        return json.dumps(
            {
                "data": self.data,
                "schema": self.schema,
                "count": self.count,
                "truncated": self.truncated,
            },
            ensure_ascii=False,
        )


def schema_of(df: DataFrame) -> list[dict]:
    return [
        {"name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
        for f in df.schema.fields
    ]


def collect_envelope(
    df: DataFrame, max_rows: int = DEFAULT_MAX_ROWS, strict: bool = False
) -> QueryResult:
    """Materialize a DataFrame into the response envelope.

    Fetches ``max_rows + 1`` rows via ``take`` (limit pushed into the
    plan — a top-k/limit physical node, never a full collect). With
    ``strict`` the overflow raises; otherwise the envelope is marked
    ``truncated`` — either way the driver's memory is bounded, unlike
    the reference's whole-result buffering (elastic_controller.go:118).
    """
    taken = df.take(max_rows + 1)
    truncated = len(taken) > max_rows
    if truncated and strict:
        raise RowLimitExceededError(
            f"Result exceeds max_rows={max_rows}; use the indexer sink for large results"
        )
    rows = [_canon_value(r.asDict(recursive=True)) for r in taken[:max_rows]]
    return QueryResult(
        data=rows, schema=schema_of(df), count=len(rows), truncated=truncated
    )
