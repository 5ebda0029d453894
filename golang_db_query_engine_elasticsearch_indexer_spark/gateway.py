"""Query gateway: validate → execute → envelope.

Reference parity: ``getQueryResult`` (query_controller.go:54-107) runs
param validation (paramsNullHandler :38-43, dbDriverValidator :46-51),
the parse + SELECT gate (queryValidator :26-35), connects
(base.go:38-66), executes via the RDBMS (sqltojson call :98) and writes
JSON (:106). Here the validation pipeline is the same shape, but
execution is Catalyst: ``spark.sql`` builds the logical plan lazily and
the optimizer owns pushdown/pruning/join selection (SURVEY.md §4.1) —
no custom rewrite code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from golang_db_query_engine_elasticsearch_indexer_spark.errors import (
    ParamsNullError,
    SqlSyntaxError,
)
from golang_db_query_engine_elasticsearch_indexer_spark.plans import assert_select_only
from golang_db_query_engine_elasticsearch_indexer_spark.result import (
    DEFAULT_MAX_ROWS,
    QueryResult,
    collect_envelope,
)
from golang_db_query_engine_elasticsearch_indexer_spark.session import SourceRegistry


def query_df(
    spark: SparkSession, sql: str, params: dict | None = None
) -> DataFrame:
    """Validated SQL → lazy DataFrame (no execution yet).

    The gate order mirrors query_controller.go:70-93: null check ->
    parse/syntax (400) -> SELECT-only (401). Returns the *unexecuted*
    plan so callers (HTTP response vs. indexer sink) choose the action;
    this is what removes the reference's self-HTTP-call hop (A9,
    elastic_controller.go:103-140) — the DataFrame is the handoff.

    ``params`` binds named parameter markers (``:name``) as TYPED
    LITERALS via Spark's parameterized SQL — the injection-safe
    improvement over the reference, which interpolates the raw query
    string end-to-end (query_controller.go:98): a hostile value like
    ``"F' OR '1'='1"`` stays one string literal instead of rewriting
    the predicate. The SELECT-only gate runs on the TEMPLATE (markers
    parse as expressions), so binding cannot smuggle a command past it.
    """
    if sql is None or not sql.strip():
        raise ParamsNullError()
    assert_select_only(spark, sql)
    if params:
        return spark.sql(sql, args=params)
    return spark.sql(sql)


def query(
    spark: SparkSession,
    sql: str,
    registry: SourceRegistry | None = None,
    db_driver: str | None = None,
    db_name: str | None = None,
    max_rows: int = DEFAULT_MAX_ROWS,
    params: dict | None = None,
) -> QueryResult:
    """Full GET /query/ semantics: resolve source, validate, run, envelope.

    ``db_driver``/``db_name`` are optional because a Spark catalog can
    already hold the tables (the reference always needs them since it
    owns no data; query_controller.go:55-58).
    """
    if registry is not None or db_driver is not None or db_name is not None:
        if registry is None or not db_driver or not db_name:
            raise ParamsNullError()
        registry.attach(spark, db_driver, db_name)
    return collect_envelope(query_df(spark, sql, params=params), max_rows=max_rows)


def es_search_df(spark: SparkSession, index: str, body: dict) -> DataFrame:
    """ES `_search` semantics as a first-class gateway verb: the JSON
    body a reference user POSTs to `/{index}/_search` compiles to a
    Catalyst plan over the table named ``index`` (operators/es_dsl.py:
    query context incl. BM25-scored match/multi_match, knn,
    search_after pagination, aggs up to three bucket levels with
    metric/pipeline/top_hits sub-aggs, composite paging, filters).
    Lazy, like query_df — the DataFrame is the handoff. Unsupported
    DSL raises ValueError before any execution; an empty body means
    match_all (ES default)."""
    from golang_db_query_engine_elasticsearch_indexer_spark.operators.es_dsl import (  # noqa: PLC0415
        compile_search,
    )

    if index is None or body is None:
        raise ParamsNullError()
    return spark.sql(compile_search(index, body, "spark"))


def es_search(
    spark: SparkSession,
    index: str,
    body: dict,
    max_rows: int = DEFAULT_MAX_ROWS,
) -> QueryResult:
    """`POST /{index}/_search` parity: compile, run, envelope."""
    return collect_envelope(es_search_df(spark, index, body), max_rows=max_rows)


def es_msearch(
    spark: SparkSession, searches: list[tuple[str, dict]]
) -> list[DataFrame]:
    """`POST /_msearch` parity: a batch of (index, body) searches
    compiled together, returned as a list of LAZY DataFrames in request
    order. Every body validates (loudly) before any plan executes —
    the all-or-nothing contract a batch API needs; execution stays
    caller-driven so the engine never runs half a batch implicitly."""
    if searches is None or any(
        ix is None or body is None for ix, body in searches
    ):
        raise ParamsNullError()
    return [es_search_df(spark, ix, body) for ix, body in searches]


def es_mapping(spark: SparkSession, index: str) -> dict:
    """`GET /{index}/_mapping` parity: the ES-style mapping of a
    registered table, derived from its Spark schema by the same rule
    the indexer's explicit-mapping create uses (indexer.
    es_mapping_for_schema) — so what the read API reports is exactly
    what the write path would create. Returns the ES response shape
    ``{index: {"mappings": {...}}}``."""
    from golang_db_query_engine_elasticsearch_indexer_spark.indexer import (  # noqa: PLC0415
        es_mapping_for_schema,
    )

    if index is None:
        raise ParamsNullError()
    return {index: {"mappings": es_mapping_for_schema(spark.table(index).schema)}}


def es_count(spark: SparkSession, index: str, body: dict | None = None) -> int:
    """`GET /{index}/_count` parity: matching-doc count under an
    optional query-context body (None/{} = match_all, the ES default).
    Returns the bare int — the `{"count": N}` envelope reduced to its
    payload."""
    from golang_db_query_engine_elasticsearch_indexer_spark.operators.es_dsl import (  # noqa: PLC0415
        compile_count,
    )

    if index is None:
        raise ParamsNullError()
    row = spark.sql(compile_count(index, body or {}, "spark")).collect()[0]
    return int(row["count"])


def cat_indices_sql(tables: tuple[str, ...], dialect: str) -> str:
    """One UNION ALL of per-table counts, ordered by index name — the
    relational body of `GET /_cat/indices`. Shared by the Spark verb
    and the DuckDB oracle so both engines run the same statement.
    Scale shape: each branch is a count(*) aggregate (a metadata-only
    scan on parquet sources); the union is bounded by catalog size,
    never data size."""
    if not tables:
        raise ParamsNullError()
    q = '`index`' if dialect == "spark" else '"index"'
    branches = "\nUNION ALL\n".join(
        f"SELECT '{t}' AS {q}, count(*) AS docs_count FROM {t}"
        for t in sorted(tables)
    )
    return f"{branches}\nORDER BY {q} ASC"


def cat_indices_df(spark: SparkSession) -> DataFrame:
    """`GET /_cat/indices` as a lazy DataFrame: (index, docs_count)
    for every registered fixture table present in the session catalog
    — the read-only index inventory the reference's users check daily
    beside _search/_count/_mapping. Catalog-driven (temp views the
    engine's own operators register, e.g. BM25 artifacts, are not
    indices and are excluded by the fixture-table intersection)."""
    from golang_db_query_engine_elasticsearch_indexer_spark.session import (  # noqa: PLC0415
        FIXTURE_TABLES,
    )

    present = tuple(
        t for t in FIXTURE_TABLES if spark.catalog.tableExists(t)
    )
    return spark.sql(cat_indices_sql(present, "spark"))


def cat_indices(spark: SparkSession) -> list[dict]:
    """`GET /_cat/indices?format=json` parity: the ES response shape —
    one object per index with health/status constants (this engine has
    no shard states) and the doc count. Bounded collect: one row per
    catalog table."""
    return [
        {
            "health": "green",
            "status": "open",
            "index": row["index"],
            "docs.count": int(row["docs_count"]),
        }
        for row in cat_indices_df(spark).collect()
    ]


def es_index_exists(spark: SparkSession, index: str) -> bool:
    """`HEAD /{index}` parity: does the index (registered table) exist.
    Catalog lookup only — no scan."""
    if index is None:
        raise ParamsNullError()
    return bool(spark.catalog.tableExists(index))


def es_get(
    spark: SparkSession, index: str, doc_id, id_field: str | None = None
) -> dict:
    """`GET /{index}/_doc/{id}` parity: fetch one document by id and
    return the ES get-API envelope ({_index, _id, found, _source}).
    The id column defaults to the table's FIRST column (every fixture
    table leads with its id; pass ``id_field`` to override). The
    filter is applied through the DataFrame API with a typed Python
    value — no string interpolation, so no injection surface — and
    pushes down to the scan (at 100 TB this is the point lookup
    partition pruning + parquet min/max stats exist for).
    Digit-shaped ids coerce to int to match BIGINT id columns."""
    import json as _json  # noqa: PLC0415

    from pyspark.sql import functions as F  # noqa: PLC0415

    if index is None or doc_id is None:
        raise ParamsNullError()
    df = spark.table(index)
    idc = id_field or df.columns[0]
    if idc not in df.columns:
        raise ParamsNullError(f"unknown id field {idc!r}")
    key = int(doc_id) if str(doc_id).lstrip("-").isdigit() else doc_id
    rows = df.filter(F.col(idc) == key).limit(1).toJSON().collect()
    out = {"_index": index, "_id": str(doc_id), "found": bool(rows)}
    if rows:
        out["_source"] = _json.loads(rows[0])
    return out


def es_analyze(text: str, analyzer: str = "standard") -> dict:
    """`POST /_analyze` parity: run the engine's analyzer (the SAME
    lowercase + whitespace split the DSL compiler applies to match
    queries at compile time — operators/es_dsl._analyze) over the text
    and return the ES token list with offsets/positions. Pure
    driver-side string work, no Spark job. Only the engine's one
    analyzer is served; other names raise (this engine does not
    silently substitute a different tokenization than it searches
    with)."""
    import re as _re  # noqa: PLC0415

    if text is None:
        raise ParamsNullError()
    if analyzer not in ("standard", "default"):
        raise SqlSyntaxError(
            f"es_dsl: unsupported analyzer {analyzer!r} (the engine "
            "analyzes with lowercase + whitespace split only)"
        )
    tokens = []
    for pos, m in enumerate(_re.finditer(r"\S+", text)):
        tokens.append({
            "token": m.group(0).lower(),
            "start_offset": m.start(),
            "end_offset": m.end(),
            "position": pos,
            "type": "<ALPHANUM>",
        })
    return {"tokens": tokens}


_ES_SQL_TYPES = {
    "long": "long", "double": "double", "boolean": "boolean",
    "date": "datetime", "binary": "binary", "text": "text",
    "object": "object",
}


def es_sql(
    spark: SparkSession, sql: str, fetch_size: int = DEFAULT_MAX_ROWS
) -> dict:
    """`POST /_sql` parity (the ES SQL API): run the statement through
    the SAME validate-before-execute gateway as `GET /query/` and
    return the ES response shape — ``{"columns": [{name, type}],
    "rows": [[...]]}``. Column types come from the analyzed Spark
    schema through the same rule the indexer's mapping create uses
    (es_mapping_for_schema), so `_sql`, `_mapping`, and the write path
    all declare one type story. The collect is bounded by fetch_size
    (the reference's unbounded-buffer failure mode stays refused)."""
    import json as _json  # noqa: PLC0415

    from golang_db_query_engine_elasticsearch_indexer_spark.indexer import (  # noqa: PLC0415
        es_mapping_for_schema,
    )

    df = query_df(spark, sql)
    props = es_mapping_for_schema(df.schema)["properties"]
    columns = [
        {"name": f.name,
         "type": _ES_SQL_TYPES.get(props[f.name]["type"], "text")}
        for f in df.schema.fields
    ]
    names = [f.name for f in df.schema.fields]
    rows = [
        [(_json.loads(r) or {}).get(n) for n in names]
        for r in df.limit(int(fetch_size)).toJSON().collect()
    ]
    return {"columns": columns, "rows": rows}


def es_validate_query(spark: SparkSession, index: str, body: dict) -> dict:
    """`POST /{index}/_validate/query` parity: compile-only check of a
    query-context body — {"valid": true} or {"valid": false, "error":
    ...}. Runs the SAME compiler as _search (nothing executes), plus a
    Spark analysis pass so unknown fields/tables invalidate too, as in
    ES."""
    from golang_db_query_engine_elasticsearch_indexer_spark.operators.es_dsl import (  # noqa: PLC0415
        compile_search,
    )

    if index is None or body is None:
        raise ParamsNullError()
    try:
        df = spark.sql(compile_search(index, {"query": body.get(
            "query", {"match_all": {}})}, "spark"))
        df.schema  # force analysis: unknown columns/tables surface here
    except Exception as exc:  # noqa: BLE001 — the point IS the envelope
        return {"valid": False, "error": str(exc)[:500]}
    return {"valid": True}


def es_mget(
    spark: SparkSession, index: str, ids: list, id_field: str | None = None
) -> dict:
    """`POST /{index}/_mget` parity: batch get-by-id — ONE filtered
    scan (`IN` predicate pushed down), results re-ordered to request
    order with found:false placeholders, the ES docs envelope. Bounded
    by the request's id count, capped to keep the collect honest."""
    import json as _json  # noqa: PLC0415

    from pyspark.sql import functions as F  # noqa: PLC0415

    if index is None or not isinstance(ids, list) or not ids:
        raise ParamsNullError()
    if len(ids) > 10_000:
        raise SqlSyntaxError("es_dsl: _mget is capped at 10000 ids")
    df = spark.table(index)
    idc = id_field or df.columns[0]
    keys = [int(i) if str(i).lstrip("-").isdigit() else i for i in ids]
    rows = df.filter(F.col(idc).isin(keys)).toJSON().collect()
    by_id = {}
    for r in rows:
        src = _json.loads(r)
        by_id[str(src.get(idc))] = src
    return {"docs": [
        {"_index": index, "_id": str(i), "found": str(k) in by_id,
         **({"_source": by_id[str(k)]} if str(k) in by_id else {})}
        for i, k in zip(ids, keys)
    ]}
