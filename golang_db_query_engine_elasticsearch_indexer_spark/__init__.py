"""PySpark-native analytics engine with the capabilities of
rakeshkhetwal/golang-db_query_engine-elasticsearch-indexer.

The reference (see SURVEY.md) is a Go HTTP service: a validated SQL
pass-through gateway (``GET /query/``) plus an Elasticsearch bulk
indexer (``POST /elastic/save/``). This package internalizes what the
reference delegates: Spark SQL executes the accepted-SQL surface the
reference's parse gate admits, and a DataFrame sink pipeline replaces
the ``esutil.BulkIndexer`` dataflow — one lineage from source scan to
bulk write, no driver-side materialization.

Layout
------
- ``session``   SparkSession factory + source registry (ref: base.go:38-66)
- ``gateway``   validation pipeline + query entry (ref: query_controller.go:54-107)
- ``result``    canonical JSON result envelope (ref: responses.go:9-27)
- ``errors``    typed errors → HTTP codes (ref: error_handler.go:18-39)
- ``indexer``   bulk indexing pipeline + pluggable sinks (ref: elastic_controller.go:143-250)
- ``plans``     logical-plan inspection (SELECT-only gate, explain helpers)
- ``sources``   named source backends (parquet dirs, jdbc seam)
- ``operators`` dedup / similarity / text analysis / multimodal / as-of
- ``streaming`` structured-streaming extensions over the events table
- ``api``       HTTP routes mirroring routes.go:9-15
"""

from golang_db_query_engine_elasticsearch_indexer_spark.errors import (
    EngineError,
    IncorrectDbDriverError,
    ParamsNullError,
    SqlSyntaxError,
    UnauthorizedOperationError,
)
from golang_db_query_engine_elasticsearch_indexer_spark.gateway import (
    es_count,
    es_mapping,
    es_msearch,
    es_search,
    es_search_df,
    query,
    query_df,
)
from golang_db_query_engine_elasticsearch_indexer_spark.session import (
    SourceRegistry,
    build_session,
)

__all__ = [
    "es_count",
    "es_mapping",
    "es_msearch",
    "es_search",
    "es_search_df",
    "EngineError",
    "IncorrectDbDriverError",
    "ParamsNullError",
    "SqlSyntaxError",
    "UnauthorizedOperationError",
    "SourceRegistry",
    "build_session",
    "query",
    "query_df",
]

__version__ = "0.1.0"
