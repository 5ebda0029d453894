"""DataFrame-API operators beyond the SQL surface.

North-star extensions (SURVEY.md §2.C + BASELINE.json): dedup,
similarity search, text analysis, multimodal plumbing, as-of join.
Each submodule contributes entries to :func:`registry` —
``name -> {"fn": (spark, sf_dir) -> DataFrame, "oracle": duckdb_sql|None}``
— merged into the driver contract by ``__spark_entry__``.
"""

from __future__ import annotations


def registry() -> dict[str, dict]:
    out: dict[str, dict] = {}
    from golang_db_query_engine_elasticsearch_indexer_spark.operators import (  # noqa: PLC0415
        asof,
        chunking,
        decontam,
        dedup,
        es_dsl,
        esql,
        graph,
        layout,
        multimodal,
        sampling,
        search,
        sequence,
        similarity,
        skew,
        text,
    )

    from golang_db_query_engine_elasticsearch_indexer_spark.operators import (  # noqa: PLC0415
        materialized,
        pipeline,
        profile,
    )

    for mod in (dedup, similarity, text, multimodal, asof, pipeline, sampling, decontam, search, chunking, skew, profile, graph, layout, sequence, materialized, es_dsl, esql):
        out.update(mod.registry())

    from golang_db_query_engine_elasticsearch_indexer_spark import (  # noqa: PLC0415
        indexer,
        streaming,
    )

    out.update(indexer.query_registry())
    out.update(streaming.registry())
    return out
