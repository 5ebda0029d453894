"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()``
exposes every implemented operator from SURVEY.md §2 as
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the DuckDB
equivalent the driver hash-compares at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from golang_db_query_engine_elasticsearch_indexer_spark import inventory
from golang_db_query_engine_elasticsearch_indexer_spark.gateway import query_df
from golang_db_query_engine_elasticsearch_indexer_spark.session import register_sf_dir


def _configure(spark: SparkSession) -> None:
    """Apply engine session settings the driver's stock session may lack."""
    for k, v in [
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.timestampType", "TIMESTAMP_NTZ"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.adaptive.enabled", "true"),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass


# The driver's CORRECTNESS gate hash-checks the FIRST 50 keys of queries()
# in insertion order. Round 1 verified the 50 core-SQL entries (all green in
# CORRECTNESS_r01.json); round 2 rotates the previously unchecked high-value
# entries to the front: every operator-registry op (LLM pipeline, dedup, ANN,
# search, indexer, as-of), the streaming set, and the richest unchecked SQL
# analytics. Entries already driver-verified in r01 go last.
_PRIORITY: tuple[str, ...] = (
    # §2.C LLM-pipeline / dedup / similarity / text / multimodal operators
    "dedup_exact",
    "dedup_normalized",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "embedding_quantize_int8",
    "ann_brute_force_topk",
    "ann_lsh_bucket_topk",
    "ann_ivf_topk",
    "embedding_neardup_pairs",
    "embedding_label_centroids",
    "text_token_count",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_unigram_logprob",
    "multimodal_binary_features",
    "multimodal_resize_pooled",
    "multimodal_frame_sample",
    "asof_join_events_orders",
    "pipeline_curate_corpus",
    "dedup_semantic_survivors",
    "sample_stratified",
    "sample_weighted_mix",
    "split_train_val_test",
    "pack_sequences_chunked",
    "tokens_top_terms",
    "decontam_benchmark_overlap",
    "search_bm25",
    "search_hybrid_rrf",
    "indexer_positional_ids",
    # streaming (real bounded streams vs batch oracles)
    "stream_tumbling_counts",
    "stream_sliding_counts",
    "stream_session_counts",
    "stream_dedup_counts",
    "stream_dedup_within_watermark",
    "stream_stateful_user_summary",
    # richest previously-unchecked SQL analytics
    "events_sessionization",
    "events_funnel",
    "events_cohort_retention",
    "basket_part_affinity",
    # extended TPC-H shapes not in the r01 window
    "q4_order_priority",
    "q8_market_share",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
)


def _prioritized(d: dict) -> dict:
    """Reorder dict: _PRIORITY names first (in that order), rest unchanged."""
    out = {k: d[k] for k in _PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def _sql_runner(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _configure(spark)
        register_sf_dir(spark, sf_dir)
        return query_df(spark, sql)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _configure(spark)
    register_sf_dir(spark, "/root/testdata/sf0.001")
    return query_df(spark, inventory.flagship_sql())


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, spec in inventory.SQL_QUERIES.items():
        out[name] = _sql_runner(spec["sql"])
    try:
        from golang_db_query_engine_elasticsearch_indexer_spark.operators import (
            registry as op_registry,
        )

        for name, spec in op_registry().items():
            fn = spec["fn"]

            def run(spark, sf_dir, _fn=fn):
                _configure(spark)
                register_sf_dir(spark, sf_dir)
                return _fn(spark, sf_dir)

            out[name] = run
    except ImportError:
        pass
    return _prioritized(out)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable equivalents; omitted => weaker rows-only check."""
    out: dict[str, str] = {}
    for name, spec in inventory.SQL_QUERIES.items():
        if spec.get("oracle"):
            out[name] = spec["oracle"]
    try:
        from golang_db_query_engine_elasticsearch_indexer_spark.operators import (
            registry as op_registry,
        )

        for name, spec in op_registry().items():
            if spec.get("oracle"):
                out[name] = spec["oracle"]
    except ImportError:
        pass
    return _prioritized(out)
