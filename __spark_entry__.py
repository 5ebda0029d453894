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
# in insertion order. Cumulative coverage: r01 verified the 50 core-SQL
# entries, r02 the operator-registry/streaming/analytics entries. Round 3
# front-loads (a) the six r02 hash-fails (dtype casts fixed this round),
# (b) the 16 entries never yet driver-checked, (c) every entry whose
# semantics changed this round (de-vacuoused q22, k-means IVF, higher-recall
# near-dup and its dependents, single-pass shingle dedup), then (d) a
# re-verification batch of r01 greens. The rows-only sketch entry sits at
# slot 50. Out-of-window entries keep regression coverage via the full
# 116-entry differential gate in tests/test_oracle_queries.py (sf0.01).
_PRIORITY: tuple[str, ...] = (
    # (a) r02 hash-fails, dtype-aligned this round
    "embedding_quantize_int8",
    "sample_weighted_mix",
    "split_train_val_test",
    "pack_sequences_chunked",
    "search_hybrid_rrf",
    "basket_part_affinity",
    # (b) never driver-checked before this round
    "json_functions",
    "events_time_bucket",
    "join_natural",
    "join_lateral_topk",
    "win_rows_frame",
    "win_range_frame",
    "win_first_last_value",
    "win_percent_rank_cume_dist",
    "set_except_all",
    "unpivot_stack",
    "q7_volume_shipping",
    "q9_product_type_profit",
    "q12_priority_shipping",
    "q14_promo_revenue",
    "q19_disjunctive_predicates",
    # (c) semantics touched in round 3
    "q22_dormant_customers",
    "ann_ivf_topk",
    "embedding_neardup_pairs",
    "dedup_semantic_survivors",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    # (d) r01-green re-verification batch
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "proj_distinct",
    "filter_in_between_like",
    "filter_null_handling",
    "filter_null_safe_eq",
    "filter_regexp",
    "join_left_outer",
    "join_full_outer",
    "join_cross",
    "join_semi_exists",
    "join_anti_not_exists",
    "join_non_equi_theta",
    "join_using",
    "subquery_scalar",
    "subquery_correlated_scalar",
    "subquery_in",
    "with_cte",
    "agg_rollup",
    # rows-only sketch entry: weaker check, last window slot
    "agg_approx_sketches",
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
