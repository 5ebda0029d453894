"""Table profiling: ANALYZE-style per-column statistics in one scan.

The reference delegates all planning statistics to MySQL/ES; a
standalone engine needs its own (`ANALYZE TABLE` feeds Catalyst's CBO,
and corpus pipelines cut schema-drift/null-rate alarms from the same
numbers). :func:`profile_table` computes per-column null counts,
exact distinct counts, and min/max in ONE scan — the wide-aggregate +
``stack`` unpivot shape — rather than a scan per column.

Scale notes: multiple exact ``count(DISTINCT)`` in one aggregate go
through Catalyst's EXPAND (input multiplied by the number of distinct
aggregates before the shuffle) — the honest cost of exactness; swap to
``approx_count_distinct`` per column at 100 TB when ±2% suffices (the
plan then stays a single partial-aggregate pass). min/max/null-counts
partial-aggregate map-side regardless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")


def _spark_profile_sql(table: str, cols) -> str:
    aggs = []
    for c in cols:
        aggs += [
            f"count(*) - count({c}) AS nulls_{c}",
            f"count(DISTINCT {c}) AS dist_{c}",
            f"cast(min({c}) AS string) AS min_{c}",
            f"cast(max({c}) AS string) AS max_{c}",
        ]
    stack_args = ", ".join(
        f"'{c}', nulls_{c}, dist_{c}, min_{c}, max_{c}" for c in cols
    )
    return f"""
        WITH agg AS (SELECT {", ".join(aggs)} FROM {table})
        SELECT stack({len(cols)}, {stack_args})
               AS (col, n_nulls, n_distinct, min_value, max_value)
        FROM agg
        ORDER BY col
    """


def profile_table(
    spark: SparkSession, table: str, cols=PROFILE_COLS
) -> DataFrame:
    """Per-column (n_nulls, n_distinct exact, min, max) for ``cols`` of
    ``table``, one scan, unpivoted to a row per column."""
    return spark.sql(_spark_profile_sql(table, cols))


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: profile the orders table's key columns."""
    return profile_table(spark, "orders")


def _duck_profile_oracle(table: str = "orders", cols=PROFILE_COLS) -> str:
    selects = [
        f"""SELECT '{c}' AS col,
       count(*) - count({c}) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct,
       cast(min({c}) AS varchar) AS min_value,
       cast(max({c}) AS varchar) AS max_value
FROM {table}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(selects) + "\nORDER BY col"


def registry() -> dict[str, dict]:
    return {
        "profile_orders": {
            "fn": profile_orders,
            "oracle": _duck_profile_oracle(),
        },
    }
