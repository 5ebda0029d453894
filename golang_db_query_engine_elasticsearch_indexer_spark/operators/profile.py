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


# --- declarative data-quality expectations (dbt-test / GE style) -----------
#
# Named per-table constraints evaluated as conditional aggregates — ONE
# scan per table regardless of how many checks it carries (the stack
# unpivot shape above), emitting (check, n_violations) rows. A
# pipeline gates promotion on `max(n_violations) == 0`; at 100 TB each
# table contributes one partial-aggregated scan, and adding a check is
# adding a column, not a pass. Checks are written to PASS on the
# fixture so the zero rows are the contract (violation-counting itself
# is proven by a planted-violation test).
EXPECTATIONS: dict[str, dict[str, str]] = {
    "documents": {
        "doc_id_not_null": "doc_id IS NULL",
        "text_not_null": "text IS NULL",
        "n_chars_consistent": "n_chars <> length(text)",
        "lang_known": "lang NOT IN ('en', 'de', 'es', 'fr', 'zh')",
    },
    "orders": {
        "totalprice_positive": "o_totalprice <= 0",
        "orderdate_not_null": "o_orderdate IS NULL",
    },
    "lineitem": {
        "quantity_in_range": "l_quantity < 1 OR l_quantity > 50",
        "discount_in_range": "l_discount < 0 OR l_discount > 0.1",
    },
}
# Uniqueness needs count(DISTINCT), not a row predicate — kept separate
# so the row checks stay a single partial-aggregate pass.
UNIQUE_KEYS = {"documents": "doc_id", "orders": "o_orderkey"}


def _spark_expectations_sql() -> str:
    ctes, stacks = [], []
    for table, checks in EXPECTATIONS.items():
        aggs = [
            f"cast(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS v_{name}"
            for name, pred in checks.items()
        ]
        if table in UNIQUE_KEYS:
            k = UNIQUE_KEYS[table]
            aggs.append(
                f"cast(count({k}) - count(DISTINCT {k}) AS BIGINT) AS v_{k}_unique"
            )
        ctes.append(f"agg_{table} AS (SELECT {', '.join(aggs)} FROM {table})")
        names = list(checks) + (
            [f"{UNIQUE_KEYS[table]}_unique"] if table in UNIQUE_KEYS else []
        )
        args = ", ".join(f"'{table}.{n}', v_{n}" for n in names)
        stacks.append(
            f"SELECT stack({len(names)}, {args}) AS (check_name, n_violations)"
            f" FROM agg_{table}"
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + "\nUNION ALL\n".join(stacks)
        + "\nORDER BY check_name"
    )


def audit_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(check_name, n_violations) for every declared expectation."""
    return spark.sql(_spark_expectations_sql())


def _duck_expectations_oracle() -> str:
    selects = []
    for table, checks in EXPECTATIONS.items():
        for name, pred in checks.items():
            selects.append(
                f"SELECT '{table}.{name}' AS check_name, "
                f"cast(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT)"
                f" AS n_violations FROM {table}"
            )
        if table in UNIQUE_KEYS:
            k = UNIQUE_KEYS[table]
            selects.append(
                f"SELECT '{table}.{k}_unique', "
                f"cast(count({k}) - count(DISTINCT {k}) AS BIGINT) FROM {table}"
            )
    return "\nUNION ALL\n".join(selects) + "\nORDER BY check_name"


def registry() -> dict[str, dict]:
    return {
        "profile_orders": {
            "fn": profile_orders,
            "oracle": _duck_profile_oracle(),
        },
        "audit_expectations": {
            "fn": audit_expectations,
            "oracle": _duck_expectations_oracle(),
        },
    }
