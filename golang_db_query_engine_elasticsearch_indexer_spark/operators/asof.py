"""As-of join: for each event, the most recent order at or before it.

The reference surface has no as-of operator (SURVEY.md §2.B "Joins —
range/as-of": not a MySQL 5.x/8 concept); this is the extension row.
Spark lacks a native ASOF JOIN, so we implement the classic
union-and-carry-forward composition (SURVEY.md §2.B suggests
union+window): tag both sides, sort within the join key by time, and
carry the last order id forward onto event rows with
``last(..., ignorenulls)``.

Scale: ONE shuffle on the join key (window partition), no range
explosion — each row is touched once. This beats bucketized range
joins when the right side fits the same partitioning.

Oracle: DuckDB's native ``ASOF LEFT JOIN`` — an independent
implementation of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, matched_order): latest order with
    o_custkey = user_id AND o_orderdate <= ts; ties on o_orderdate
    resolved to max(o_orderkey) on both sides for determinism."""
    orders = (
        spark.table("orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    events = spark.table("events")

    left = events.select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("t"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(1).alias("is_event"),
    )
    right = orders.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey"),
        F.lit(0).alias("is_event"),
    )
    # At equal t, orders sort before events (is_event 0 < 1) so an
    # order dated exactly at ts matches; equal-dated orders carry the
    # larger orderkey last (o_orderkey ascending) — but orders were
    # pre-deduped per (key, t) above, so the tiebreak is total.
    w = (
        Window.partitionBy("key")
        .orderBy("t", "is_event", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = left.unionByName(right).withColumn(
        "matched_order", F.last("o_orderkey", ignorenulls=True).over(w)
    )
    return (
        carried.where(F.col("is_event") == 1)
        .select("event_id", "matched_order")
        .orderBy("event_id")
    )


ASOF_ORACLE = """
WITH od AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, o.o_orderkey AS matched_order
FROM events e
ASOF LEFT JOIN od o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY event_id
"""


def registry() -> dict[str, dict]:
    return {
        "asof_join_events_orders": {"fn": asof_events_orders, "oracle": ASOF_ORACLE},
    }
