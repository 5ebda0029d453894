"""Skew handling: salted-join equivalence and AQE skew-split evidence
(SCALE.md §1/§3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from golang_db_query_engine_elasticsearch_indexer_spark.operators.skew import (
    salted_join,
)


@pytest.fixture()
def skewed(spark):
    # 5000 rows on a hot key + a uniform tail; small dim with 6 keys
    big = spark.range(6000).select(
        F.when(F.col("id") < 5000, F.lit(1))
        .otherwise((F.col("id") % 5) + 1)
        .alias("k"),
        (F.col("id") * 7).alias("payload"),
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(1, 7)], "k long, name string"
    )
    return big, small


def test_salted_inner_join_equals_plain(spark, skewed):
    big, small = skewed
    plain = big.join(small, "k").select("k", "payload", "name")
    salted = salted_join(big, small, "k").select("k", "payload", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark, skewed):
    big, small = skewed
    big2 = big.union(spark.createDataFrame([(99, 0)], "k long, payload long"))
    out = salted_join(big2, small, "k", how="left")
    unmatched = [r for r in out.collect() if r.k == 99]
    assert len(unmatched) == 1 and unmatched[0].name is None


def test_salt_spreads_hot_key(spark, skewed):
    big, _ = skewed
    from golang_db_query_engine_elasticsearch_indexer_spark.operators.skew import (
        SALT_COL,
    )

    salted = big.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(16))
    )
    buckets = (
        salted.where("k = 1").groupBy(SALT_COL).count().collect()
    )
    assert len(buckets) == 16  # hot key occupies every salt bucket
    counts = [r["count"] for r in buckets]
    assert max(counts) < 5000 * 0.2  # no bucket holds the whole hot key


def test_aqe_skew_join_splits_partition(spark):
    """With thresholds shrunk to toy scale, AQE must mark the hot
    partition of a sort-merge join as skewed and split it.

    Shape notes (found the hard way): the plan must be inspected on the
    SAME DataFrame whose action ran (``.count()`` builds a different
    query tree, leaving this one isFinalPlan=false), and the payload
    must survive column pruning into the shuffle — a pruned-to-one-
    constant-column hot partition lz4-compresses below any threshold.
    """
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(6000).select(
            F.when(F.col("id") < 5000, F.lit(1))
            .otherwise((F.col("id") % 5) + 1)
            .alias("k"),
            F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("payload"),
        )
        other = spark.range(9000).select(
            (F.col("id") % 9 + 1).alias("k"), (F.col("id") * 3).alias("p2")
        )
        agg = (
            big.join(other, "k")
            .groupBy()
            .agg(F.sum("payload"), F.sum("p2"), F.count("*").alias("n"))
        )
        assert agg.collect()[0]["n"] == 6_000_000
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:1500]
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
