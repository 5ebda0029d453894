"""Scale-posture evidence: bucketing the two big fact tables on the
join key removes the join shuffle entirely (SCALE.md §2).

At 100 TB the lineitem⋈orders edge is the dominant shuffle; bucketed
layout moves that cost to write time, once. This test materializes
bucketed copies at sf0.001 and asserts the join plan contains no
Exchange on either side.
"""

from __future__ import annotations

import uuid

import pytest


@pytest.fixture()
def bucketed_tables(spark, tables):
    suffix = uuid.uuid4().hex[:6]
    li, od = f"li_b_{suffix}", f"od_b_{suffix}"
    (
        spark.table("lineitem")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable(li)
    )
    (
        spark.table("orders")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable(od)
    )
    yield li, od
    spark.sql(f"DROP TABLE IF EXISTS {li}")
    spark.sql(f"DROP TABLE IF EXISTS {od}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li, od = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.sql(
            f"""
            SELECT o_orderkey, count(*) AS n, round(sum(l_extendedprice), 2) AS total
            FROM {li} JOIN {od} ON l_orderkey = o_orderkey
            GROUP BY o_orderkey
            """
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucketed SMJ: both sides scan pre-bucketed files; the only
        # acceptable plan has no shuffle before the join (the group-by
        # on the same key also reuses the bucketing)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:2000]
        # and it still computes the right thing
        unbucketed = spark.sql(
            """
            SELECT o_orderkey, count(*) AS n, round(sum(l_extendedprice), 2) AS total
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderkey
            """
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, unbucketed.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
