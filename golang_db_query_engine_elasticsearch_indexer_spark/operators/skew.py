"""Skew tools: salted join for hot keys AQE can't fix alone.

At 100 TB a single hot join key (the null-user, the default tenant,
the viral document) concentrates one shuffle partition onto one task.
AQE's skew-join splitting (on by default in ``session.build_session``)
handles sort-merge cases by splitting oversized partitions; salting is
the explicit fallback that also works for shuffled-hash joins and for
aggregations: spread the big side's hot key across S buckets and
replicate the matching small-side rows S times.

Pure DataFrame combinator — no shuffle beyond the join's own, the
replication factor multiplies only the SMALL side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join with the big side salted across ``salt_buckets``.

    The big side's salt is a deterministic hash of the whole row (so
    rows with the SAME hot key land in DIFFERENT buckets); the small
    side is exploded once per bucket. Result equals ``big.join(small,
    on, how)`` for inner/left joins — verified property-style in
    tests/test_skew.py.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (the skewed-side-preserving shapes)")
    big_salted = big.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    )
    small_salted = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    joined = big_salted.join(small_salted, [*keys, SALT_COL], how)
    return joined.drop(SALT_COL)


def salted_join_agg(spark, sf_dir: str) -> DataFrame:
    """Driver-gated demonstration that salting preserves semantics: the
    salted lineitem⋈supplier join rolled up to per-nation revenue must
    hash-match the PLAIN join's SQL oracle — the equivalence the
    combinator promises, verified end-to-end at the differential gate
    rather than only property-style in tests."""
    big = spark.table("lineitem").select("l_suppkey", "l_extendedprice", "l_discount")
    small = spark.table("supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    return (
        salted_join(big, small, "l_suppkey")
        .groupBy("s_nationkey")
        .agg(
            F.round(
                F.sum(F.expr("l_extendedprice * (1 - l_discount)")), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("s_nationkey")
    )


SALTED_JOIN_ORACLE = """
SELECT s_nationkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_nationkey
ORDER BY s_nationkey
"""


def registry() -> dict[str, dict]:
    return {
        "skew_salted_join_agg": {"fn": salted_join_agg, "oracle": SALTED_JOIN_ORACLE},
    }
