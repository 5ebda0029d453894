"""Multi-dimensional data layout: Z-order (Morton) clustering.

At 100 TB the scan bill is decided before the first executor runs, by
how the writer laid the files out: parquet row-group zone maps
(min/max) prune only when values are clustered, and a single-column
sort clusters exactly one dimension. Z-ordering interleaves the bits of
two (or more) normalized columns so that sorting by the ONE derived
z-value co-clusters BOTH dimensions — every file then covers a bounded
rectangle of (customer, order-day) space and a filter on either column
prunes files. The reference delegates layout to MySQL's clustered PK
(one dimension, `api/controllers/query_controller.go:98` just passes
SQL through); this operator owns it.

Kernel: normalize each dimension to an 8-bit coordinate with integer
arithmetic (value * 256 // (max+1) — scale-free, no floats anywhere),
interleave to a 16-bit Morton code, and sort/range-partition by it.
:func:`zorder_values` is the per-row kernel the write path uses
(`repartitionByRange(zval).sortWithinPartitions(zval)` → parquet);
:func:`zorder_profile` is the registry entry — the per-z-bucket
occupancy profile (row count + per-dimension span) that makes the
clustering guarantee visible and oracle-checkable: fixing the top 6
z-bits confines each bucket to a 32x32 rectangle of the 256x256
coordinate grid, so every bucket's spans are bounded by construction.

Everything is integer arithmetic shared across dialects (shift/mask
spelled per dialect, same bit semantics) — hash-safe with no float
discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ZBITS = 8  # per-dimension coordinate width; z-value is 2*ZBITS wide
ZBUCKET_SHIFT = 10  # profile groups by the top 6 z-bits -> 64 buckets
_EPOCH = "1992-01-01"


def _interleave_expr(x: str, y: str, *, dialect: str) -> str:
    """Morton-interleave two ZBITS-wide ints: bit i of ``x`` lands at
    position 2i, bit i of ``y`` at 2i+1. Disjoint bits, so + == |."""
    terms = []
    for i in range(ZBITS):
        if dialect == "spark":
            terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def _coords_sql(*, dialect: str) -> str:
    """Per-order 8-bit (customer, order-day) coordinates. Integer
    scaling by the column max keeps the kernel scale-free: the same
    query is correct at sf0.001 and at 100 TB."""
    if dialect == "spark":
        day = f"datediff(o_orderdate, DATE '{_EPOCH}')"
        idiv = "div"
    else:
        day = f"date_diff('day', TIMESTAMP '{_EPOCH} 00:00:00', o_orderdate)"
        idiv = "//"
    return f"""
bounds AS (
  SELECT max(o_custkey) AS max_cust, max({day}) AS max_day FROM orders
),
coords AS (
  SELECT o_orderkey,
         CAST((o_custkey * 256) {idiv} (b.max_cust + 1) AS BIGINT) AS cb,
         CAST(({day} * 256) {idiv} (b.max_day + 1) AS BIGINT) AS dy
  FROM orders CROSS JOIN bounds b
)
"""


def _zval_sql(*, dialect: str) -> str:
    return (
        "WITH "
        + _coords_sql(dialect=dialect).strip()
        + f""",
zvals AS (
  SELECT o_orderkey, cb, dy,
         CAST({_interleave_expr("cb", "dy", dialect=dialect)} AS BIGINT) AS zval
  FROM coords
)
"""
    )


def zorder_values(spark: SparkSession) -> DataFrame:
    """Per-row z-values over orders: (o_orderkey, cb, dy, zval). The
    write path sorts by ``zval`` (repartitionByRange + in-partition
    sort) so parquet zone maps bound BOTH source dimensions per file."""
    return spark.sql(
        _zval_sql(dialect="spark") + "SELECT o_orderkey, cb, dy, zval FROM zvals"
    )


def write_zordered(spark: SparkSession, path: str, num_files: int = 8) -> None:
    """Write orders z-clustered on (customer, order-day): range
    partition by zval, sort within each partition — each output file's
    (min, max) footer then covers a bounded rectangle of both
    dimensions, which is what makes either-column filters prunable."""
    df = zorder_values(spark)
    (
        df.repartitionByRange(num_files, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(path)
    )


_PROFILE_TAIL = f"""
SELECT CAST(zval >> {ZBUCKET_SHIFT} AS BIGINT) AS z_bucket,
       count(*) AS n_rows,
       min(cb) AS cust_lo, max(cb) AS cust_hi,
       min(dy) AS day_lo, max(dy) AS day_hi
FROM zvals
GROUP BY 1
ORDER BY z_bucket
"""


def zorder_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Occupancy + per-dimension span of each of the 64 top-level
    z-buckets. Bounded spans (<= 32 of 256 per dimension) are the
    clustering contract the layout delivers to the scan planner."""
    tail = _PROFILE_TAIL.replace(
        f"zval >> {ZBUCKET_SHIFT}", f"shiftright(zval, {ZBUCKET_SHIFT})"
    )
    return spark.sql(_zval_sql(dialect="spark") + tail)


def _profile_oracle() -> str:
    return _zval_sql(dialect="duckdb") + _PROFILE_TAIL


def registry() -> dict[str, dict]:
    return {
        "layout_zorder_orders": {
            "fn": zorder_profile,
            "oracle": _profile_oracle(),
        },
    }
