"""Distributed graph analytics over relational fixtures.

The reference delegates every computation to MySQL
(`api/controllers/query_controller.go:98`), which has no iterative
operators at all; a corpus/curation engine needs graph shapes —
influence ranking over an entity graph, bounded-hop reachability over a
co-occurrence graph — that SQL-92 cannot express but Spark executes
well. Two kernels:

- :func:`pagerank_nations` — damped weighted PageRank over the
  nation->nation trade network. The ONLY heavy stage is the edge
  aggregation (one shuffle keyed on the edge endpoints with map-side
  partial aggregation); the edge relation itself is bounded by
  |nation|^2 = 625 rows at ANY scale factor, so it collapses to a
  constant-folded literal (the same driver-resident-artifact pattern as
  the IVF centroid literal, `similarity.py`) and the five rank
  iterations are literal-only arithmetic — lineitem is scanned exactly
  once. A naive unrolled-CTE formulation re-scans the fact table once
  per iteration (measured: 5 scans; Spark inlines WITH references and
  per-reference column pruning defeats exchange reuse), which is the
  difference between 1x and Kx the 100 TB scan bill.
- :func:`copurchase_hops` — bounded-hop BFS (min-distance label
  propagation) over the part co-purchase graph. Edges scale with the
  fact table (per-order fan-out is capped by lineitems-per-order, ~7 in
  TPC-H-shaped data, so |edges| is O(|lineitem|)) — too big to
  collect, so the edge list is built once, persisted for the fixed
  number of frontier expansions, and released after an eager
  localCheckpoint freezes the result (the convergence-loop discipline
  of `dedup.py::duplicate_components`). Each iteration is one
  node-keyed join + min-aggregate; the frontier relation is
  node-cardinality, orders of magnitude smaller than the input.

For unbounded-depth traversals use the convergence-guarded
connected-components kernel (`operators/dedup.py`); fixed-depth
iteration is the right tool only when the hop/iteration budget is part
of the query contract, as it is here.

Float discipline (PageRank): edge weights round to 9 dp after the
out-degree normalization and every iteration rounds the rank vector to
9 dp in BOTH dialects, so sub-ULP summation-order differences between
Spark's partial aggregates and DuckDB's cannot compound across
iterations; the surfaced rank rounds to 6 dp (the repo-wide boundary
discipline). Collected edge weights round-trip into the literal via
repr() — correctly-rounded shortest decimal, bit-identical on parse.
BFS is pure integer arithmetic — no float discipline needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 5
BFS_MAX_HOPS = 3

# Nation->nation trade edges, out-weight-normalized: revenue per
# (supplier nation, customer nation) — the q7 join spine without the
# year filter — then a window over the source normalizes each nation's
# out-edges to transition probabilities. Dialect-shared text.
_EDGES_CTE = """
rev AS (
  SELECT sn.n_name AS src, cn.n_name AS dst,
         sum(l.l_extendedprice * (1 - l.l_discount)) AS rev
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  GROUP BY sn.n_name, cn.n_name
),
w AS (
  SELECT src, dst, round(rev / sum(rev) OVER (PARTITION BY src), 9) AS w
  FROM rev
),
nodes AS (SELECT n_name AS node FROM nation),
cn AS (SELECT count(*) AS n FROM nation)
"""


def _pagerank_iter_sql(n_nodes: int, w_relation: str, nodes_relation: str) -> str:
    """PAGERANK_ITERS unrolled damped-PageRank iterations over the given
    edge/node relations: rank_{t+1}(c) = (1-d)/N + d * (sum_s
    rank_t(s) * w(s, c) + dangling_t / N), where dangling_t is the rank
    mass sitting on nodes with no out-edges — redistributed uniformly,
    the standard treatment, so total mass conserves to the rounding
    (at small scale factors many nations have no outgoing trade; drop
    the term and the rank vector silently decays). Rank rounded to 9 dp
    per iteration."""
    d = PAGERANK_DAMPING
    parts = [
        f"outs AS (SELECT DISTINCT src AS node FROM {w_relation})",
        f"r0 AS (SELECT node, round(1.0 / {n_nodes}, 9) AS pr FROM {nodes_relation})",
    ]
    for i in range(1, PAGERANK_ITERS + 1):
        parts.append(
            f"""dm{i} AS (
  SELECT coalesce(sum(p.pr), 0) AS dm
  FROM r{i - 1} p LEFT JOIN outs o ON o.node = p.node
  WHERE o.node IS NULL
)"""
        )
        parts.append(
            f"""r{i} AS (
  SELECT n.node,
         round((1 - {d}) / {n_nodes}
               + {d} * (coalesce(sum(p.pr * w.w), 0) + dd.dm / {n_nodes}), 9) AS pr
  FROM {nodes_relation} n
  CROSS JOIN dm{i} dd
  LEFT JOIN {w_relation} w ON w.dst = n.node
  LEFT JOIN r{i - 1} p ON p.node = w.src
  GROUP BY n.node, dd.dm
)"""
        )
    return ",\n".join(parts) + (
        f"\nSELECT node, round(pr, 6) AS pagerank\n"
        f"FROM r{PAGERANK_ITERS}\n"
        f"ORDER BY pagerank DESC, node"
    )


def pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Influence rank of each nation in the trade network (who receives
    value from already-important senders).

    The distributed stage runs once: the edge aggregation over the fact
    table. Its 625-row-bounded result is collected (control-flow-scale,
    like the IVF centroid artifact) and the five rank iterations run as
    constant-folded literal joins — the returned plan scans nothing."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    edge_rows = spark.sql(
        "WITH " + _EDGES_CTE.strip() + "\nSELECT src, dst, w FROM w"
    ).collect()
    node_rows = spark.sql("SELECT n_name AS node FROM nation").collect()
    n = len(node_rows)
    w_vals = ", ".join(
        f"('{q(r.src)}', '{q(r.dst)}', CAST({r.w!r} AS DOUBLE))" for r in edge_rows
    )
    node_vals = ", ".join(f"('{q(r.node)}')" for r in node_rows)
    sql = (
        "WITH w AS (SELECT * FROM VALUES "
        + w_vals
        + " AS t(src, dst, w)),\n"
        + "nodes AS (SELECT * FROM VALUES "
        + node_vals
        + " AS t(node)),\n"
        + _pagerank_iter_sql(n, "w", "nodes")
    )
    return spark.sql(sql)


def _pagerank_oracle() -> str:
    """DuckDB replays the full pipeline declaratively (it costs one scan
    there: DuckDB materializes each CTE once). |nation| is a scale-free
    constant of TPC-H-shaped data, shared with the Spark literal."""
    return (
        "WITH "
        + _EDGES_CTE.strip()
        + ",\n"
        + _pagerank_iter_sql(25, "w", "nodes")
    )


# Undirected part co-purchase edges: two parts are adjacent when some
# order contains both. DISTINCT bounds the edge list; per-order fan-out
# is capped by lineitems-per-order, so |edges| is O(|lineitem|).
_COPURCHASE_EDGES_SQL = """
SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
FROM lineitem a
JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
"""


def copurchase_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every part reachable within BFS_MAX_HOPS co-purchase hops of the
    seed part (the minimum part key — deterministic at every scale),
    with its hop distance: the 'related items within k degrees'
    recommendation primitive.

    Edge list persisted across the fixed number of frontier expansions,
    released after an eager localCheckpoint freezes the result."""
    edges = spark.sql(_COPURCHASE_EDGES_SQL).persist()
    seed = spark.sql("SELECT min(l_partkey) AS s FROM lineitem").collect()[0][0]
    h = spark.range(1).select(
        F.lit(seed).cast("bigint").alias("node"), F.lit(0).cast("int").alias("dist")
    )
    held: list[DataFrame] = []
    try:
        for _ in range(BFS_MAX_HOPS):
            nxt = (
                h.alias("h")
                .join(edges.alias("e"), F.col("h.node") == F.col("e.p1"))
                .select(
                    F.col("e.p2").alias("node"),
                    (F.col("h.dist") + 1).cast("int").alias("dist"),
                )
            )
            h = (
                h.unionByName(nxt)
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
                .persist()
            )
            held.append(h)
        final = (
            h.select(F.col("node").alias("part_key"), F.col("dist").alias("hops"))
            .orderBy("hops", "part_key")
            .localCheckpoint(eager=True)
        )
    finally:
        for d in held:
            d.unpersist()
        edges.unpersist()
    return final


def _copurchase_oracle() -> str:
    """Unrolled min-distance label propagation, pure integer
    arithmetic."""
    parts = [
        "WITH edges AS (" + _COPURCHASE_EDGES_SQL.strip() + "),",
        "seed AS (SELECT min(l_partkey) AS s FROM lineitem),",
        "h0 AS (SELECT s AS node, CAST(0 AS INTEGER) AS dist FROM seed)",
    ]
    for i in range(1, BFS_MAX_HOPS + 1):
        parts.append(
            f""",
h{i} AS (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM h{i - 1}
    UNION ALL
    SELECT e.p2 AS node, CAST(p.dist + 1 AS INTEGER) AS dist
    FROM h{i - 1} p JOIN edges e ON e.p1 = p.node
  ) frontier
  GROUP BY node
)"""
        )
    parts.append(
        f"""
SELECT node AS part_key, dist AS hops
FROM h{BFS_MAX_HOPS}
ORDER BY hops, part_key"""
    )
    return "\n".join(parts)


def registry() -> dict[str, dict]:
    return {
        "graph_pagerank_nations": {
            "fn": pagerank_nations,
            "oracle": _pagerank_oracle(),
        },
        "graph_copurchase_hops": {
            "fn": copurchase_hops,
            "oracle": _copurchase_oracle(),
        },
    }
