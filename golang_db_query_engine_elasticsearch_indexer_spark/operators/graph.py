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

from golang_db_query_engine_elasticsearch_indexer_spark.functions import (
    DUCK_TOKENS,
    TOKENS,
)

PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 5
BFS_MAX_HOPS = 3


def _round_half_up(x: float, scale: int) -> float:
    """Exact mirror of Spark SQL's round() on DOUBLE:
    BigDecimal.valueOf(x) parses Double.toString's shortest round-trip
    decimal — the same string Python's repr() produces — then
    setScale(scale, HALF_UP). Used by the driver-side rank iterations
    so every surfaced value is one the SQL formulation also computes."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP)
    )

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
nodes AS (SELECT n_name AS node FROM nation)
"""


def _pr_dm_sql(prev: str, outs: str) -> str:
    """Dangling-mass CTE body: rank mass on nodes with no out-edges —
    ONE text shared by the oracle's unrolled chain and the engine's
    per-iteration loop, so the two formulations cannot drift."""
    return f"""
  SELECT coalesce(sum(p.pr), 0) AS dm
  FROM {prev} p LEFT JOIN {outs} o ON o.node = p.node
  WHERE o.node IS NULL
"""


def _pr_rank_sql(
    n_nodes: int, w_relation: str, nodes_relation: str, prev: str, dm: str
) -> str:
    """One damped-PageRank iteration body (shared text, see
    :func:`_pr_dm_sql`): rank_{t+1}(c) = (1-d)/N + d * (sum_s
    rank_t(s) * w(s, c) + dangling_t / N) — dangling mass redistributed
    uniformly, the standard treatment, so total mass conserves to the
    rounding (at small scale factors many nations have no outgoing
    trade; drop the term and the rank vector silently decays). Rank
    rounded to 9 dp per iteration."""
    d = PAGERANK_DAMPING
    return f"""
  SELECT n.node,
         round((1 - {d}) / {n_nodes}
               + {d} * (coalesce(sum(p.pr * w.w), 0) + dd.dm / {n_nodes}), 9) AS pr
  FROM {nodes_relation} n
  CROSS JOIN {dm} dd
  LEFT JOIN {w_relation} w ON w.dst = n.node
  LEFT JOIN {prev} p ON p.node = w.src
  GROUP BY n.node, dd.dm
"""


def _pagerank_iter_sql(n_nodes: int, w_relation: str, nodes_relation: str) -> str:
    """PAGERANK_ITERS unrolled damped-PageRank iterations (the ORACLE
    formulation: DuckDB materializes each CTE once, so the chain costs
    one pass there; Spark INLINES multiply-referenced CTEs — each
    iteration references r{i-1} twice, so the unrolled chain explodes
    to 2^ITERS subplan copies and the engine loop materializes each
    25-row iteration instead, see :func:`pagerank_nations`)."""
    parts = [
        f"outs AS (SELECT DISTINCT src AS node FROM {w_relation})",
        f"r0 AS (SELECT node, round(1.0 / {n_nodes}, 9) AS pr FROM {nodes_relation})",
    ]
    for i in range(1, PAGERANK_ITERS + 1):
        parts.append(f"dm{i} AS ({_pr_dm_sql(f'r{i - 1}', 'outs')})")
        parts.append(
            f"r{i} AS ({_pr_rank_sql(n_nodes, w_relation, nodes_relation, f'r{i - 1}', f'dm{i}')})"
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
    like the IVF centroid artifact) and the five rank iterations run in
    driver arithmetic over that artifact — |nation|^2-bounded work at
    ANY scale factor, with round() mirrored bit-for-bit
    (:func:`_round_half_up`) and exact-decimal constants where the SQL
    literals are decimal-typed, so every surfaced value is one the SQL
    formulation also computes (differential-verified at sf0.001/0.01/
    0.1 against the chained oracle). History (r13 optimization round):
    the original one-shot unrolled chain references r{i-1} twice per
    iteration (dangling mass + rank join), Spark inlines CTEs, and the
    plan grew 2^ITERS subplan copies — measured ~3 s of pure optimizer
    time on 25-row relations at ITERS=5; per-iteration literal
    round-trips and local-relation views both just moved the cost into
    5-6 driver round-trips (~0.4 s floor each on local[32]). The
    driver-side loop leaves exactly one heavy action (the edge
    aggregation) plus one trivial local-relation return. The ORACLE
    keeps the chained CTE text — DuckDB materializes CTEs once, so the
    chain is the right shape there AND pins loop-vs-chain equivalence."""

    from decimal import Decimal

    edge_rows = spark.sql(
        "WITH " + _EDGES_CTE.strip() + "\nSELECT src, dst, w FROM w"
    ).collect()
    node_rows = spark.sql("SELECT n_name AS node FROM nation").collect()
    n = len(node_rows)
    nodes = sorted(r.node for r in node_rows)
    in_edges: dict[str, list[tuple[str, float]]] = {}
    outs: set[str] = set()
    # Deterministic iteration order (sorted by key) so the float sums
    # below are reproducible run-to-run; cross-engine sub-ULP
    # summation-order differences are absorbed by the 9-dp per-
    # iteration rounding exactly as between Spark and DuckDB (module
    # float discipline above).
    for r in sorted(edge_rows, key=lambda e: (e.src, e.dst)):
        in_edges.setdefault(r.dst, []).append((r.src, float(r.w)))
        outs.add(r.src)
    d = PAGERANK_DAMPING
    # SQL-literal arithmetic mirror: "1.0 / n" and "(1 - 0.85) / n" are
    # DECIMAL-exact in both engines for n = |nation| = 25 (terminating
    # quotients), so compute them in exact decimal and convert once.
    r0 = _round_half_up(float(Decimal(1) / Decimal(n)), 9)
    base = float((Decimal(1) - Decimal(repr(d))) / Decimal(n))
    pr = {v: r0 for v in nodes}
    for _ in range(PAGERANK_ITERS):
        dm = 0.0
        for v in nodes:
            if v not in outs:
                dm += pr[v]
        pr = {
            v: _round_half_up(
                base
                + d * (sum(pr[s] * w for s, w in in_edges.get(v, ())) + dm / n),
                9,
            )
            for v in nodes
        }
    rows = sorted(
        ((v, _round_half_up(pr[v], 6)) for v in nodes),
        key=lambda t: (-t[1], t[0]),
    )
    return spark.createDataFrame(rows, "node string, pagerank double")


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
# Semantic definition (and the DuckDB oracle's text) is the self-join;
# the Spark path computes the same relation with ONE shuffle instead of
# two: group the fact table by order, expand the bounded per-order part
# set row-locally (the _minhash_candidates pattern — items-per-order
# caps the state and the fan-out), emit both directions, then one
# distinct. Measured ~2x faster at sf0.1 than the two-sided join.
_COPURCHASE_EDGES_SQL = """
SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
FROM lineitem a
JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
"""

_COPURCHASE_EDGES_SPARK = """
WITH baskets AS (
  SELECT array_sort(collect_set(l_partkey)) AS parts
  FROM lineitem GROUP BY l_orderkey
),
pairs AS (
  SELECT explode(flatten(flatten(transform(
           sequence(1, size(parts) - 1),
           i -> transform(sequence(0, i - 1),
                          j -> array(struct(parts[j] AS p1, parts[i] AS p2),
                                     struct(parts[i] AS p1, parts[j] AS p2)))
         )))) AS p
  FROM baskets WHERE size(parts) >= 2
)
SELECT DISTINCT p.p1, p.p2 FROM pairs
"""


def copurchase_hops(
    spark: SparkSession, sf_dir: str, round_sizes: list[int] | None = None
) -> DataFrame:
    """Every part reachable within BFS_MAX_HOPS co-purchase hops of the
    seed part (the minimum part key — deterministic at every scale),
    with its hop distance: the 'related items within k degrees'
    recommendation primitive.

    Frontier-only expansion (the textbook distributed-BFS shape): each
    round joins ONLY the nodes discovered in the previous round against
    the edge list, then anti-joins the settled set to keep just the
    genuinely new nodes — with unit edge weights every node's first
    discovery round IS its minimum distance, so the settled relation
    never needs revisiting. Re-expanding the whole reached set (the
    first version of this operator) is correct but does O(|settled| x
    degree) wasted probe work per round — the difference between
    O(edges within k hops) total and O(rounds x edges) at 100x scale.

    Edge list persisted across the fixed number of frontier expansions,
    released after an eager localCheckpoint freezes the result."""
    edges = spark.sql(_COPURCHASE_EDGES_SPARK).persist()
    seed = spark.sql("SELECT min(l_partkey) AS s FROM lineitem").collect()[0][0]
    frontier = spark.range(1).select(
        F.lit(seed).cast("bigint").alias("node"), F.lit(0).cast("int").alias("dist")
    )
    h = frontier
    held: list[DataFrame] = []
    try:
        for _ in range(BFS_MAX_HOPS):
            expanded = (
                frontier.alias("f")
                .join(edges.alias("e"), F.col("f.node") == F.col("e.p1"))
                .select(
                    F.col("e.p2").alias("node"),
                    (F.col("f.dist") + 1).cast("int").alias("dist"),
                )
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
            )
            frontier = expanded.join(h, "node", "left_anti").persist()
            h = h.unionByName(frontier).persist()
            held.extend((frontier, h))
            if round_sizes is not None:  # test instrumentation only
                round_sizes.append(frontier.count())
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


# --- TextRank keyword extraction (fixed-point integer formulation) ---------

TEXTRANK_ITERS = 3
TEXTRANK_TOP_K = 20
TEXTRANK_MIN_LEN = 4  # candidate keywords: tokens of at least 4 chars
# Fixed-point scale: ranks are BIGINT parts-per-million. Rationale: a
# float TextRank sums thousands of in-edge contributions per hub word,
# and cross-engine summation-order drift (~1e-13) against a 9-dp
# rounding boundary would straddle with non-negligible probability at
# vocabulary scale (2000 nodes x 3 iterations ~ 0.6 expected flips —
# unacceptable for a hash gate). Integer formulation is EXACT in both
# engines: each edge contribution floors once ((r * cnt) div out —
# deterministic per term, order-independent integer sum), and the
# damping applies as (850000 * s) div 1000000. Overflow headroom: total
# rank mass <= |vocab| * ~2e6 ppm; x 850000 stays < 2^63 up to ~1e7
# vocabulary words.
TEXTRANK_SCALE = 1_000_000


def _textrank_edges_sql(*, dialect: str) -> str:
    """Symmetrized word co-occurrence edges with out-strength:
    (src, dst, cnt, outc). Adjacency = consecutive candidate keywords
    (length >= TEXTRANK_MIN_LEN) within a document. One explode + one
    groupBy on the word pair; per-doc fan-out is doc length, so
    |adjacency| is O(total tokens) — linear in the corpus."""
    if dialect == "spark":
        return f"""
ft0 AS (
  SELECT filter({TOKENS}, w -> length(w) >= {TEXTRANK_MIN_LEN}) AS ft
  FROM documents
),
ft2 AS (SELECT ft FROM ft0 WHERE size(ft) >= 2),
pos AS (
  SELECT ft, i FROM ft2 LATERAL VIEW explode(sequence(1, size(ft) - 1)) s AS i
),
adj AS (
  SELECT element_at(ft, i) AS wa, element_at(ft, i + 1) AS wb
  FROM pos WHERE element_at(ft, i) <> element_at(ft, i + 1)
),
dir AS (SELECT wa, wb FROM adj UNION ALL SELECT wb AS wa, wa AS wb FROM adj),
edges AS (SELECT wa AS src, wb AS dst, count(*) AS cnt FROM dir GROUP BY wa, wb),
edgesw AS (
  SELECT src, dst, cnt, sum(cnt) OVER (PARTITION BY src) AS outc FROM edges
)
"""
    return f"""
ft0 AS (
  SELECT list_filter({DUCK_TOKENS}, w -> length(w) >= {TEXTRANK_MIN_LEN}) AS ft
  FROM documents
),
ft2 AS (SELECT ft FROM ft0 WHERE len(ft) >= 2),
pos AS (
  SELECT ft, unnest(generate_series(1, len(ft) - 1)) AS i FROM ft2
),
adj AS (
  SELECT ft[i] AS wa, ft[i + 1] AS wb FROM pos WHERE ft[i] <> ft[i + 1]
),
dir AS (SELECT wa, wb FROM adj UNION ALL SELECT wb AS wa, wa AS wb FROM adj),
edges AS (SELECT wa AS src, wb AS dst, count(*) AS cnt FROM dir GROUP BY wa, wb),
edgesw AS (
  SELECT src, dst, cnt, sum(cnt) OVER (PARTITION BY src) AS outc FROM edges
)
"""


def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus keywords by TextRank (Mihalcea & Tarau 2004) over the
    word co-occurrence graph, in exact fixed-point integer arithmetic.

    The rank vector here is VOCABULARY-cardinality, so unlike the
    nation PageRank it stays distributed: edges are built once and
    persisted for the fixed iteration budget, each iteration is one
    word-keyed join + integer-sum aggregate, and the result is frozen
    with an eager localCheckpoint before the caches release (the BFS
    discipline). Every node has out-edges by symmetrization, so there
    is no dangling mass to redistribute."""
    s = TEXTRANK_SCALE
    edges = spark.sql(
        "WITH " + _textrank_edges_sql(dialect="spark").strip()
        + "\nSELECT src, dst, cnt, outc FROM edgesw"
    ).persist()
    nodes = edges.select("src").distinct().withColumnRenamed("src", "word").persist()
    ranks = nodes.select(
        "word", F.lit(s).cast("bigint").alias("r")
    )
    held: list[DataFrame] = []
    try:
        for _ in range(TEXTRANK_ITERS):
            contrib = (
                edges.alias("e")
                .join(ranks.alias("p"), F.col("p.word") == F.col("e.src"))
                .select(
                    F.col("e.dst").alias("word"),
                    F.expr("(p.r * e.cnt) div e.outc").alias("c"),
                )
                .groupBy("word")
                .agg(F.sum("c").alias("cs"))
            )
            ranks = (
                nodes.alias("n")
                .join(contrib.alias("c"), "word", "left")
                .select(
                    "word",
                    F.expr(
                        f"cast({s * 15 // 100} + ({s * 85 // 100} * coalesce(cs, 0))"
                        f" div {s} AS bigint)"
                    ).alias("r"),
                )
                .persist()
            )
            held.append(ranks)
        final = (
            ranks.select("word", F.col("r").alias("rank_ppm"))
            .orderBy(F.col("rank_ppm").desc(), "word")
            .limit(TEXTRANK_TOP_K)
            .localCheckpoint(eager=True)
        )
    finally:
        for d in held:
            d.unpersist()
        nodes.unpersist()
        edges.unpersist()
    return final


def _textrank_oracle() -> str:
    s = TEXTRANK_SCALE
    parts = [
        "WITH " + _textrank_edges_sql(dialect="duckdb").strip(),
        f""",
r0 AS (SELECT DISTINCT src AS word, CAST({s} AS BIGINT) AS r FROM edgesw)""",
    ]
    for i in range(1, TEXTRANK_ITERS + 1):
        parts.append(
            f""",
c{i} AS (
  SELECT e.dst AS word, sum((p.r * e.cnt) // e.outc) AS cs
  FROM edgesw e JOIN r{i - 1} p ON p.word = e.src
  GROUP BY e.dst
),
r{i} AS (
  SELECT n.word,
         CAST({s * 15 // 100} + ({s * 85 // 100} * coalesce(c.cs, 0)) // {s}
              AS BIGINT) AS r
  FROM r0 n LEFT JOIN c{i} c ON c.word = n.word
)"""
        )
    parts.append(
        f"""
SELECT word, r AS rank_ppm
FROM r{TEXTRANK_ITERS}
ORDER BY rank_ppm DESC, word
LIMIT {TEXTRANK_TOP_K}"""
    )
    return "".join(parts)


# --- triangle counting (degree-oriented wedge closure) ----------------------
#
# The third classic distributed-graph kernel (after PageRank and BFS):
# global triangle count + transitivity of the part co-purchase graph.
# The engine runs the DEGREE-ORIENTED algorithm — orient every edge
# from its lower-(degree, id) endpoint to the higher one, enumerate
# wedges only at each edge's SOURCE, close each wedge with one
# oriented-edge lookup. Orientation bounds per-node wedge fan-out by
# the oriented out-degree (O(sqrt(m)) on skewed graphs — the
# Schank/Wagner bound), which is what makes the kernel survive
# power-law degree skew at 100 TB; the naive a<b<c triple self-join
# exists ONLY in the oracle, so the differential proves the oriented
# algorithm counts exactly.

# Shared SQL pieces, parameterized on relation names: the ORACLE
# composes them into one CTE chain (DuckDB materializes each CTE
# once); the Spark engine materializes each piece as a persisted
# relation instead — Spark INLINES multiply-referenced CTEs, and the
# one-query form measured 18 fact-table scans (see bpe_merge_learn
# for the same pitfall).
_TRI_DEG_SQL = """
  SELECT v, cast(count(*) AS BIGINT) AS d FROM (
    SELECT p1 AS v FROM {edges} UNION ALL SELECT p2 AS v FROM {edges}) u
  GROUP BY v
"""
_TRI_ORIENTED_SQL = """
  SELECT CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND e.p1 < e.p2)
              THEN e.p1 ELSE e.p2 END AS src,
         CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND e.p1 < e.p2)
              THEN e.p2 ELSE e.p1 END AS dst,
         CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND e.p1 < e.p2)
              THEN d2.d ELSE d1.d END AS dst_d
  FROM {edges} e
  JOIN {deg} d1 ON d1.v = e.p1
  JOIN {deg} d2 ON d2.v = e.p2
"""
_TRI_FINAL_SQL = """
SELECT s.n_nodes, ec.n_edges, s.n_wedges, t.n_triangles,
       round(cast(3.0 * t.n_triangles AS double) / nullif(s.n_wedges, 0), 6)
         AS transitivity
FROM (
  SELECT cast(count(*) AS BIGINT) AS n_nodes,
         cast(sum(floor(d * (d - 1) / 2.0)) AS BIGINT) AS n_wedges
  FROM {deg}
) s
CROSS JOIN (SELECT cast(count(*) AS BIGINT) AS n_edges FROM {edges}) ec
CROSS JOIN (
  SELECT cast(count(*) AS BIGINT) AS n_triangles
  FROM {oriented} o1
  JOIN {oriented} o2
    ON o1.src = o2.src
   AND (o1.dst_d < o2.dst_d OR (o1.dst_d = o2.dst_d AND o1.dst < o2.dst))
  JOIN {oriented} c ON c.src = o1.dst AND c.dst = o2.dst
) t
"""

# Spark edge construction: per-order baskets (ONE shuffle on
# l_orderkey), pairs exploded row-locally with p1 < p2 by the sorted
# basket — the same no-self-join shape copurchase_hops uses.
_TRIANGLE_EDGES_SPARK = """
baskets AS (
  SELECT array_sort(collect_set(l_partkey)) AS parts
  FROM lineitem GROUP BY l_orderkey
),
rawpairs AS (
  SELECT explode(flatten(transform(
           sequence(1, size(parts) - 1),
           i -> transform(sequence(0, i - 1),
                          j -> struct(parts[j] AS p1, parts[i] AS p2))
         ))) AS p
  FROM baskets WHERE size(parts) >= 2
),
edges AS (SELECT DISTINCT p.p1, p.p2 FROM rawpairs)
"""

# Oracle edges: the naive lineitem self-join (ground truth); the tail
# is the SAME oriented algorithm text, but correctness does not lean
# on that — the planted/behavioral test recounts triangles naively.
_TRIANGLE_EDGES_DUCK = """
edges AS (
  SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
  FROM lineitem a
  JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
"""


def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle census of the co-purchase graph: node/edge/wedge
    counts, triangle count via degree-oriented wedge closure, and the
    global clustering coefficient (transitivity = 3T / wedges).

    Scale shape: edges come from the basket shuffle (no self-join of
    the fact table) and are PERSISTED, as are degrees and the oriented
    edge list — each is consumed 2-3 times and Spark would otherwise
    inline the shared subplans into repeated fact-table scans (the
    measured CTE-inlining pitfall, 18 scans in the one-query form).
    The wedge join fans out only from oriented SOURCES (bounded
    out-degree); the closing probe is an equi-join on the oriented
    edge key. The naive triple join never runs in the engine; the
    1-row result is collected so every cache releases before return."""
    edges = spark.sql(
        "WITH " + _TRIANGLE_EDGES_SPARK.strip() + " SELECT p1, p2 FROM edges"
    ).persist()
    edges.createOrReplaceTempView("__tri_edges")
    deg = spark.sql(_TRI_DEG_SQL.format(edges="__tri_edges")).persist()
    deg.createOrReplaceTempView("__tri_deg")
    oriented = spark.sql(
        _TRI_ORIENTED_SQL.format(edges="__tri_edges", deg="__tri_deg")
    ).persist()
    oriented.createOrReplaceTempView("__tri_oriented")
    try:
        row = spark.sql(
            _TRI_FINAL_SQL.format(
                edges="__tri_edges", deg="__tri_deg", oriented="__tri_oriented"
            )
        ).collect()[0]
    finally:
        oriented.unpersist()
        deg.unpersist()
        edges.unpersist()
        for v in ("__tri_oriented", "__tri_deg", "__tri_edges"):
            spark.catalog.dropTempView(v)
    return spark.createDataFrame(
        [tuple(row)],
        "n_nodes bigint, n_edges bigint, n_wedges bigint,"
        " n_triangles bigint, transitivity double",
    )


TRIANGLES_ORACLE = (
    "WITH "
    + _TRIANGLE_EDGES_DUCK.strip()
    + ",\ndeg AS ("
    + _TRI_DEG_SQL.format(edges="edges")
    + "),\noriented AS ("
    + _TRI_ORIENTED_SQL.format(edges="edges", deg="deg")
    + ")\n"
    + _TRI_FINAL_SQL.format(edges="edges", deg="deg", oriented="oriented")
)


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
        "graph_copurchase_triangles": {
            "fn": copurchase_triangles,
            "oracle": TRIANGLES_ORACLE,
        },
        "text_keywords_textrank": {
            "fn": textrank_keywords,
            "oracle": _textrank_oracle(),
        },
    }
