"""Behavioral tests for the graph kernels and the z-order layout.

Oracle equality for these entries is covered by the differential gate
in test_oracle_queries.py; these tests pin the *semantic contracts*
the oracle comparison alone can't see — conservation laws, frontier
monotonicity, the clustering guarantee of the layout, and the plan
shape (the pagerank iteration must not re-scan the fact table)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from golang_db_query_engine_elasticsearch_indexer_spark.operators import graph, layout


def test_pagerank_mass_conservation(spark, tables):
    """Rank is a probability mass: with every nation having out-edges,
    the damped update conserves total mass to within the per-iteration
    rounding (25 nodes x 5 iterations x 5e-10)."""
    rows = graph.pagerank_nations(spark, None).collect()
    assert len(rows) == 25
    total = sum(r.pagerank for r in rows)
    assert abs(total - 1.0) < 1e-4
    assert all(r.pagerank > 0 for r in rows)


def test_pagerank_driver_loop_matches_chained_sql(spark, tables):
    """The driver-side rank loop must surface EXACTLY the values the
    chained-CTE SQL formulation (the oracle's text) computes when run
    by Spark itself — the r13 rewrite's equivalence is empirical
    (9-dp HALF_UP rounding absorbing summation-order differences), so
    any drift should fail here, loudly and in-repo, not at
    oracle-compare time. The chained plan is the known 2^ITERS
    optimizer blow-up; acceptable once, in a test, on 25-row data."""
    chained = spark.sql(
        "WITH "
        + graph._EDGES_CTE.strip()
        + ",\n"
        + graph._pagerank_iter_sql(25, "w", "nodes")
    ).collect()
    loop = graph.pagerank_nations(spark, None).collect()
    assert [tuple(r) for r in chained] == [tuple(r) for r in loop]


def test_pagerank_returned_plan_scans_nothing(spark, tables):
    """The edge artifact is collected (bounded by |nation|^2); the
    returned plan must be literal-only — scanning lineitem once per
    iteration is the 100 TB failure mode this shape exists to avoid."""
    plan = (
        graph.pagerank_nations(spark, None)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "lineitem" not in plan
    assert "parquet" not in plan.lower()


def test_copurchase_hops_contract(spark, tables):
    """Seed sits at hop 0; distances are within the budget; every
    non-seed node at hop d has a neighbor at hop d-1 (BFS invariant,
    checked for d=1 against the raw edge list)."""
    rows = graph.copurchase_hops(spark, None).collect()
    dists = {r.part_key: r.hops for r in rows}
    seed = spark.sql("SELECT min(l_partkey) AS s FROM lineitem").collect()[0][0]
    assert dists[seed] == 0
    assert sum(1 for d in dists.values() if d == 0) == 1
    assert all(0 <= d <= graph.BFS_MAX_HOPS for d in dists.values())
    edges = {
        (r.p1, r.p2)
        for r in spark.sql(graph._COPURCHASE_EDGES_SQL).collect()
    }
    hop1 = [k for k, d in dists.items() if d == 1]
    assert hop1, "seed has co-purchase neighbors at every fixture scale"
    assert all((seed, k) in edges for k in hop1)


def test_copurchase_hops_frontier_only_expansion(spark, tables):
    """The settled set is never re-expanded (VERDICT r05 ask #3): each
    round's frontier contains only never-seen nodes, so the per-round
    discovery counts sum EXACTLY to |result| - 1 (the seed). The old
    whole-set formulation also produced correct distances but scanned
    |settled| x degree probe rows per round; this pins the frontier-only
    shape so a regression back to it is caught by the count identity
    (re-expansion would surface duplicates that the anti-join must
    remove, and the per-round sizes must equal the per-hop histogram of
    the final result)."""
    sizes: list[int] = []
    rows = graph.copurchase_hops(spark, None, round_sizes=sizes).collect()
    assert len(sizes) == graph.BFS_MAX_HOPS
    assert sum(sizes) == len(rows) - 1
    from collections import Counter

    per_hop = Counter(r.hops for r in rows)
    for d, n in enumerate(sizes, start=1):
        assert per_hop.get(d, 0) == n


def test_textrank_keywords_contract(spark, tables):
    """Top-k keywords: candidate filter respected (no short/stop
    tokens), ranks are valid fixed-point values (>= the damping floor
    of 150000 ppm), list is rank-ordered, and a repeat invocation is
    bit-identical (the integer formulation is exactly deterministic)."""
    rows = graph.textrank_keywords(spark, None).collect()
    assert 0 < len(rows) <= graph.TEXTRANK_TOP_K
    assert all(len(r.word) >= graph.TEXTRANK_MIN_LEN for r in rows)
    assert all(r.rank_ppm >= 150000 for r in rows)
    ranks = [r.rank_ppm for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    again = [(r.word, r.rank_ppm) for r in graph.textrank_keywords(spark, None).collect()]
    assert again == [(r.word, r.rank_ppm) for r in rows]


def test_zorder_bucket_rectangles(spark, tables):
    """Fixing the top 6 z-bits confines each bucket to a 32x32
    rectangle of the 256x256 coordinate grid — the clustering contract
    the profile exposes to the scan planner."""
    prof = layout.zorder_profile(spark, None).collect()
    assert prof
    for r in prof:
        assert r.cust_hi - r.cust_lo <= 31
        assert r.day_hi - r.day_lo <= 31
        assert r.n_rows > 0


def test_zordered_write_clusters_both_dimensions(spark, tables, tmp_path):
    """Z-sorted files must cover materially smaller per-dimension spans
    than naturally-ordered files of the same count — that span is
    exactly what parquet zone-map pruning sees."""

    def spans(path):
        rows = (
            spark.read.parquet(path)
            .withColumn("f", F.input_file_name())
            .groupBy("f")
            .agg(
                (F.max("cb") - F.min("cb")).alias("cspan"),
                (F.max("dy") - F.min("dy")).alias("dspan"),
            )
            .collect()
        )
        n = len(rows)
        return (sum(r.cspan for r in rows) / n, sum(r.dspan for r in rows) / n)

    zp = os.path.join(str(tmp_path), "zordered")
    layout.write_zordered(spark, zp, num_files=8)
    zc, zd = spans(zp)

    np_ = os.path.join(str(tmp_path), "natural")
    layout.zorder_values(spark).repartition(8).write.parquet(np_)
    nc, nd = spans(np_)

    assert zc < nc * 0.8, f"cust span {zc} not clustered vs {nc}"
    assert zd < nd * 0.8, f"day span {zd} not clustered vs {nd}"
