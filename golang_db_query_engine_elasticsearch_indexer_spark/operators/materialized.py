"""Entries whose Spark form materializes shared intermediates.

Spark INLINES multiply-referenced CTEs into independent subplans — a
WITH-clause relation consumed N times becomes N copies of its whole
subtree, and chains of such references multiply (measured: 63 scans
for the 6-round BPE chain, 18 for the Bloom audit, 18 for the triangle
census). DuckDB materializes each CTE once, so the chained-CTE text
stays correct AND efficient there — which is exactly what the oracle
needs. These Spark implementations therefore persist each shared
relation as a temp view, run the identical SQL tail against the
caches, and release everything after an eager ``localCheckpoint``
freezes the (small) result — the ``dedup.components`` lineage
discipline applied to the CTE-inlining pitfall. Values are unchanged;
only the physical plan differs, which the unchanged driver hashes
prove.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Observability hook for plan capture (tools/capture_plans.py
#: --internals): when set to a list, materialized_chain appends
#: ``(stage_name, formatted_plan)`` for every stage it runs plus the
#: final statement — the INTERNAL plans an eager localCheckpoint hides
#: from the returned frame's explain. Never set in production paths.
PLAN_CAPTURE: list | None = None


def _capture(name: str, df: DataFrame) -> None:
    if PLAN_CAPTURE is None:
        return
    try:
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception as e:  # noqa: BLE001 — capture is best-effort
        plan = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
    PLAN_CAPTURE.append((name, plan))


def materialized_chain(
    spark: SparkSession,
    stages: list[tuple],
    final_sql: str,
) -> DataFrame:
    """Register each named stage as a temp view (in order — later
    stages may reference earlier ones), evaluate ``final_sql`` against
    them, freeze the result with an eager localCheckpoint, and release
    every cache and view before returning.

    Each stage is ``(name, sql)`` or ``(name, sql, persist)``: persist
    defaults True and should be False for stages consumed exactly once
    — a single-reference view inlines without duplication, and NOT
    paying the cache materialization for it measurably matters at
    local scale (the Bloom audit's position unions are the case in
    point)."""
    held: list[DataFrame] = []
    try:
        for stage in stages:
            name, sql = stage[0], stage[1]
            persist = stage[2] if len(stage) > 2 else True
            df = spark.sql(sql)
            _capture(name, df)
            if persist:
                df = df.persist()
                held.append(df)
            df.createOrReplaceTempView(name)
        final = spark.sql(final_sql)
        _capture("__final__", final)
        return final.localCheckpoint(eager=True)
    finally:
        for df in held:
            df.unpersist()
        for stage in stages:
            spark.catalog.dropTempView(stage[0])


# --- join_bloom_prefilter ---------------------------------------------------


def bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of the Bloom pre-filter audit (oracle: the chained
    form in ``inventory._bloom_sql``). ``dim`` and ``probe`` are each
    consumed by 4-5 downstream relations; inlined, the one-query form
    re-ran the DISTINCT over the fact table five times (18 scans
    total). Staged: orders and lineitem are scanned ONCE each.

    The membership test materializes the ACTUAL Bloom bitmap: the dim
    side's m=65536 positions fold into 1024 BIGINT words in-plan
    (``bit_or`` of single-bit values — map-side, <=1024 rows out
    regardless of dim cardinality), the words are collected once and
    inlined as a constant-foldable array literal, and the pass stage
    becomes a row-local bit test over the probe cache — zero joins,
    zero broadcast builds. The r13 form (3 broadcast semi-joins
    against the position set) re-built the same 49k-row broadcast
    three times inside one action: profiled at 3.7-6.2 s of the
    kernel's 5.5 s warm total at sf0.1; the bit-test pass runs the
    identical membership in 1.5 s (interleaved min-of-3, counts
    byte-identical). Same result by construction: bit p set in the
    word array <=> p in the DISTINCT position set, and the conjunction
    over k salts is unchanged; the oracle keeps the exploded
    join+HAVING formulation, so the differential pins the equivalence.
    """
    from golang_db_query_engine_elasticsearch_indexer_spark.inventory import (  # noqa: PLC0415
        _bloom_pos,
    )

    k_hashes = 3
    n_words = 65536 // 64  # bitmap words for _bloom_pos's fixed m_bits
    dim_pos = "\nUNION ALL ".join(
        f"SELECT {_bloom_pos('k', s)} AS pos FROM __blm_dim"
        for s in range(k_hashes)
    )
    dim = spark.sql(
        "SELECT DISTINCT o_orderkey AS k FROM orders"
        " WHERE o_totalprice > 400000"
    ).persist()
    dim.createOrReplaceTempView("__blm_dim")
    try:
        # One aggregate job folds every dim position into its bitmap
        # word (bit_or is idempotent, so no DISTINCT pass is needed);
        # the collect moves <=1024 rows whatever the scale factor.
        word_rows = spark.sql(
            f"SELECT pos DIV 64 AS w,"
            f" bit_or(shiftleft(1L, cast(pos % 64 AS INT))) AS bits"
            f" FROM ({dim_pos}) d GROUP BY pos DIV 64"
        ).collect()
        words = {int(r["w"]): int(r["bits"]) for r in word_rows}
        arr_lit = "array(" + ",".join(
            f"{words.get(i, 0)}L" for i in range(n_words)
        ) + ")"

        def _bit_test(p: str) -> str:
            # bit p of the folded filter: word p DIV 64, bit p % 64.
            # shiftright is arithmetic, but `& 1` isolates the shifted
            # bit, so sign-fill above it is irrelevant.
            return (
                f"((shiftright(element_at({arr_lit},"
                f" cast({p} DIV 64 AS INT) + 1),"
                f" cast({p} % 64 AS INT)) & 1) = 1)"
            )

        pos_proj = ", ".join(
            f"{_bloom_pos('k', s)} AS p{s}" for s in range(k_hashes)
        )
        pass_pred = " AND ".join(_bit_test(f"p{s}") for s in range(k_hashes))
        stages = [
            ("__blm_probe", "SELECT DISTINCT l_orderkey AS k FROM lineitem"),
            (
                "__blm_pass",
                f"SELECT k FROM (SELECT k, {pos_proj} FROM __blm_probe) t"
                f" WHERE {pass_pred}",
            ),
            (
                "__blm_truth",
                "SELECT p.k FROM __blm_probe p JOIN __blm_dim d ON p.k = d.k",
            ),
        ]
        # CROSS JOINs of 1-row aggregates, not scalar subqueries: Spark
        # executes each scalar subquery as its own job before the main
        # query (5 driver round-trips over the caches); the cross-join
        # form runs the same five tiny aggregates inside ONE action.
        # Values unchanged (each aggregate is over the same relation).
        final = """
        SELECT n_probe, n_dim_keys, n_bloom_pass, n_true_match, n_missed,
               n_bloom_pass - n_true_match AS n_false_pos,
               round(cast(n_bloom_pass - n_true_match AS double)
                     / nullif(n_probe - n_true_match, 0), 6) AS fpr
        FROM       (SELECT count(*) AS n_probe      FROM __blm_probe)
        CROSS JOIN (SELECT count(*) AS n_dim_keys   FROM __blm_dim)
        CROSS JOIN (SELECT count(*) AS n_bloom_pass FROM __blm_pass)
        CROSS JOIN (SELECT count(*) AS n_true_match FROM __blm_truth)
        CROSS JOIN (SELECT count(*) AS n_missed     FROM __blm_truth t
                    LEFT JOIN __blm_pass bp ON t.k = bp.k
                    WHERE bp.k IS NULL)
        """
        return materialized_chain(spark, stages, final)
    finally:
        dim.unpersist()
        spark.catalog.dropTempView("__blm_dim")


# --- sketch_histogram_quantiles ---------------------------------------------


def histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of the histogram-quantile sketch (oracle: the chained
    form in ``inventory._histogram_quantiles_entry``). Everything
    downstream of ``vals`` is distinct-value-sized; caching vals alone
    cuts the lineitem scans from 11 to 1. ``bounds`` (1 row) and
    ``cum`` (BINS rows) are staged too: the tail references them 3-4
    times each and every unpinned reference re-aggregated the whole
    vals cache. ``binned`` stays a plain view (row-local projection of
    the cache). The exact-rank lookup is bin-local (see the template
    comment in inventory.py) — no unpartitioned all-values window."""
    from golang_db_query_engine_elasticsearch_indexer_spark.inventory import (  # noqa: PLC0415
        _HQ_BINS,
        _HQ_QS_VALUES,
        _HQ_TAIL_SQL,
        _HQ_VALS_SQL,
        _hq_stage_sqls,
    )

    b_sql, bin_sql, cum_sql = _hq_stage_sqls(
        "__hq_vals", "div", "__hq_bounds", "__hq_binned"
    )
    return materialized_chain(
        spark,
        [
            ("__hq_vals", _HQ_VALS_SQL),
            ("__hq_bounds", b_sql),
            ("__hq_binned", bin_sql, False),
            ("__hq_cum", cum_sql),
        ],
        "WITH "
        + _HQ_TAIL_SQL.format(
            binned="__hq_binned",
            bounds="__hq_bounds",
            cum="__hq_cum",
            BINS=_HQ_BINS,
            QS=_HQ_QS_VALUES,
        ).lstrip(),
    )


# --- events_stickiness ------------------------------------------------------


def stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of DAU/WAU stickiness (oracle: the chained form in
    inventory). ``du`` feeds both the DAU rollup and the x7
    day-contribution explode, and the day bounds were scalar
    subqueries over raw events — 8 fact-table scans inlined. Staged:
    events is scanned ONCE (du), bounds derive from the du cache."""
    stages = [
        (
            "__stk_du",
            "SELECT DISTINCT cast(ts AS date) AS d, user_id FROM events",
        ),
        (
            "__stk_bounds",
            "SELECT min(d) AS lo, max(d) AS hi FROM __stk_du",
        ),
    ]
    final = """
    WITH dau AS (
      SELECT d, count(DISTINCT user_id) AS dau FROM __stk_du GROUP BY d
    ),
    contrib AS (
      SELECT explode(sequence(d, date_add(d, 6))) AS wd, user_id
      FROM __stk_du
    ),
    wau AS (
      SELECT wd AS d, count(DISTINCT user_id) AS wau
      FROM contrib
      WHERE wd <= (SELECT hi FROM __stk_bounds)
      GROUP BY wd
    )
    SELECT cast(dau.d AS string) AS day, dau.dau, wau.wau,
           round(dau.dau * cast(1 AS double) / wau.wau, 4) AS stickiness
    FROM dau JOIN wau ON dau.d = wau.d
    WHERE dau.d >= (SELECT date_add(lo, 6) FROM __stk_bounds)
    ORDER BY day
    """
    return materialized_chain(spark, stages, final)


# --- orders_revenue_concentration -------------------------------------------


def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of the HHI revenue-concentration entry (oracle: the
    chained form in inventory). The per-nation revenue rollup is a
    3-table join consumed twice (total + shares) — inlined, that is
    six fact/dim scans; staged, the rollup (#nations rows) computes
    once."""
    stages = [
        (
            "__hhi_nrev",
            """
            SELECT n.n_name AS nation, round(sum(o.o_totalprice), 2) AS revenue
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
            """,
        ),
    ]
    final = """
    WITH tot AS (SELECT sum(revenue) AS total FROM __hhi_nrev)
    SELECT cast(count(*) AS bigint) AS n_nations,
           round(sum(power(revenue / total, 2)) * 10000, 2) AS hhi,
           round(max(revenue / total), 4) AS top_share
    FROM __hhi_nrev CROSS JOIN tot
    """
    return materialized_chain(spark, stages, final)


def registry() -> dict[str, dict]:
    from golang_db_query_engine_elasticsearch_indexer_spark import (  # noqa: PLC0415
        inventory,
    )

    return {
        "join_bloom_prefilter": {
            "fn": bloom_prefilter,
            "oracle": inventory.STAGED_QUERIES["join_bloom_prefilter"]["oracle"],
        },
        "sketch_histogram_quantiles": {
            "fn": histogram_quantiles,
            "oracle": inventory.STAGED_QUERIES["sketch_histogram_quantiles"][
                "oracle"
            ],
        },
        "events_stickiness": {
            "fn": stickiness,
            "oracle": inventory.STAGED_QUERIES["events_stickiness"]["oracle"],
        },
        "orders_revenue_concentration": {
            "fn": revenue_concentration,
            "oracle": inventory.STAGED_QUERIES["orders_revenue_concentration"][
                "oracle"
            ],
        },
    }
