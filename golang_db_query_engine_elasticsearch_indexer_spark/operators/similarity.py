"""Similarity search over the ``embeddings`` table (array<float> x 64).

North-star extensions (BASELINE.json; SURVEY.md §2.C):

- **brute-force cosine top-k** — the exact baseline: broadcast the
  (small) probe set against all vectors; one pass, no shuffle of the
  big side beyond the final per-probe top-k.
- **LSH-bucketed top-k** — the scale path: sign-bit bucketing (random
  hyperplanes degenerate to coordinate hyperplanes for isotropic
  embeddings) so candidate generation is an equi-join on a bucket key
  instead of a cross join.
- **banded-LSH near-dup** — candidate pairs from multi-band sign-bit
  buckets (pairs sharing >= 1 band), exact-cosine verified; the
  all-pairs form survives only as a test-side recall baseline.

All dot products run in double precision via ``zip_with``/``aggregate``
(JVM codegen, no Python). DuckDB oracles use ``list_cosine_similarity``
on DOUBLE[] — same arithmetic, differences absorbed by round(.., 6).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from golang_db_query_engine_elasticsearch_indexer_spark.functions import (
    DOT,
    DUCK_TOKENS,
    NORM,
    TOKENS,
    hash16,
)

TOP_K = 5
N_PROBES = 5  # probe set: vec_id < N_PROBES
N_SIGN_BITS = 8
NEARDUP_COS = 0.35


def _with_norm(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn("norm", F.expr(NORM.format(a=col)))


def _exact_ranked(spark: SparkSession) -> DataFrame:
    """Exact-cosine ranking of every (probe, vector) pair: the shared
    scored scan under :func:`brute_force_topk` and
    :func:`training_triplets` — (probe_id, vec_id, cos, rank), lazy.

    The probe side is tiny and broadcast; Catalyst turns the pair
    generation into BroadcastNestedLoopJoin — the data side streams
    once, which is the right physical shape for exact search at scale.
    cos is rounded to 6 dp BEFORE the ranking window (not just on
    output): sub-1e-6 float summation-order differences between the
    Spark fold and DuckDB's list_cosine_similarity could otherwise
    flip ranks near the top-k boundary; on the rounded value both
    engines apply the identical (cos DESC, vec_id) order.
    """
    emb = _with_norm(spark.table("embeddings"))
    probes = emb.where(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("p_emb"),
        F.col("norm").alias("p_norm"),
    )
    pairs = emb.crossJoin(F.broadcast(probes)).where(F.col("vec_id") != F.col("probe_id"))
    scored = pairs.withColumn(
        "cos",
        F.round(
            F.expr(DOT.format(a="p_emb", b="embedding")) / (F.col("p_norm") * F.col("norm")),
            6,
        ),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return scored.select("probe_id", "vec_id", "cos").withColumn(
        "rank", F.row_number().over(w)
    )


def brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: probes (vec_id < N_PROBES) vs all vectors
    (see :func:`_exact_ranked` for the plan shape)."""
    return (
        _exact_ranked(spark)
        .where(F.col("rank") <= TOP_K)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.col("cos").alias("cosine"),
        )
        .orderBy("probe_id", "rank")
    )


BRUTE_FORCE_ORACLE = f"""
WITH scored AS (
  SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(p.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cos
  FROM embeddings p JOIN embeddings e ON e.vec_id != p.vec_id
  WHERE p.vec_id < {N_PROBES}
),
ranked AS (
  SELECT probe_id, neighbor_id,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank,
         cos
  FROM scored
)
SELECT probe_id, neighbor_id, rank, cos AS cosine
FROM ranked WHERE rank <= {TOP_K}
ORDER BY probe_id, rank
"""

_SIGN_BUCKET = "concat({bits})"


def _bucket_expr(col: str, dialect: str) -> str:
    """Sign-bit bucket key over the first N_SIGN_BITS dimensions."""
    if dialect == "spark":
        bits = ", ".join(
            f"CASE WHEN element_at({col}, {i + 1}) >= 0 THEN '1' ELSE '0' END"
            for i in range(N_SIGN_BITS)
        )
    else:
        bits = ", ".join(
            f"CASE WHEN {col}[{i + 1}] >= 0 THEN '1' ELSE '0' END"
            for i in range(N_SIGN_BITS)
        )
    return _SIGN_BUCKET.format(bits=bits)


def lsh_bucket_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: candidates restricted to the probe's sign-bit
    bucket, ranked by exact cosine within the bucket.

    Candidate generation is an equi-join on the bucket key — a hash
    shuffle bounded by bucket occupancy, never a cross join. Recall vs
    the exact baseline is measured in tests (recall_at_k).
    """
    emb = _with_norm(spark.table("embeddings")).withColumn(
        "bucket", F.expr(_bucket_expr("embedding", "spark"))
    )
    probes = emb.where(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("p_emb"),
        F.col("norm").alias("p_norm"),
        F.col("bucket"),
    )
    pairs = emb.join(F.broadcast(probes), "bucket").where(
        F.col("vec_id") != F.col("probe_id")
    )
    # round-before-rank: see brute_force_topk.
    scored = pairs.withColumn(
        "cos",
        F.round(
            F.expr(DOT.format(a="p_emb", b="embedding")) / (F.col("p_norm") * F.col("norm")),
            6,
        ),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.col("cos").alias("cosine"),
        )
        .orderBy("probe_id", "rank")
    )


def _lsh_oracle() -> str:
    bucket = _bucket_expr("embedding", "duck")
    return f"""
WITH b AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
),
scored AS (
  SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(p.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cos
  FROM b p JOIN b e ON e.bucket = p.bucket AND e.vec_id != p.vec_id
  WHERE p.vec_id < {N_PROBES}
),
ranked AS (
  SELECT probe_id, neighbor_id,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank,
         cos
  FROM scored
)
SELECT probe_id, neighbor_id, rank, cos AS cosine
FROM ranked WHERE rank <= {TOP_K}
ORDER BY probe_id, rank
"""


# 16 bands x 4 sign bits uses all 64 embedding dimensions. At the test
# threshold (cos >= 0.35, theta ~ 69.5 deg) the per-bit collision
# probability for a qualifying pair is ~0.61, so a 4-bit band matches
# with p ~ 0.14 and 16 bands give expected recall 1-(1-p)^16 ~ 0.91
# (vs ~0.71 for the 8-band round-2 version; measured recall is asserted
# in tests and reported in bench.py). More bands = linearly more
# candidate volume; at a production near-dup threshold (>= 0.9) band
# collisions for non-dups are far rarer and the same 16x4 setting is
# comfortably sub-quadratic.
NEARDUP_BANDS = 16
NEARDUP_BAND_BITS = 4


def _band_keys_expr() -> str:
    """Spark expr: array<struct<band:int, bkey:string>> of sign-bit band
    keys — band b covers embedding dimensions b*r+1 .. b*r+r. Bands that
    would index past the embedding length are dropped (ANSI mode would
    otherwise raise INVALID_ARRAY_INDEX on short vectors; the DuckDB
    mirror has the same guard so both engines emit identical bands)."""
    r = NEARDUP_BAND_BITS
    bits = ", ".join(
        f"CASE WHEN element_at(embedding, b * {r} + {i + 1}) >= 0 THEN '1' ELSE '0' END"
        for i in range(r)
    )
    return (
        f"transform(filter(sequence(0, {NEARDUP_BANDS - 1}), "
        f"b -> (b + 1) * {r} <= size(embedding)), "
        f"b -> struct(b AS band, concat({bits}) AS bkey))"
    )


def neardup_candidates(spark: SparkSession) -> DataFrame:
    """Candidate (va, vb) pairs sharing at least one sign-bit LSH band.

    Each vector emits NEARDUP_BANDS (band, bkey) rows; candidates come
    from an equi-join on (band, bkey) — a hash shuffle bounded by band
    occupancy, never a cross join. ``distinct`` collapses pairs that
    collide in several bands. This is the sub-quadratic candidate
    generator that makes near-dup detection runnable at 100 TB; recall
    vs the exact all-pairs baseline is measured in tests.
    """
    bands = (
        spark.table("embeddings")
        .select("vec_id", F.explode(F.expr(_band_keys_expr())).alias("bk"))
        .select("vec_id", "bk.band", "bk.bkey")
    )
    a = bands.select(F.col("vec_id").alias("va"), "band", "bkey")
    b = bands.select(F.col("vec_id").alias("vb"), "band", "bkey")
    return (
        a.join(b, ["band", "bkey"])
        .where(F.col("va") < F.col("vb"))
        .select("va", "vb")
        .distinct()
    )


def neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs: banded-LSH candidates (pairs
    sharing >= 1 of NEARDUP_BANDS sign-bit bands), exact-cosine verified
    at cosine >= NEARDUP_COS, doc_a < doc_b.

    Scale shape: candidate generation is an equi-join on (band, bkey)
    (see neardup_candidates); the exact-cosine verify touches candidates
    only. The physical plan contains no CartesianProduct or
    BroadcastNestedLoopJoin over the full table — asserted in tests.
    The O(n^2) all-pairs form survives as neardup_pairs_allpairs for
    test-side recall measurement only.
    """
    emb = _with_norm(spark.table("embeddings"))
    a = emb.select(
        F.col("vec_id").alias("va"), F.col("embedding").alias("ea"), F.col("norm").alias("na")
    )
    b = emb.select(
        F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"), F.col("norm").alias("nb")
    )
    return (
        neardup_candidates(spark)
        .join(a, "va")
        .join(b, "vb")
        .withColumn("cos", F.expr(DOT.format(a="ea", b="eb")) / (F.col("na") * F.col("nb")))
        .where(F.col("cos") >= NEARDUP_COS)
        .select("va", "vb", F.round("cos", 6).alias("cosine"))
        .orderBy("va", "vb")
    )


def neardup_pairs_allpairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs near-dup (crossJoin, O(n^2)) — recall baseline
    for tests ONLY; not in the registry (unrunnable at 100 TB).
    """
    emb = _with_norm(spark.table("embeddings"))
    a = emb.select(
        F.col("vec_id").alias("va"), F.col("embedding").alias("ea"), F.col("norm").alias("na")
    )
    b = emb.select(
        F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"), F.col("norm").alias("nb")
    )
    return (
        a.crossJoin(b)
        .where(F.col("va") < F.col("vb"))
        .withColumn("cos", F.expr(DOT.format(a="ea", b="eb")) / (F.col("na") * F.col("nb")))
        .where(F.col("cos") >= NEARDUP_COS)
        .select("va", "vb", F.round("cos", 6).alias("cosine"))
        .orderBy("va", "vb")
    )


def _neardup_band_sql_duck() -> str:
    """DuckDB band-key relation mirroring _band_keys_expr exactly."""
    r = NEARDUP_BAND_BITS
    bits = ", ".join(
        f"CASE WHEN embedding[b * {r} + {i + 1}] >= 0 THEN '1' ELSE '0' END"
        for i in range(r)
    )
    return (
        f"SELECT vec_id, b AS band, concat({bits}) AS bkey "
        f"FROM embeddings, range(0, {NEARDUP_BANDS}) t(b) "
        f"WHERE (b + 1) * {r} <= len(embedding)"
    )


def _neardup_oracle() -> str:
    return f"""
WITH bands AS ({_neardup_band_sql_duck()}),
cand AS (
  SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id
)
SELECT c.va, c.vb,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM cand c
JOIN embeddings a ON a.vec_id = c.va
JOIN embeddings b ON b.vec_id = c.vb
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {NEARDUP_COS}
ORDER BY va, vb
"""


NEARDUP_ORACLE = _neardup_oracle()

# All-pairs oracle — used only by the recall test vs neardup_pairs_allpairs.
NEARDUP_ALLPAIRS_ORACLE = f"""
SELECT a.vec_id AS va, b.vec_id AS vb,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {NEARDUP_COS}
ORDER BY va, vb
"""


N_DIM = 64
N_PROBE_CELLS = 5
# The IVF-PQ composite probes wider than plain IVF: its recall ceiling
# is cell routing (every true neighbor the probed cells contain already
# survives the 100-deep ADC shortlist — measured at sf0.01), so the
# only recall lever left is probing more cells. Cells prune the LUT
# scan BEFORE it runs, so extra probes cost marginal scan width, not a
# new pass. On this fixture's weak cluster geometry (synthetic
# embeddings; the coarse quantizer explains little within-cell
# variance) that honestly means near-exhaustive probing at nlist=10:
# recall@5 = 0.76/0.80/0.84/0.88 at nprobe 5/7/9/10. nprobe/nlist is a
# per-corpus ratio — at production nlist ~ sqrt(N) a clustered corpus
# sits at 1-5% — and the measured curve is reported in bench.py, not
# hidden.
IVFPQ_NPROBE = 9
# Plain IVF is routing-limited too (exact distances inside probed
# cells can't recover a neighbor the routing never probed), so it rides
# the same nprobe lever; widened 5 -> 9 with IVFPQ (VERDICT r06 ask
# #5). Measured at sf0.01: recall@5 = 0.76 at nprobe=5, 0.96 at
# nprobe=9 — ABOVE the IVFPQ curve at the same width because exact
# in-cell distances add no ADC quantization loss on top of routing.
# Recorded as ivf_recall_at_k_sf0.01 in bench.py.
IVF_NPROBE = 9
KMEANS_K = 10
KMEANS_ITERS = 2
# Training sample: the KMEANS_SAMPLE_N vectors with the smallest
# md5(vec_id) — an ABSOLUTE cap, so quantizer training cost is constant
# in data size (a fractional sample would push ~44 TB through the Lloyd
# passes at 100 TB). md5 order is a pure function of the key, so the
# DuckDB oracle replays the same sample exactly.
KMEANS_SAMPLE_N = 100_000


def _l2(vec: list[float]) -> float:
    """L2 norm as the same left fold of IEEE doubles the NORM SQL
    expression performs (sum order matters: identical op sequence =>
    bit-identical result)."""
    import math

    acc = 0.0
    for v in vec:
        acc += v * v
    return math.sqrt(acc)


def _centroid_array_expr(cents: list[tuple[int, list[float], float]]) -> str:
    """SQL literal ``array<struct<cid,centroid,cnorm,cn2>>`` from
    collected centroids (``cn2`` = squared norm as the same left fold of
    squares the NORM SQL expression performs, pre-sqrt — PQ's ADC stage
    needs it to assemble reconstruction norms from codes alone). Doubles
    round-trip exactly via repr() -> string cast (both correctly
    rounded), so the literal is bit-identical to the collected value.
    Constant-folded at plan time; ~13 KB of SQL for k=10 x 64 dims."""

    def _sq(vec: list[float]) -> float:
        acc = 0.0
        for v in vec:
            acc += v * v
        return acc

    entries = ", ".join(
        "struct({cid} AS cid, array({vals}) AS centroid, "
        "cast('{n!r}' AS double) AS cnorm, cast('{n2!r}' AS double) AS cn2)".format(
            cid=cid,
            vals=", ".join(f"cast('{v!r}' AS double)" for v in vec),
            n=n,
            n2=_sq(vec),
        )
        for cid, vec, n in cents
    )
    return f"array({entries})"


def _scored_cells_expr(cent_expr: str) -> str:
    """Row-local array of ``struct(score, neg, cid)`` — one entry per
    centroid, cosine rounded to 6 dp. struct ordering (score asc, then
    -cid asc) makes array_max = "highest score, lowest cid on ties",
    the exact tiebreak the oracle's window (score DESC, cid) applies."""
    dot = DOT.format(a="embedding", b="c.centroid")
    return (
        f"transform({cent_expr}, c -> struct("
        f"round(({dot}) / (norm * c.cnorm), 6) AS score, "
        f"-c.cid AS neg, c.cid AS cid))"
    )


def _lloyd_iter_sql(
    view: str,
    cents: list | None = None,
    cbs: list | None = None,
    metric: str = "cos",
) -> str:
    """ONE SQL statement computing a full Lloyd iteration's per-
    (quantizer, cid, dim) means over a sample view: assignment argmaxes
    (coarse over the full vector when ``cents`` is given, tagged s = -1;
    per-subspace when ``cbs`` is given, tagged s = 0..PQ_M-1), row-local
    struct explosion, posexplode, and the 6-dp mean — the exact chain
    the trainers previously built as 5 chained DataFrame ops. Classic
    PySpark analyzes the WHOLE tree again on every chained Dataset op,
    and these trees embed the ~0.25 MB codebook literals, so one
    parse+analysis per iteration instead of five is a measured ~35%
    of standalone PQ training time (r13). Values are unchanged: same
    expressions, same group contents (the constant s tag cannot change
    a group), same rounding."""
    cid_exprs: list[str] = []
    structs: list[str] = []
    subs: list[str] = []
    if cbs is not None:
        for s in range(PQ_M):
            subs.append(f"slice(embedding, {s * PQ_SUB + 1}, {PQ_SUB}) AS sub{s}")
            cb = _centroid_array_expr(cbs[s])
            dot = DOT.format(a=f"sub{s}", b="c.centroid")
            if metric == "l2":
                score = f"round(({dot}) - c.cn2 / 2, 9)"
            else:
                nsub = NORM.format(a=f"sub{s}")
                score = f"round(({dot}) / (({nsub}) * c.cnorm), 6)"
            cid_exprs.append(
                f"array_max(transform({cb}, c -> struct("
                f"{score} AS score, -c.cid AS neg, c.cid AS cid))).cid AS cid{s}"
            )
            structs.append(f"struct({s} AS s, cid{s} AS cid, sub{s} AS v)")
    if cents is not None:
        cid_exprs.append(
            f"array_max({_scored_cells_expr(_centroid_array_expr(cents))}).cid"
            " AS cidc"
        )
        structs.append("struct(-1 AS s, cidc AS cid, embedding AS v)")
    carry = []
    if cents is not None:
        carry.append("embedding")
    carry.extend(f"sub{s}" for s in range(PQ_M) if cbs is not None)
    layer1 = ["embedding", *subs] + (["norm"] if cents is not None else [])
    return (
        "SELECT e.s AS s, e.cid AS cid, pos,"
        " round(avg(cast(val AS double)), 6) AS cv\n"
        "FROM (\n"
        "  SELECT explode(array(" + ", ".join(structs) + ")) AS e\n"
        "  FROM (SELECT " + ", ".join(cid_exprs + carry) + "\n"
        "        FROM (SELECT " + ", ".join(layer1) + f" FROM {view}))\n"
        ") x LATERAL VIEW posexplode(e.v) t AS pos, val\n"
        "GROUP BY e.s, e.cid, pos"
    )


def _collect_lloyd_stats(spark: SparkSession, view: str, **kw):
    """Run one fused Lloyd iteration (see :func:`_lloyd_iter_sql`) and
    split the collected means into (coarse_by_cid, by_subspace)."""
    coarse: dict[int, dict[int, float]] = {}
    by_s: list[dict[int, dict[int, float]]] = [{} for _ in range(PQ_M)]
    for r in spark.sql(_lloyd_iter_sql(view, **kw)).collect():
        tgt = coarse if int(r["s"]) < 0 else by_s[int(r["s"])]
        tgt.setdefault(int(r["cid"]), {})[int(r["pos"])] = float(r["cv"])
    return coarse, by_s


def _cents_from_stats(by_cid: dict) -> list[tuple[int, list[float], float]]:
    return [
        (cid, [dims[p] for p in sorted(dims)], _l2([dims[p] for p in sorted(dims)]))
        for cid, dims in sorted(by_cid.items())
    ]


def _kmeans_cents(
    spark: SparkSession,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    vec_expr: str = "embedding",
    samp: DataFrame | None = None,
) -> list[tuple[int, list[float], float]]:
    """Learned IVF coarse quantizer: Lloyd's k-means, fully
    deterministic (replaces the round-2 per-label-mean stand-in).
    Returns ``[(cid, centroid, cnorm)]`` — k rows on the driver, the
    "build once" artifact the search path broadcasts.

    - **Train on a sample**: the quantizer fits on the KMEANS_SAMPLE_N
      vectors with the smallest ``md5(vec_id)`` — a bounded top-N
      (TakeOrderedAndProject), so at 100 TB the Lloyd passes touch a
      constant-size sample while assignment still covers every vector,
      the standard IVF build recipe. md5 membership is a pure function
      of the key, so the oracle replays it exactly.
    - **Init**: the k sampled vectors with the smallest ``md5(vec_id)``
      — a seedless deterministic pseudo-random draw both engines
      compute identically (no rand()).
    - **Iterate** ``iters`` times: assign each sampled vector to its
      nearest centroid by cosine (score rounded to 6 dp, centroid-id
      tiebreak — cell boundaries are engine-independent), then
      recompute each centroid as the per-dimension mean of its members,
      also rounded to 6 dp so float-summation-order differences between
      engines cannot leak into the next assignment.

    Scale shape: centroids live on the driver between iterations (k x
    dim doubles — bytes), exactly like MLlib's KMeans. Each iteration
    is ONE map-only pass over the sample (assignment is a row-local
    argmax against the centroid literal — no join, no window shuffle)
    feeding one k*dim-group aggregation. All rounding happens
    Spark-side, so every collected value is one the oracle's SQL also
    computes; Python only shuttles exact doubles.
    """
    # The sample is constant-size (KMEANS_SAMPLE_N rows) no matter the
    # corpus, so pinning it for the training scope is legitimate at any
    # scale — without it the seed draw and every Lloyd pass would each
    # rerun the full-table top-N scan. Released in the finally: the
    # trainer returns plain Python data, nothing downstream can hold
    # the cache. A composite build (IVF-PQ) passes its own persisted
    # ``samp`` — (embedding, norm, h), the identical top-N draw — so
    # coarse and codebook training share ONE sample scan; a
    # caller-owned sample is never unpersisted here.
    owned = samp is None
    if owned:
        samp = (
            spark.table("embeddings")
            .selectExpr("vec_id", f"{vec_expr} AS embedding")
            .withColumn("norm", F.expr(NORM.format(a="embedding")))
            .withColumn("h", F.md5(F.col("vec_id").cast("string")))
            .orderBy("h")
            .limit(KMEANS_SAMPLE_N)
            .select("embedding", "norm", "h")
            .persist()
        )
    else:
        samp = samp.select("embedding", "norm", "h")
    try:
        seed_rows = (
            samp.orderBy("h")
            .limit(k)
            .selectExpr("transform(embedding, x -> round(cast(x AS double), 6)) AS c")
            .collect()
        )
        cents = [
            (i + 1, list(r["c"]), _l2(r["c"])) for i, r in enumerate(seed_rows)
        ]
        samp.createOrReplaceTempView("__km_samp")
        for _ in range(iters):
            # One SQL per iteration (see _lloyd_iter_sql): k * N_DIM
            # result rows — constant-size.
            by_cid, _unused = _collect_lloyd_stats(spark, "__km_samp", cents=cents)
            cents = _cents_from_stats(by_cid)
    finally:
        # Per-iteration statements collect eagerly, so nothing outlives
        # the loop that needs the view; leaving it registered leaks a
        # fixed-name view into the session catalog (ADVICE r13).
        spark.catalog.dropTempView("__km_samp")
        if owned:
            samp.unpersist()
    return cents


def kmeans_centroids(spark: SparkSession, k: int = KMEANS_K, iters: int = KMEANS_ITERS) -> DataFrame:
    """DataFrame view of the learned quantizer (see _kmeans_cents):
    ``(cid, centroid, cnorm)``, k rows, local relation — broadcasting
    it is free and nothing downstream can re-trigger training."""
    return spark.createDataFrame(
        _kmeans_cents(spark, k, iters), "cid int, centroid array<double>, cnorm double"
    )


def ivf_build(spark: SparkSession) -> list[tuple[int, list[float], float]]:
    """Train the IVF coarse quantizer ONCE and return the artifact
    (``[(cid, centroid, cnorm)]`` — bytes on the driver). The "build
    once, search many" split: pass the artifact to ``ivf_topk`` via
    ``cents=`` and every subsequent search skips training entirely (at
    100 TB the same list would round-trip through a k-row parquet
    table). bench.py times build and search separately."""
    return _kmeans_cents(spark)


def _cents_to_jsonable(cents):
    """Centroid list -> JSON-serializable form (float repr round-trips
    exactly, so reloaded artifacts are bit-identical)."""
    return [[cid, vec, n] for cid, vec, n in cents]


def _cents_from_jsonable(data):
    return [(int(cid), [float(x) for x in vec], float(n)) for cid, vec, n in data]


def ivf_index_save(cents: list[tuple[int, list[float], float]], path: str) -> None:
    """Persist the IVF coarse-quantizer artifact (k centroids, ~13 KB)
    as JSON."""
    import json  # noqa: PLC0415

    with open(path, "w") as f:
        json.dump(_cents_to_jsonable(cents), f)


def ivf_index_load(path: str) -> list[tuple[int, list[float], float]]:
    """Reload a persisted IVF artifact for ``ivf_topk(cents=...)``."""
    import json  # noqa: PLC0415

    with open(path) as f:
        return _cents_from_jsonable(json.load(f))


def ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    nprobe: int = IVF_NPROBE,
    cents: list[tuple[int, list[float], float]] | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize vectors into cells (nearest
    learned k-means centroid), probe the ``nprobe`` nearest cells per
    query, exact cosine top-k within the probed cells only.

    Scale shape: k-means runs exactly once (driver-resident k-row
    artifact — the "build once, search many" IVF shape: callers that
    search repeatedly train via ``ivf_build`` and pass ``cents=``;
    with ``cents=None`` the query is self-contained and trains inline,
    the driver-contract path). Cell assignment is a ROW-LOCAL argmax
    against the centroid literal — a map-only pass under whole-stage
    codegen with no join and no window shuffle of the big side.
    Probe-cell ranking reads only the pushed-down ``vec_id < N_PROBES``
    slice; search touches ~nprobe/nlist of the data instead of all of
    it. Recall@k vs the brute-force baseline is asserted in tests
    (>= 0.5 floor) and reported by bench.py.
    """
    if cents is None:
        cents = _kmeans_cents(spark)
    cells = _scored_cells_expr(_centroid_array_expr(cents))
    emb = _with_norm(spark.table("embeddings")).select("vec_id", "embedding", "norm")
    assigned = emb.withColumn("cell", F.expr(f"array_max({cells}).cid"))
    # Top-nprobe cells per probe: sort the k scored structs desc and
    # slice — (score asc, -cid asc) reversed = score desc, cid asc.
    probe_cells = (
        emb.where(F.col("vec_id") < N_PROBES)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.explode(F.expr(f"slice(reverse(array_sort({cells})), 1, {nprobe})")).alias("pc"),
        )
        .select("probe_id", F.col("pc.cid").alias("cell"))
    )
    probes = emb.where(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("p_emb"),
        F.col("norm").alias("p_norm"),
    )
    cand = assigned.join(F.broadcast(probe_cells), "cell").where(
        F.col("vec_id") != F.col("probe_id")
    )
    # round-before-rank: see brute_force_topk.
    scored = cand.join(F.broadcast(probes), "probe_id").withColumn(
        "cos",
        F.round(
            F.expr(DOT.format(a="p_emb", b="embedding")) / (F.col("p_norm") * F.col("norm")),
            6,
        ),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.col("cos").alias("cosine"),
        )
        .orderBy("probe_id", "rank")
    )


def _kmeans_oracle_ctes(
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    include_samp: bool = True,
    seeds: str = "seeds",
) -> str:
    """DuckDB CTE chain mirroring kmeans_centroids step for step
    (unrolled Lloyd's iterations, same init / rounding / tiebreaks).
    ``include_samp=False`` / ``seeds=`` let the chain be embedded next
    to the PQ chain (which defines its own identical ``samp`` and a
    differently-sized ``seeds``) without CTE-name collisions."""
    samp_cte = (
        f"""samp AS (
  SELECT * FROM embeddings
  ORDER BY md5(cast(vec_id AS varchar)) LIMIT {KMEANS_SAMPLE_N}
),
"""
        if include_samp
        else ""
    )
    parts = [
        f"""{samp_cte}{seeds} AS (
  SELECT vec_id, md5(cast(vec_id AS varchar)) AS h
  FROM samp ORDER BY h LIMIT {k}
),
cent0 AS (
  SELECT row_number() OVER (ORDER BY s.h) AS cid,
         list_transform(e.embedding, x -> round(cast(x AS double), 6)) AS centroid
  FROM {seeds} s JOIN embeddings e USING (vec_id)
)"""
    ]
    for it in range(1, iters + 1):
        prev = f"cent{it - 1}"
        parts.append(
            f"""assign{it} AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], c.centroid), 6) DESC,
                      c.cid) AS rn
    FROM samp e, {prev} c)
  WHERE rn = 1
),
cent{it} AS (
  SELECT cid, list(cv ORDER BY i) AS centroid FROM (
    SELECT a.cid, i, round(avg(e.embedding[i]::DOUBLE), 6) AS cv
    FROM assign{it} a JOIN samp e USING (vec_id), range(1, {N_DIM + 1}) t(i)
    GROUP BY a.cid, i)
  GROUP BY cid
)"""
        )
    return ",\n".join(parts)


IVF_ORACLE = f"""
WITH {_kmeans_oracle_ctes()},
cell_scores AS (
  SELECT e.vec_id, c.cid,
         round(list_cosine_similarity(e.embedding::DOUBLE[], c.centroid), 6) AS score
  FROM embeddings e, cent{KMEANS_ITERS} c
),
ranked_cells AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
  FROM cell_scores
),
assigned AS (SELECT vec_id, cid AS cell FROM ranked_cells WHERE rn = 1),
probe_cells AS (
  SELECT vec_id AS probe_id, cid AS cell
  FROM ranked_cells WHERE vec_id < {N_PROBES} AND rn <= {IVF_NPROBE}
),
cand AS (
  SELECT pc.probe_id, a.vec_id
  FROM assigned a JOIN probe_cells pc USING (cell)
  WHERE a.vec_id != pc.probe_id
),
scored AS (
  SELECT c.probe_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(p.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cos
  FROM cand c
  JOIN embeddings p ON p.vec_id = c.probe_id
  JOIN embeddings e ON e.vec_id = c.vec_id
),
ranked AS (
  SELECT probe_id, neighbor_id,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank,
         cos
  FROM scored
)
SELECT probe_id, neighbor_id, rank, cos AS cosine
FROM ranked WHERE rank <= {TOP_K}
ORDER BY probe_id, rank
"""


PQ_M = 8       # subspaces
PQ_SUB = 8     # dims per subspace (PQ_M * PQ_SUB = N_DIM)
PQ_K = 16      # codes per subspace -> 8 x 4-bit codes per vector
# PQ shortlist size fed to the exact re-rank stage. 100 = 20x k, the
# standard over-fetch band: measured recall@5 at sf0.01 jumped 0.72 ->
# 0.88 (plain PQ) and 0.64 -> 0.76 (IVF-PQ — exactly the IVF routing
# ceiling, i.e. the shortlist no longer loses anything the probed
# cells contain) when widened from 50, while the re-rank still touches
# only shortlist x probes rows — deeper showed no further gain (0.76 /
# 0.88 flat at 200).
PQ_RERANK = 100


def pq_train(
    spark: SparkSession,
    source: DataFrame | None = None,
    metric: str = "cos",
    samp: DataFrame | None = None,
) -> list[list[tuple[int, list[float], float]]]:
    """Train the PQ_M per-subspace codebooks — deterministic Lloyd's,
    value-for-value identical to running ``_kmeans_cents`` once per
    subspace over slice views (the DuckDB oracle's unrolled per-subspace
    CTE chains mirror that definition), but FUSED: all 8 subspaces share
    one persisted sample and each Lloyd iteration is ONE pass computing
    every subspace's assignments and per-(subspace, cid, dim) means
    together, instead of 8 independent sample scans and ~24 sequential
    collects. Cuts codebook training from ~25 driver round-trips to 4
    (the r04 verdict's per-query-training cost item). Driver-resident
    artifact: PQ_M * PQ_K * PQ_SUB doubles (~8 KB).

    ``source`` (default: the embeddings table) must expose
    (vec_id, embedding); the residual IVF-PQ build trains the same
    codebooks over the residual relation.

    ``metric``: 'cos' (default — spherical assignment, matches the
    cosine retrieval the raw-vector entries serve and their oracles
    replay) or 'l2' (argmin ||x - c||^2 via the dot - cn2/2 identity —
    REQUIRED for residual codebooks: residual magnitude carries the
    information, and cosine assignment ignores it; measured recall of
    residual IVF-PQ with cosine-assigned codes was 0.56, i.e. WORSE
    than raw-vector codes, while l2 assignment is what makes IVFADC's
    refinement actually pay)."""
    # ``samp``: a caller-owned persisted (embedding, h) top-N draw —
    # the composite builds pass the ONE shared sample both trainers use
    # (identical rows to the draw below; never unpersisted here).
    owned = samp is None
    if owned:
        if source is None:
            source = spark.table("embeddings")
        samp = (
            source
            .select("vec_id", "embedding")
            .withColumn("h", F.md5(F.col("vec_id").cast("string")))
            .orderBy("h")
            .limit(KMEANS_SAMPLE_N)
            .select("embedding", "h")
            .persist()
        )
    else:
        samp = samp.select("embedding", "h")
    try:
        seed_rows = (
            samp.orderBy("h")
            .limit(PQ_K)
            .selectExpr(
                *[
                    f"transform(slice(embedding, {s * PQ_SUB + 1}, {PQ_SUB}), "
                    f"x -> round(cast(x AS double), 6)) AS c{s}"
                    for s in range(PQ_M)
                ]
            )
            .collect()
        )
        cbs = [
            [(i + 1, list(r[f"c{s}"]), _l2(r[f"c{s}"])) for i, r in enumerate(seed_rows)]
            for s in range(PQ_M)
        ]
        samp.createOrReplaceTempView("__pq_samp")
        for _ in range(KMEANS_ITERS):
            # Per-subspace nearest-centroid cid with the same scored-
            # struct argmax (round-6 scores, lowest-cid tiebreak) the
            # single-subspace trainer applies, then one explosion to
            # (s, cid, pos, val) and ONE aggregation for all subspaces,
            # all in ONE SQL statement per iteration (_lloyd_iter_sql):
            # PQ_M * PQ_K * PQ_SUB result rows — constant-size.
            _unused, by_s = _collect_lloyd_stats(
                spark, "__pq_samp", cbs=cbs, metric=metric
            )
            cbs = [_cents_from_stats(by_cid) for by_cid in by_s]
    finally:
        spark.catalog.dropTempView("__pq_samp")
        if owned:
            samp.unpersist()
    return cbs


def _fused_ivfpq_train(spark: SparkSession, samp: DataFrame):
    """Train the coarse quantizer AND the PQ_M raw-vector codebooks in
    fused passes over one shared sample: ONE seed collect (the top
    max(KMEANS_K, PQ_K) rows by ``h`` serve both trainers — the coarse
    seeds are its first KMEANS_K rows, and rounding commutes with
    slicing, so per-subspace seed slices equal slices of the rounded
    full vector) and ONE assignment + stats job per Lloyd iteration
    (the 9 independent argmaxes — coarse over the full vector, one per
    subspace — compute in one projection; the per-(quantizer, cid, dim)
    means come out of one aggregation keyed by a quantizer tag, s = -1
    for coarse). Value-for-value identical to ``_kmeans_cents`` +
    ``pq_train`` over the same sample — same assignments, same group
    contents, same 6-dp rounding; grouping by the extra tag cannot
    change any group — so the DuckDB oracle replay is untouched.
    Cuts the composite build from 7 driver round-trips to 3.
    Returns ``(cents, cbs)``."""
    samp = samp.select("embedding", "norm", "h")
    n_seed = max(KMEANS_K, PQ_K)
    seed_rows = (
        samp.orderBy("h")
        .limit(n_seed)
        .selectExpr("transform(embedding, x -> round(cast(x AS double), 6)) AS c")
        .collect()
    )
    cents = [
        (i + 1, list(r["c"]), _l2(r["c"])) for i, r in enumerate(seed_rows[:KMEANS_K])
    ]
    cbs = [
        [
            (i + 1, list(r["c"])[s * PQ_SUB : (s + 1) * PQ_SUB],
             _l2(list(r["c"])[s * PQ_SUB : (s + 1) * PQ_SUB]))
            for i, r in enumerate(seed_rows[:PQ_K])
        ]
        for s in range(PQ_M)
    ]
    samp.createOrReplaceTempView("__ivfpq_samp")
    try:
        for _ in range(KMEANS_ITERS):
            # One SQL statement per iteration (_lloyd_iter_sql): the 9
            # argmaxes (coarse + 8 subspaces) in one projection, one
            # explosion to (s, cid, pos, val), one aggregation.
            # KMEANS_K * N_DIM + PQ_M * PQ_K * PQ_SUB result rows —
            # constant-size.
            coarse_by_cid, by_s = _collect_lloyd_stats(
                spark, "__ivfpq_samp", cents=cents, cbs=cbs
            )
            cents = _cents_from_stats(coarse_by_cid)
            cbs = [_cents_from_stats(by_cid) for by_cid in by_s]
    finally:
        spark.catalog.dropTempView("__ivfpq_samp")
    return cents, cbs


def _pq_encode(
    df: DataFrame,
    cb_exprs: list[str],
    extra: tuple[str, ...] = (),
    metric: str = "cos",
) -> DataFrame:
    """Encode (vec_id, embedding) rows into PQ codes: one POSITION per
    subspace into that subspace's codebook array (``pos{s}``, tinyint —
    4 bits of information for PQ_K=16) plus the reconstruction norm
    ``rnorm`` assembled from the codebooks' stored squared norms
    (disjoint subspaces => ||recon||^2 = sum of chosen centroids'
    squared norms; no 64-dim reconstruction is ever materialized).

    Positions, not cids: Lloyd's can drop a cluster that receives no
    sample points, leaving cid gaps, so positional indexing by cid-1
    would silently misalign (ADVICE r04). The argmax yields the array
    POSITION directly (codebooks are cid-sorted, so position order
    equals cid order and the lowest-cid tiebreak is preserved); all
    later lookups are element_at(codebook, pos + 1) — gap-proof. The
    DuckDB oracle keeps cids and joins by them: position <-> cid is a
    bijection, so both engines choose the same centroid.

    Zero-norm guard: an all-zero sub-slice has no defined cosine; both
    this path and the DuckDB oracle deterministically assign position 0
    (the lowest cid) instead of letting NULL/NaN scores diverge between
    engines (Spark 0/0 -> NaN, DuckDB list_cosine_similarity -> -1).

    Map-only: every expression is row-local under whole-stage codegen.
    ONE SQL statement over a view of ``df`` (the three nested
    projections below were previously three chained selectExpr calls;
    classic PySpark re-analyzes the whole tree per chained op, and
    these trees embed the codebook literals — the same measured cost
    _lloyd_iter_sql removes from the trainers).
    """
    pos_exprs = []
    for s in range(PQ_M):
        dot = DOT.format(a=f"sub{s}", b="c.centroid")
        if metric == "l2":
            # argmin ||x - c||^2 via the dot - cn2/2 identity; no
            # zero-norm guard needed (L2 is defined at the origin).
            pos_exprs.append(
                f"cast(array_max(transform({cb_exprs[s]}, (c, i) -> struct("
                f"round(({dot}) - c.cn2 / 2, 9) AS score, "
                f"-i AS neg, i AS pos))).pos AS tinyint) AS pos{s}"
            )
        else:
            pos_exprs.append(
                f"CASE WHEN nsub{s} = 0D THEN cast(0 AS tinyint) ELSE "
                f"cast(array_max(transform({cb_exprs[s]}, (c, i) -> struct("
                f"round(({dot}) / (nsub{s} * c.cnorm), 6) AS score, "
                f"-i AS neg, i AS pos))).pos AS tinyint) END AS pos{s}"
            )
    rn2 = " + ".join(
        f"element_at({cb_exprs[s]}, cast(pos{s} AS int) + 1).cn2" for s in range(PQ_M)
    )
    extra_cols = ("".join(f"{c}, " for c in extra))
    subs = ", ".join(
        f"slice(embedding, {s * PQ_SUB + 1}, {PQ_SUB}) AS sub{s}" for s in range(PQ_M)
    )
    nsubs = ", ".join(f"{NORM.format(a=f'sub{s}')} AS nsub{s}" for s in range(PQ_M))
    poss = ", ".join(f"pos{s}" for s in range(PQ_M))
    df.createOrReplaceTempView("__pq_encode_src")
    try:
        # spark.sql analyzes eagerly — the returned frame's plan is
        # already bound, so the view can be dropped immediately
        # (ADVICE r13: fixed-name views must not outlive the call).
        return df.sparkSession.sql(
            f"SELECT vec_id, {extra_cols}{poss}, sqrt({rn2}) AS rnorm\n"
            f"FROM (SELECT *, {', '.join(pos_exprs)}\n"
            f"  FROM (SELECT *, {nsubs}\n"
            f"    FROM (SELECT vec_id, {extra_cols}{subs}"
            " FROM __pq_encode_src)))"
        )
    finally:
        df.sparkSession.catalog.dropTempView("__pq_encode_src")


def _pq_probe_luts(spark: SparkSession, cb_exprs: list[str]) -> DataFrame:
    """Per-probe ADC lookup tables: for each subspace, the array of
    partial dot products (probe sub-slice . codebook centroid) aligned
    with the codebook's array positions — PQ_M arrays of PQ_K doubles
    per probe (~1 KB), broadcast to the code scan."""
    probes = _with_norm(spark.table("embeddings")).where(F.col("vec_id") < N_PROBES)
    lut_cols = []
    for s in range(PQ_M):
        psub = f"slice(embedding, {s * PQ_SUB + 1}, {PQ_SUB})"
        dot = DOT.format(a=psub, b="c.centroid")
        lut_cols.append(f"transform({cb_exprs[s]}, c -> {dot}) AS lut{s}")
    return probes.selectExpr("vec_id AS probe_id", "norm AS p_norm", *lut_cols)


class PQIndex:
    """Built PQ artifact: driver-resident codebooks + the encoded code
    table (optionally persisted). The 'build once, search many' handle
    — ``pq_build`` -> N x ``pq_search`` -> ``release()``."""

    def __init__(self, codebooks, codes: DataFrame, persisted: bool):
        self.codebooks = codebooks
        self.cb_exprs = [_centroid_array_expr(cb) for cb in codebooks]
        self.codes = codes
        self._persisted = persisted

    def release(self) -> None:
        if self._persisted:
            self.codes.unpersist()
            self._persisted = False


def pq_build(spark: SparkSession, sf_dir: str, persist: bool = True) -> PQIndex:
    """Train codebooks and encode the corpus into the code table
    (vec_id, pos0..pos7, rnorm — PQ_M tinyints + one double instead of
    64 floats: the 64x-smaller relation the ADC scan streams). With
    ``persist=True`` the code table is materialized (count() forces it)
    so repeated searches never re-run training or encoding — the caller
    releases it via ``index.release()``. At 100 TB the code table would
    live as a parquet table beside the embedding store."""
    cbs = pq_train(spark)
    cb_exprs = [_centroid_array_expr(cb) for cb in cbs]
    codes = _pq_encode(
        spark.table("embeddings").select("vec_id", "embedding"), cb_exprs
    )
    index = PQIndex(cbs, codes, False)
    if persist:
        index.codes = codes.persist()
        index.codes.count()
        index._persisted = True
    return index


def pq_index_append(
    spark: SparkSession, index: PQIndex, new_vectors: DataFrame
) -> PQIndex:
    """Incremental index maintenance — the missing third verb of the
    build/search lifecycle: encode NEW vectors with the index's FROZEN
    codebooks and union them into the code table. No retraining, no
    re-encoding of existing codes; the appended batch is one map-only
    encode pass over the new rows only, so daily ingest costs O(new),
    not O(corpus). (Codebook drift under a shifting distribution is
    the operator's responsibility: retrain via ``pq_build`` when
    measured recall decays — the standard faiss add/retrain split.)

    ``new_vectors`` needs (vec_id, embedding) columns; the returned
    index owns a fresh persisted union (release the old index if it
    was persisted separately)."""
    new_codes = _pq_encode(
        new_vectors.select("vec_id", "embedding"), index.cb_exprs
    )
    merged = index.codes.unionByName(new_codes)
    out = PQIndex(index.codebooks, merged, False)
    out.codes = merged.persist()
    out.codes.count()
    out._persisted = True
    return out


def _exact_rerank(spark: SparkSession, shortlist: DataFrame) -> DataFrame:
    """Exact-cosine re-rank of a tiny (probe_id, vec_id) shortlist
    against the original vectors: the shortlist broadcasts into one
    corpus scan, round-before-rank as everywhere (brute_force)."""
    probes = _with_norm(spark.table("embeddings")).where(
        F.col("vec_id") < N_PROBES
    ).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("p_emb"),
        F.col("norm").alias("p_norm"),
    )
    emb = _with_norm(spark.table("embeddings")).select("vec_id", "embedding", "norm")
    exact = (
        emb.join(F.broadcast(shortlist), "vec_id")
        .join(F.broadcast(probes), "probe_id")
        .withColumn(
            "cos",
            F.round(
                F.expr(DOT.format(a="p_emb", b="embedding"))
                / (F.col("p_norm") * F.col("norm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.col("cos").alias("cosine"),
        )
        .orderBy("probe_id", "rank")
    )


def pq_index_save(index: PQIndex, path: str) -> None:
    """Persist the built PQ artifact to storage: the code table as
    parquet (the narrow relation searches stream — at 100 TB this
    lives partitioned beside the embedding store) and the driver-
    resident codebooks as a JSON sidecar (~8 KB; float repr round-trips
    exactly, so reloaded literals are bit-identical)."""
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415

    index.codes.write.mode("overwrite").parquet(os.path.join(path, "codes"))
    with open(os.path.join(path, "codebooks.json"), "w") as f:
        json.dump([_cents_to_jsonable(cb) for cb in index.codebooks], f)


def pq_index_load(spark: SparkSession, path: str) -> PQIndex:
    """Reload a persisted PQ artifact: searches resume without any
    training or encoding (the cold-start 'build once, search many'
    path across sessions, not just within one)."""
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415

    with open(os.path.join(path, "codebooks.json")) as f:
        cbs = [_cents_from_jsonable(cb) for cb in json.load(f)]
    codes = spark.read.parquet(os.path.join(path, "codes"))
    return PQIndex(cbs, codes, False)


def pq_search(spark: SparkSession, sf_dir: str, index: PQIndex) -> DataFrame:
    """ADC search over stored codes + exact re-rank.

    The ADC stage scores CODES, not reconstructions: each probe carries
    PQ_M lookup tables of its partial dots against every codebook
    centroid (computed once per probe, broadcast), so scoring one doc is
    PQ_M array lookups + adds — the scan streams the narrow code table,
    never a 64-dim vector. That is PQ's actual economics (Jegou et al.,
    TPAMI 2011): the corpus the scan touches is 64x smaller and per-pair
    arithmetic drops from O(dim) multiplies to O(M) lookups. adc_cos is
    mathematically identical to cos(probe, reconstruction) because
    subspaces are disjoint: dot(p, recon) = sum_s lut_s[pos_s] and
    ||recon||^2 = sum_s cn2_s[pos_s].

    The PQ_RERANK-deep shortlist per probe is then re-scored exactly
    against the original vectors (quantization error only costs recall
    when a true neighbor misses the whole shortlist, not when ranks
    jiggle inside it). Both stages rank on values rounded to 6 dp with
    vec_id tiebreaks, so the DuckDB oracle replays rank-for-rank.
    """
    index.codes.createOrReplaceTempView("__pq_codes")
    try:
        return spark.sql(_adc_rerank_sql("__pq_codes", index.cb_exprs))
    finally:
        spark.catalog.dropTempView("__pq_codes")


def _adc_rerank_sql(
    codes_rel: str,
    cb_exprs: list[str],
    cells_expr: str | None = None,
    nprobe: int | None = None,
    residual: "IVFPQResidualIndex | None" = None,
) -> str:
    """ONE SQL statement for the whole ADC search (the luts / ADC scan /
    shortlist window / exact re-rank chain — the same relations
    ``_pq_probe_luts`` + ``_exact_rerank`` build, mirrored text-for-
    text; previously ~12 chained Dataset ops each re-analyzing the
    codes lineage with its embedded codebook literals — measured ~1.8 s
    of pure analysis per self-contained search at sf0.1). With
    ``cells_expr``/``nprobe`` set, the ADC scan is additionally routed
    through the broadcast (probe, cell) relation — the IVF-PQ composite;
    otherwise it is the plain PQ full-code scan. With ``residual`` set
    (an :class:`IVFPQResidualIndex`), the routing relation additionally
    carries the per-(probe, cell) coarse terms (cell_dot, cell_cn2) and
    the ADC score reconstructs cos(p, c + r-hat) from the residual
    codes via the index's constant driver-resident cross/cn2 maps —
    the same arithmetic, term for term, as the chained form it
    replaces. BROADCAST hints name the FROM-clause aliases (hints bind
    to the alias when one is present — naming the CTE leaves the hint
    unresolved; locally the size estimator still picked broadcast, but
    at real scale the shortlist/LUT relations have no usable estimate,
    so the hint is the scale-safety contract)."""
    lut_cols = []
    for s in range(PQ_M):
        psub = f"slice(embedding, {s * PQ_SUB + 1}, {PQ_SUB})"
        dot = DOT.format(a=psub, b="c.centroid")
        lut_cols.append(f"transform({cb_exprs[s]}, c -> {dot}) AS lut{s}")
    num = " + ".join(
        f"element_at(lut{s}, cast(pos{s} AS int) + 1)" for s in range(PQ_M)
    )
    score = f"round(({num}) / (l.p_norm * c.rnorm), 6) AS adc_cos"
    if residual is not None:
        cells_expr = residual.cells_expr
        cbr = _centroid_array_expr(residual.cents)
        cell_dot = DOT.format(
            a="p_emb", b=f"filter({cbr}, c -> c.cid = pc.cid)[0].centroid"
        )
        routing_cte = f""",
pcells AS (
  SELECT probe_id, pc.cid AS cell,
         {cell_dot} AS cell_dot,
         element_at({residual.cell_cn2_expr}, pc.cid) AS cell_cn2
  FROM (
    SELECT vec_id AS probe_id, embedding AS p_emb,
           explode(slice(reverse(array_sort({cells_expr})), 1, {nprobe})) AS pc
    FROM (SELECT vec_id, embedding, {NORM.format(a='embedding')} AS norm
          FROM embeddings WHERE vec_id < {N_PROBES}))
)"""
        rn2 = " + ".join(
            f"element_at({cb_exprs[s]}, cast(pos{s} AS int) + 1).cn2"
            for s in range(PQ_M)
        )
        crossv = " + ".join(
            f"element_at({residual.cross_exprs[s]}, c.cell * {PQ_K}"
            f" + cast(pos{s} AS int))"
            for s in range(PQ_M)
        )
        den = f"pc.cell_cn2 + 2 * ({crossv}) + ({rn2})"
        score = (
            f"round((pc.cell_dot + {num}) / "
            f"nullif(l.p_norm * sqrt(greatest({den}, 0D)), 0D), 6) AS adc_cos"
        )
    if cells_expr is not None:
        if residual is None:
            routing_cte = f""",
pcells AS (
  SELECT probe_id, pc.cid AS cell FROM (
    SELECT vec_id AS probe_id,
           explode(slice(reverse(array_sort({cells_expr})), 1, {nprobe})) AS pc
    FROM (SELECT vec_id, embedding, {NORM.format(a='embedding')} AS norm
          FROM embeddings WHERE vec_id < {N_PROBES}))
)"""
        adc_from = (
            f"FROM {codes_rel} c\n"
            "  JOIN pcells pc ON pc.cell = c.cell\n"
            "  JOIN luts l ON l.probe_id = pc.probe_id\n"
            "  WHERE c.vec_id != pc.probe_id"
        )
        adc_hint = "/*+ BROADCAST(pc), BROADCAST(l) */ "
    else:
        routing_cte = ""
        adc_from = f"FROM {codes_rel} c CROSS JOIN luts l WHERE c.vec_id != l.probe_id"
        adc_hint = "/*+ BROADCAST(l) */ "
    return f"""
WITH luts AS (
  SELECT vec_id AS probe_id, {NORM.format(a='embedding')} AS p_norm,
         {", ".join(lut_cols)}
  FROM embeddings WHERE vec_id < {N_PROBES}
),
probes AS (
  SELECT vec_id AS probe_id, embedding AS p_emb,
         {NORM.format(a='embedding')} AS p_norm
  FROM embeddings WHERE vec_id < {N_PROBES}
){routing_cte},
adc AS (
  SELECT {adc_hint}c.vec_id, l.probe_id,
         {score}
  {adc_from}
),
shortlist AS (
  SELECT probe_id, vec_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY probe_id ORDER BY adc_cos DESC, vec_id) AS srn
    FROM adc)
  WHERE srn <= {PQ_RERANK}
),
exact AS (
  SELECT /*+ BROADCAST(s), BROADCAST(p) */ s.probe_id, e.vec_id,
         round(({DOT.format(a='p.p_emb', b='e.embedding')})
               / (p.p_norm * {NORM.format(a='e.embedding')}), 6) AS cos
  FROM embeddings e
  JOIN shortlist s ON s.vec_id = e.vec_id
  JOIN probes p ON p.probe_id = s.probe_id
)
SELECT probe_id, vec_id AS neighbor_id, rank, cos AS cosine FROM (
  SELECT *, row_number() OVER (
    PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rank
  FROM exact)
WHERE rank <= {TOP_K}
ORDER BY probe_id, rank
"""


def pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with exact re-rank: the billion-scale
    serving recipe (compress -> LUT scan -> re-rank), self-contained
    for the driver contract (build inline, nothing persisted). Repeat
    searchers use ``pq_build``/``pq_search`` and pay training+encoding
    once; bench.py reports build and search timings separately."""
    return pq_search(spark, sf_dir, pq_build(spark, sf_dir, persist=False))


def _pq_artifact_path(sf_dir: str) -> str:
    """Deterministic on-disk location for the PQ artifact of one
    fixture directory: keyed by the sf_dir path AND a fingerprint of
    the embeddings parquet (names/sizes/mtimes), so a regenerated
    fixture can never be served by a stale index."""
    import hashlib  # noqa: PLC0415
    import os  # noqa: PLC0415

    h = hashlib.md5(str(sf_dir).encode())
    emb = os.path.join(str(sf_dir), "embeddings.parquet")
    if os.path.isdir(emb):
        walk = [
            os.path.join(r, f)
            for r, _, fs in os.walk(emb)
            for f in sorted(fs)
        ]
    elif os.path.exists(emb):
        walk = [emb]
    else:
        walk = []
    for p in sorted(walk):
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return os.path.join(root, ".ann_artifacts", "pq_" + h.hexdigest())


def pq_from_artifact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ top-k served from a PERSISTED index artifact — the
    build-once/search-many contract as a driver-checkable entry (VERDICT
    r05 ask #5): the first invocation per fixture trains + encodes +
    saves (atomic tmp-dir rename, so a crashed build never half-
    publishes), every later one reloads codes + codebooks from disk and
    pays only the search path. Save/load is bit-exact (roundtrip-tested
    in tests/test_operators.py), so the result is hash-identical to the
    self-training ``ann_pq_topk`` and shares its DuckDB oracle."""
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415

    path = _pq_artifact_path(sf_dir)
    if not os.path.isdir(path):
        tmp = f"{path}.tmp-{os.getpid()}"
        index = pq_build(spark, sf_dir, persist=False)
        pq_index_save(index, tmp)
        try:
            os.replace(tmp, path)  # atomic publish; loser of a race loses
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    index = pq_index_load(spark, path)
    return pq_search(spark, sf_dir, index)


def _pq_oracle_ctes() -> str:
    """Per-subspace unrolled Lloyd's chains mirroring _kmeans_cents over
    slice expressions: shared sample/seeds, then s{i}_cent{it} CTEs."""
    parts = [
        f"""samp AS (
  SELECT * FROM embeddings
  ORDER BY md5(cast(vec_id AS varchar)) LIMIT {KMEANS_SAMPLE_N}
),
seeds AS (
  SELECT vec_id, md5(cast(vec_id AS varchar)) AS h
  FROM samp ORDER BY h LIMIT {PQ_K}
)"""
    ]
    for s in range(PQ_M):
        lo = s * PQ_SUB + 1
        hi = (s + 1) * PQ_SUB
        sub = f"list_slice(e.embedding, {lo}, {hi})"
        parts.append(
            f"""s{s}_cent0 AS (
  SELECT row_number() OVER (ORDER BY sd.h) AS cid,
         list_transform({sub}, x -> round(cast(x AS double), 6)) AS centroid
  FROM seeds sd JOIN embeddings e USING (vec_id)
)"""
        )
        for it in range(1, KMEANS_ITERS + 1):
            parts.append(
                f"""s{s}_assign{it} AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity({sub}::DOUBLE[], c.centroid), 6) DESC,
                      c.cid) AS rn
    FROM samp e, s{s}_cent{it - 1} c)
  WHERE rn = 1
),
s{s}_cent{it} AS (
  SELECT cid, list(cv ORDER BY i) AS centroid FROM (
    SELECT a.cid, i, round(avg(e.embedding[{lo - 1} + i]::DOUBLE), 6) AS cv
    FROM s{s}_assign{it} a JOIN samp e USING (vec_id), range(1, {PQ_SUB + 1}) t(i)
    GROUP BY a.cid, i)
  GROUP BY cid
)"""
            )
    return ",\n".join(parts)


def _pq_oracle() -> str:
    """Mirrors pq_topk stage for stage. Codes are kept as cids (the
    Spark path stores array positions; position <-> cid is a bijection
    over the cid-sorted codebook, so both engines pick the same
    centroid). The ADC value is assembled exactly like the Spark LUT
    path — sum of per-subspace partial dots over sqrt of summed
    centroid squared norms — with round(.., 6) absorbing summation-
    order ulps; zero-norm sub-slices take the subspace's minimum cid,
    matching the Spark CASE guard."""
    subcent_union = "\n  UNION ALL\n".join(
        f"  SELECT {s} AS s, cid, centroid FROM s{s}_cent{KMEANS_ITERS}"
        for s in range(PQ_M)
    )
    return f"""
WITH {_pq_oracle_ctes()},
subcent AS (
{subcent_union}
),
cbn AS (
  SELECT s, cid, centroid,
         list_inner_product(centroid::DOUBLE[], centroid::DOUBLE[]) AS cn2
  FROM subcent
),
probes AS (
  SELECT vec_id AS probe_id, embedding,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS p_norm
  FROM embeddings WHERE vec_id < {N_PROBES}
),
slices AS (
  SELECT vec_id, s, sub, list_inner_product(sub, sub) AS sn2
  FROM (
    SELECT vec_id, s,
           list_slice(embedding, s * {PQ_SUB} + 1, (s + 1) * {PQ_SUB})::DOUBLE[] AS sub
    FROM embeddings, range(0, {PQ_M}) t(s))
),
enc_scored AS (
  SELECT l.vec_id, l.s, c.cid,
         round(list_cosine_similarity(l.sub, c.centroid), 6) AS score
  FROM slices l JOIN subcent c USING (s)
  WHERE l.sn2 > 0
),
codes AS (
  SELECT vec_id, s, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY score DESC, cid) AS rn
    FROM enc_scored)
  WHERE rn = 1
  UNION ALL
  SELECT l.vec_id, l.s, m.mincid AS cid
  FROM slices l JOIN (SELECT s, min(cid) AS mincid FROM subcent GROUP BY s) m USING (s)
  WHERE l.sn2 = 0
),
lut AS (
  SELECT p.probe_id, c.s, c.cid, c.cn2,
         list_inner_product(
           list_slice(p.embedding, c.s * {PQ_SUB} + 1, (c.s + 1) * {PQ_SUB})::DOUBLE[],
           c.centroid::DOUBLE[]) AS pd
  FROM probes p, cbn c
),
adc AS (
  SELECT l.probe_id, d.vec_id AS neighbor_id,
         round(sum(l.pd) / (p.p_norm * sqrt(sum(l.cn2))), 6) AS adc_cos
  FROM codes d
  JOIN lut l ON l.s = d.s AND l.cid = d.cid
  JOIN probes p ON p.probe_id = l.probe_id
  WHERE d.vec_id != l.probe_id
  GROUP BY l.probe_id, d.vec_id, p.p_norm
),
shortlist AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY adc_cos DESC, neighbor_id) AS srn
    FROM adc)
  WHERE srn <= {PQ_RERANK}
),
exact_scored AS (
  SELECT s.probe_id, s.neighbor_id,
         round(list_cosine_similarity(p.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cos
  FROM shortlist s
  JOIN embeddings p ON p.vec_id = s.probe_id
  JOIN embeddings e ON e.vec_id = s.neighbor_id
),
ranked AS (
  SELECT probe_id, neighbor_id,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank,
         cos
  FROM exact_scored
)
SELECT probe_id, neighbor_id, rank, cos AS cosine
FROM ranked WHERE rank <= {TOP_K}
ORDER BY probe_id, rank
"""


class IVFPQIndex(PQIndex):
    """Built IVF-PQ artifact: a :class:`PQIndex` (codebooks + the code
    table, here cell-tagged) plus the driver-resident coarse centroids.
    'Build once, search many' — ``ivfpq_build`` -> N x ``ivfpq_search``
    -> ``release()``."""

    def __init__(self, cents, codebooks, codes: DataFrame, persisted: bool):
        super().__init__(codebooks, codes, persisted)
        self.cents = cents
        self.cells_expr = _scored_cells_expr(_centroid_array_expr(cents))


def ivfpq_build(spark: SparkSession, sf_dir: str, persist: bool = True) -> IVFPQIndex:
    """Train the coarse quantizer + PQ codebooks ONCE and encode the
    corpus into the cell-tagged code table (vec_id, cell, pos0..7,
    rnorm) in ONE map-only pass — both the inverted-list assignment and
    the codes come from row-local argmaxes against broadcast codebook
    literals. With ``persist=True`` the code table is materialized so
    repeated searches never retrain or re-encode (the r04 per-query-
    training cost item, closed for the composite too)."""
    # ONE top-N sample scan feeds both trainers (coarse + 8 codebooks):
    # the draw (top-KMEANS_SAMPLE_N by md5(vec_id)) and every rounded
    # value are identical to the trainers' own draws, so results — and
    # the DuckDB oracle replay — are unchanged; only the duplicate
    # full-table TakeOrdered disappears.
    shared = (
        _with_norm(spark.table("embeddings"))
        .select("vec_id", "embedding", "norm")
        .withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h")
        .limit(KMEANS_SAMPLE_N)
        .select("embedding", "norm", "h")
        .persist()
    )
    try:
        # Fused trainer (see _fused_ivfpq_train): one seed collect and
        # one pass per Lloyd iteration train BOTH quantizers —
        # value-identical to sequential _kmeans_cents + pq_train, 3
        # driver round-trips instead of 7 (equality pinned in
        # tests/test_operators.py::test_fused_ivfpq_train_identical).
        cents, cbs = _fused_ivfpq_train(spark, shared)
    finally:
        shared.unpersist()
    cb_exprs = [_centroid_array_expr(cb) for cb in cbs]
    cells = _scored_cells_expr(_centroid_array_expr(cents))
    base = (
        _with_norm(spark.table("embeddings"))
        .select("vec_id", "embedding", "norm")
        .withColumn("cell", F.expr(f"array_max({cells}).cid"))
    )
    codes = _pq_encode(base, cb_exprs, extra=("cell",))
    index = IVFPQIndex(cents, cbs, codes, False)
    if persist:
        index.codes = codes.persist()
        index.codes.count()
        index._persisted = True
    return index


def ivfpq_index_save(index: IVFPQIndex, path: str) -> None:
    """Persist the composite artifact: cell-tagged codes as parquet,
    PQ codebooks + coarse centroids as JSON sidecars."""
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415

    index.codes.write.mode("overwrite").parquet(os.path.join(path, "codes"))
    with open(os.path.join(path, "codebooks.json"), "w") as f:
        json.dump([_cents_to_jsonable(cb) for cb in index.codebooks], f)
    with open(os.path.join(path, "cents.json"), "w") as f:
        json.dump(_cents_to_jsonable(index.cents), f)


def ivfpq_index_load(spark: SparkSession, path: str) -> IVFPQIndex:
    """Reload a persisted IVF-PQ artifact: searches resume with no
    training, assignment, or encoding."""
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415

    with open(os.path.join(path, "codebooks.json")) as f:
        cbs = [_cents_from_jsonable(cb) for cb in json.load(f)]
    with open(os.path.join(path, "cents.json")) as f:
        cents = _cents_from_jsonable(json.load(f))
    codes = spark.read.parquet(os.path.join(path, "codes"))
    return IVFPQIndex(cents, cbs, codes, False)


def ivfpq_search(
    spark: SparkSession,
    sf_dir: str,
    index: IVFPQIndex,
    nprobe: int = IVFPQ_NPROBE,
) -> DataFrame:
    """IVF-PQ search over a built artifact: probe-cell routing, ADC over
    stored codes in the probed cells only, exact re-rank. The ADC scan
    touches ~nprobe/nlist of the CODE table (both prunings compose: IVF
    bounds which rows are read, PQ bounds the bytes and arithmetic per
    row); the candidate restriction is an equi-join on the cell id
    against the broadcast (probe, cell) relation; LUT scoring, shortlist
    and re-rank are identical to :func:`pq_search` (one SQL statement —
    see :func:`_adc_rerank_sql`)."""
    index.codes.createOrReplaceTempView("__ivfpq_codes")
    try:
        return spark.sql(
            _adc_rerank_sql(
                "__ivfpq_codes", index.cb_exprs,
                cells_expr=index.cells_expr, nprobe=nprobe,
            )
        )
    finally:
        spark.catalog.dropTempView("__ivfpq_codes")


def ivfpq_topk(
    spark: SparkSession, sf_dir: str, nprobe: int = IVFPQ_NPROBE
) -> DataFrame:
    """IVF-PQ composite ANN — the billion-scale serving layout (FAISS
    IVFADC; Jegou et al., TPAMI 2011 §V): a coarse k-means quantizer
    routes the search to ``nprobe`` inverted lists, and only vectors in
    the probed cells are ADC-scored from their stored PQ codes, then the
    shortlist is exactly re-ranked. Self-contained for the driver
    contract (build inline, nothing persisted); repeat searchers use
    ``ivfpq_build``/``ivfpq_search`` and pay training + encoding once —
    bench.py reports build and search timings separately.

    This entry quantizes RAW vectors (its differential oracle replays
    raw-vector training); the residual-encoded variant (IVFADC's §V.A)
    is implemented below as ``ivfpq_residual_build``/``search``.
    Measured findings on the fixture geometry (sf0.01, recall@5 vs the
    exact baseline, at the former 50-deep shortlist): raw codes 0.64;
    residual codes with COSINE assignment 0.56 (worse — residual
    magnitude carries the signal and spherical assignment discards it);
    residual codes with L2 assignment 0.64 (parity, at k=10 and k=40
    alike). On these synthetic clustered embeddings the coarse
    quantizer explains little within-cell variance, so shortlist misses
    are shared by both code types and cell routing owns the recall
    ceiling (nprobe saturates at 0.68 by 7 of 10 cells). The residual
    machinery is therefore carried as the faiss-parity serving recipe
    with its exactness proven in tests (ADC == reconstruction cosine to
    1e-9), not as a recall win on this corpus. The levers that DO pay
    here: shortlist depth (at PQ_RERANK=100 every true neighbor the
    probed cells contain survives the ADC shortlist — recall equals the
    routing ceiling exactly) and then probe width (the ceiling itself:
    0.76 -> 0.84 at IVFPQ_NPROBE=9, see the constant's comment for the
    full measured curve and the honest caveat about this fixture's
    cluster geometry)."""
    return ivfpq_search(
        spark, sf_dir, ivfpq_build(spark, sf_dir, persist=False), nprobe
    )


# --- Residual IVF-PQ (IVFADC §V.A: quantize v - centroid(cell)) ------------


def _sq_fold(vec) -> float:
    """Left fold of squares (pre-sqrt), the same op sequence as the
    NORM SQL aggregate — deterministic, matches engine-side folds."""
    acc = 0.0
    for v in vec:
        acc += v * v
    return acc


def _dot_fold(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


class IVFPQResidualIndex(PQIndex):
    """Built residual-IVF-PQ artifact: coarse centroids + residual
    codebooks + the cell-tagged residual code table, plus the two
    DRIVER-RESIDENT cross tables ADC-on-residuals needs (constant size
    |cells| x PQ_M x PQ_K + |cells|, ~10 KB):

    - ``cross_exprs[s]``: map (cell * PQ_K + pos) -> dot(coarse-centroid
      subspace slice, residual codeword) — the 2*c.r-hat term of
      ||c + r-hat||^2.
    - ``cell_cn2_expr``: map cell -> ||c||^2.
    """

    def __init__(self, cents, codebooks, codes: DataFrame, persisted: bool):
        super().__init__(codebooks, codes, persisted)
        self.cents = cents
        self.cells_expr = _scored_cells_expr(_centroid_array_expr(cents))
        self.cross_exprs = []
        for s in range(PQ_M):
            entries = []
            for cid, cvec, _n in cents:
                csl = cvec[s * PQ_SUB : (s + 1) * PQ_SUB]
                for pos, (_rcid, rvec, _rn) in enumerate(codebooks[s]):
                    v = _dot_fold(csl, rvec)
                    entries.append(f"{cid * PQ_K + pos}, CAST({v!r} AS DOUBLE)")
            self.cross_exprs.append("map(" + ", ".join(entries) + ")")
        self.cell_cn2_expr = "map(" + ", ".join(
            f"{cid}, CAST({_sq_fold(cvec)!r} AS DOUBLE)" for cid, cvec, _n in cents
        ) + ")"
        self._res_handle = None

    def release(self) -> None:
        super().release()
        if self._res_handle is not None:
            self._res_handle.unpersist()
            self._res_handle = None


def ivfpq_residual_build(
    spark: SparkSession, sf_dir: str, persist: bool = True
) -> IVFPQResidualIndex:
    """Train the IVFADC residual layout: coarse quantizer as in
    ``ivfpq_build``, then PQ codebooks trained on RESIDUALS
    (v - centroid(cell)) and the corpus encoded as residual codes.
    Residuals concentrate near the origin with far less inter-cell
    variance than raw vectors, so the same 8 x 16-code budget spends
    its resolution on the part of the vector the coarse quantizer
    didn't already explain — the recall recovery measured in
    tests/test_operators.py and reported by bench.py."""
    cents = _kmeans_cents(spark)
    cb = _centroid_array_expr(cents)
    cells = _scored_cells_expr(cb)
    res = (
        _with_norm(spark.table("embeddings"))
        .select("vec_id", "embedding", "norm")
        .withColumn("cell", F.expr(f"array_max({cells}).cid"))
        .selectExpr(
            "vec_id",
            "cell",
            f"zip_with(embedding, filter({cb}, c -> c.cid = cell)[0].centroid, "
            "(x, y) -> cast(x AS double) - y) AS embedding",
        )
        .persist()
    )
    try:
        cbs = pq_train(spark, source=res, metric="l2")
        rcb_exprs = [_centroid_array_expr(c) for c in cbs]
        codes = _pq_encode(res, rcb_exprs, extra=("cell",), metric="l2")
        index = IVFPQResidualIndex(cents, cbs, codes, False)
        if persist:
            index.codes = codes.persist()
            index.codes.count()
            # codes materialized — the residual cache is no longer
            # load-bearing.
            res.unpersist()
        else:
            # self-contained path: the code lineage still reads the
            # residual relation at search time; the cache is released
            # by release() (or GC of the index).
            index._res_handle = res
        if persist:
            index._persisted = True
        return index
    except BaseException:
        res.unpersist()
        raise


def ivfpq_residual_search(
    spark: SparkSession,
    sf_dir: str,
    index: IVFPQResidualIndex,
    nprobe: int = N_PROBE_CELLS,
) -> DataFrame:
    """ADC search over residual codes: cell routing as in
    ``ivfpq_search``; the score reconstructs cos(p, c + r-hat) from
    codes alone —

      dot(p, c + r-hat)   = cell_dot + sum_s lut_s[pos_s]
      ||c + r-hat||^2     = ||c||^2 + 2 * sum_s cross_s[cell, pos_s]
                            + sum_s cn2_s[pos_s]

    where cell_dot rides the broadcast (probe, cell) relation, the LUTs
    are the standard per-probe partial dots against the RESIDUAL
    codebooks, and the cross/cn2 terms come from constant driver-
    resident maps — per (probe, doc) work stays O(PQ_M) lookups + adds;
    no 64-dim vector is ever touched until the exact re-rank.

    ONE SQL statement (``_adc_rerank_sql`` with ``residual=``): the
    former chained Dataset form re-analyzed the codes lineage with its
    embedded codebook/cross-map literals per op — the same measured
    per-op analysis cost the raw-code searches shed in r13. The score
    arithmetic is mirrored term for term; collected-row equality
    against the chained form is pinned in tests/test_operators.py."""
    index.codes.createOrReplaceTempView("__ivfpq_res_codes")
    try:
        return spark.sql(
            _adc_rerank_sql(
                "__ivfpq_res_codes", index.cb_exprs,
                nprobe=nprobe, residual=index,
            )
        )
    finally:
        spark.catalog.dropTempView("__ivfpq_res_codes")


def ivfpq_residual_index_save(index: IVFPQResidualIndex, path: str) -> None:
    """Persist the residual artifact — identical layout to the raw
    composite (codes parquet + codebooks/cents JSON); the cross/cn2
    tables are derived, not stored (rebuilt from cents + codebooks on
    load)."""
    ivfpq_index_save(index, path)


def ivfpq_residual_index_load(spark: SparkSession, path: str) -> IVFPQResidualIndex:
    """Reload a persisted residual artifact; searches resume with no
    training, assignment, residual pass, or encoding."""
    import json  # noqa: PLC0415
    import os  # noqa: PLC0415

    with open(os.path.join(path, "codebooks.json")) as f:
        cbs = [_cents_from_jsonable(cb) for cb in json.load(f)]
    with open(os.path.join(path, "cents.json")) as f:
        cents = _cents_from_jsonable(json.load(f))
    codes = spark.read.parquet(os.path.join(path, "codes"))
    return IVFPQResidualIndex(cents, cbs, codes, False)


def ivfpq_residual_topk(
    spark: SparkSession, sf_dir: str, nprobe: int = N_PROBE_CELLS
) -> DataFrame:
    """Self-contained residual IVF-PQ (build inline, nothing persisted
    beyond the build-scoped residual cache)."""
    index = ivfpq_residual_build(spark, sf_dir, persist=False)
    out = ivfpq_residual_search(spark, sf_dir, index, nprobe)
    return out


def _ivfpq_oracle(nprobe: int = IVFPQ_NPROBE) -> str:
    """Mirrors ivfpq_topk stage for stage: the PQ chain (shared samp +
    per-subspace codebooks) plus the coarse chain (seeds renamed to
    cseeds to avoid colliding with PQ's 16-row seed draw), composed so
    ADC scoring only sees (probe, vec) pairs whose vector lies in one of
    the probe's nprobe nearest cells."""
    coarse = _kmeans_oracle_ctes(include_samp=False, seeds="cseeds")
    return f"""
WITH {_pq_oracle_ctes()},
{coarse},
cell_scores AS (
  SELECT e.vec_id, c.cid,
         round(list_cosine_similarity(e.embedding::DOUBLE[], c.centroid), 6) AS score
  FROM embeddings e, cent{KMEANS_ITERS} c
),
ranked_cells AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
  FROM cell_scores
),
assigned AS (SELECT vec_id, cid AS cell FROM ranked_cells WHERE rn = 1),
probe_cells AS (
  SELECT vec_id AS probe_id, cid AS cell
  FROM ranked_cells WHERE vec_id < {N_PROBES} AND rn <= {nprobe}
),
cand AS (
  SELECT pc.probe_id, a.vec_id
  FROM assigned a JOIN probe_cells pc USING (cell)
  WHERE a.vec_id != pc.probe_id
),
subcent AS (
{chr(10).join(f"  SELECT {s} AS s, cid, centroid FROM s{s}_cent{KMEANS_ITERS}" + (" UNION ALL" if s < PQ_M - 1 else "") for s in range(PQ_M))}
),
cbn AS (
  SELECT s, cid, centroid,
         list_inner_product(centroid::DOUBLE[], centroid::DOUBLE[]) AS cn2
  FROM subcent
),
probes AS (
  SELECT vec_id AS probe_id, embedding,
         sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS p_norm
  FROM embeddings WHERE vec_id < {N_PROBES}
),
slices AS (
  SELECT vec_id, s, sub, list_inner_product(sub, sub) AS sn2
  FROM (
    SELECT vec_id, s,
           list_slice(embedding, s * {PQ_SUB} + 1, (s + 1) * {PQ_SUB})::DOUBLE[] AS sub
    FROM embeddings, range(0, {PQ_M}) t(s))
),
enc_scored AS (
  SELECT l.vec_id, l.s, c.cid,
         round(list_cosine_similarity(l.sub, c.centroid), 6) AS score
  FROM slices l JOIN subcent c USING (s)
  WHERE l.sn2 > 0
),
codes AS (
  SELECT vec_id, s, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, s ORDER BY score DESC, cid) AS rn
    FROM enc_scored)
  WHERE rn = 1
  UNION ALL
  SELECT l.vec_id, l.s, m.mincid AS cid
  FROM slices l JOIN (SELECT s, min(cid) AS mincid FROM subcent GROUP BY s) m USING (s)
  WHERE l.sn2 = 0
),
lut AS (
  SELECT p.probe_id, c.s, c.cid, c.cn2,
         list_inner_product(
           list_slice(p.embedding, c.s * {PQ_SUB} + 1, (c.s + 1) * {PQ_SUB})::DOUBLE[],
           c.centroid::DOUBLE[]) AS pd
  FROM probes p, cbn c
),
adc AS (
  SELECT ca.probe_id, d.vec_id AS neighbor_id,
         round(sum(l.pd) / (p.p_norm * sqrt(sum(l.cn2))), 6) AS adc_cos
  FROM cand ca
  JOIN codes d ON d.vec_id = ca.vec_id
  JOIN lut l ON l.probe_id = ca.probe_id AND l.s = d.s AND l.cid = d.cid
  JOIN probes p ON p.probe_id = ca.probe_id
  GROUP BY ca.probe_id, d.vec_id, p.p_norm
),
shortlist AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY adc_cos DESC, neighbor_id) AS srn
    FROM adc)
  WHERE srn <= {PQ_RERANK}
),
exact_scored AS (
  SELECT s.probe_id, s.neighbor_id,
         round(list_cosine_similarity(p.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cos
  FROM shortlist s
  JOIN embeddings p ON p.vec_id = s.probe_id
  JOIN embeddings e ON e.vec_id = s.neighbor_id
),
ranked AS (
  SELECT probe_id, neighbor_id,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank,
         cos
  FROM exact_scored
)
SELECT probe_id, neighbor_id, rank, cos AS cosine
FROM ranked WHERE rank <= {TOP_K}
ORDER BY probe_id, rank
"""


TRIPLET_HARD_LO = 20  # hard-negative band: ranks [LO, HI] of the exact list
TRIPLET_HARD_HI = 24


def training_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-retrieval training data: (anchor, positive, hard
    negative) triplets per probe — positive = the exact top-1 neighbor,
    negatives = the TRIPLET_HARD_LO..HI band of the same exact ranking
    (the "hard negatives" recipe: near the query but NOT nearest, the
    negatives that actually move a bi-encoder). ``margin`` is the
    positive-negative cosine gap the loss will be trained against.

    Scale shape: one broadcast-probe scored scan and ONE ranking window
    (positives and negatives are two filters over the same window
    output, self-joined on the tiny probe key). At 100 TB the exact
    scan becomes any ANN entry above — the triplet assembly is
    unchanged.
    """
    ranked = _exact_ranked(spark).where(
        (F.col("rank") == 1)
        | F.col("rank").between(TRIPLET_HARD_LO, TRIPLET_HARD_HI)
    )
    pos = ranked.where(F.col("rank") == 1).select(
        "probe_id",
        F.col("vec_id").alias("positive_id"),
        F.col("cos").alias("pos_cos"),
    )
    neg = ranked.where(F.col("rank") >= TRIPLET_HARD_LO).select(
        "probe_id",
        F.col("vec_id").alias("negative_id"),
        F.col("cos").alias("neg_cos"),
        F.col("rank").alias("neg_rank"),
    )
    return (
        pos.join(neg, "probe_id")
        .select(
            "probe_id",
            "positive_id",
            "negative_id",
            "neg_rank",
            "pos_cos",
            "neg_cos",
            F.round(F.col("pos_cos") - F.col("neg_cos"), 6).alias("margin"),
        )
        .orderBy("probe_id", "neg_rank")
    )


TRIPLETS_ORACLE = f"""
WITH scored AS (
  SELECT p.vec_id AS probe_id, e.vec_id AS vid,
         round(list_cosine_similarity(p.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cos
  FROM embeddings p JOIN embeddings e ON e.vec_id != p.vec_id
  WHERE p.vec_id < {N_PROBES}
),
ranked AS (
  SELECT probe_id, vid, cos,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vid) AS rank
  FROM scored
),
pos AS (
  SELECT probe_id, vid AS positive_id, cos AS pos_cos FROM ranked WHERE rank = 1
),
neg AS (
  SELECT probe_id, vid AS negative_id, cos AS neg_cos, rank AS neg_rank
  FROM ranked WHERE rank BETWEEN {TRIPLET_HARD_LO} AND {TRIPLET_HARD_HI}
)
SELECT p.probe_id, p.positive_id, n.negative_id, n.neg_rank,
       p.pos_cos, n.neg_cos,
       round(p.pos_cos - n.neg_cos, 6) AS margin
FROM pos p JOIN neg n USING (probe_id)
ORDER BY probe_id, neg_rank
"""


HASH_DIM = 64  # feature-hashing buckets (matches the embedding fixture dim)


def doc_embedding_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed document vectors (the hashing trick — Weinberger
    et al., ICML 2009): every token hashes to one of HASH_DIM buckets
    with a ±1 sign from an independent hash bit, signed term counts
    accumulate per bucket, and the vector is L2-normalized. Emitted
    SPARSE — (doc_id, bucket, weight) rows — the representation a
    100 TB corpus actually stores (dense 64-float rows for mostly-empty
    buckets waste ~10x the bytes at real vocabulary skew), and the
    bridge from the documents table into every dense-vector kernel
    above (model-free, vocabulary-free, fixed output width).

    Scale shape: one explode + one (doc, bucket) aggregation — the
    signed sum partial-aggregates map-side — then a per-doc window for
    the norm. The md5-based bucket/sign hashes are the engine's
    portable hash16, so the DuckDB oracle replays them bit-for-bit.
    """
    h = hash16("md5(w)")
    return spark.sql(
        f"""
        WITH toks AS (
          SELECT doc_id, {h} AS h
          FROM (SELECT doc_id, explode({TOKENS}) AS w FROM documents)
        ),
        hashed AS (
          SELECT doc_id, h % {HASH_DIM} AS bucket,
                 CASE WHEN (h div {HASH_DIM}) % 2 = 0 THEN 1 ELSE -1 END AS s
          FROM toks
        ),
        sparse AS (
          SELECT doc_id, bucket, sum(s) AS v
          FROM hashed GROUP BY doc_id, bucket
        ),
        normed AS (
          SELECT doc_id, bucket, v,
                 sqrt(sum(cast(v AS double) * v)
                      OVER (PARTITION BY doc_id)) AS nrm
          FROM sparse
        )
        SELECT doc_id, bucket,
               round(v / nrm, 6) AS weight
        FROM normed
        WHERE v != 0
        ORDER BY doc_id, bucket
        """
    )


def _doc_embedding_hashed_oracle() -> str:
    h = hash16("md5(w)")
    return f"""
WITH toks AS (
  SELECT doc_id, {h} AS h
  FROM (SELECT doc_id, unnest({DUCK_TOKENS}) AS w FROM documents)
),
hashed AS (
  SELECT doc_id, h % {HASH_DIM} AS bucket,
         CASE WHEN (h // {HASH_DIM}) % 2 = 0 THEN 1 ELSE -1 END AS s
  FROM toks
),
sparse AS (
  SELECT doc_id, bucket, sum(s) AS v
  FROM hashed GROUP BY doc_id, bucket
),
normed AS (
  SELECT doc_id, bucket, v,
         sqrt(sum(cast(v AS double) * v) OVER (PARTITION BY doc_id)) AS nrm
  FROM sparse
)
SELECT doc_id, cast(bucket AS BIGINT) AS bucket,
       round(v / nrm, 6) AS weight
FROM normed
WHERE v != 0
ORDER BY doc_id, bucket
"""


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components (grouped vector mean) — the
    aggregation shape clustering/IVF coarse quantizers need."""
    return (
        spark.table("embeddings")
        .select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid_v"))
        .where(F.col("pos") < 8)
        .orderBy("label", "pos")
    )


CENTROIDS_ORACLE = """
SELECT label, i - 1 AS pos, round(avg(embedding[i]::DOUBLE), 6) AS centroid_v
FROM embeddings, range(1, 9) t(i)
GROUP BY label, i
ORDER BY label, pos
"""


def quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column:
    ``q_i = round(127 * x_i / max|x|)``, the standard 4x compression
    before ANN serving.

    Output is (vec_id, scale, qsum, max_err): the dequantization scale,
    a checksum of the quantized vector, and the max absolute
    reconstruction error — so the oracle verifies the actual quantized
    values and the error bound, not just shapes. Pure row-local array
    expressions (whole-stage codegen, zero shuffles): at 100 TB this is
    a map-only rewrite of the embedding store.

    The scale is nullif-guarded: an all-zero embedding yields NULL
    scale/qsum/max_err in BOTH dialects instead of Spark-NULL vs
    DuckDB-inf divergence on divide-by-zero.
    """
    return spark.sql(
        """
        SELECT vec_id,
               round(scale, 6) AS scale,
               aggregate(qvec, cast(0 AS bigint), (acc, x) -> acc + x) AS qsum,
               round(array_max(zip_with(v, qvec,
                     (x, q) -> abs(x - q * scale / 127))), 6) AS max_err
        FROM (
          SELECT vec_id, v,
                 nullif(array_max(transform(v, x -> abs(x))), 0.0D) AS scale,
                 transform(v, x -> cast(round(127 * x /
                     nullif(array_max(transform(v, y -> abs(y))), 0.0D)) AS bigint)) AS qvec
          FROM (
            SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS v
            FROM embeddings
          )
        )
        ORDER BY vec_id
        """
    )


QUANTIZE_ORACLE = """
SELECT vec_id,
       round(scale, 6) AS scale,
       cast(list_sum(qvec) AS BIGINT) AS qsum,
       round(list_max(list_transform(range(1, len(v) + 1),
             i -> abs(v[i] - qvec[i] * scale / 127))), 6) AS max_err
FROM (
  SELECT vec_id, v,
         nullif(list_max(list_transform(v, x -> abs(x))), 0.0) AS scale,
         list_transform(v, x -> cast(round(127 * x /
             nullif(list_max(list_transform(v, y -> abs(y))), 0.0)) AS bigint)) AS qvec
  FROM (
    SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v
    FROM embeddings
  )
)
ORDER BY vec_id
"""


RANGE_COS = 0.30  # ES-style min_score threshold for range search


def range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine RANGE search: every corpus vector within ``RANGE_COS`` of
    each probe — the Elasticsearch ``min_score`` similarity query (the
    sink the reference feeds exists to answer exactly this), and the
    radius-query complement of the fixed-k entries.

    Same scale shape as :func:`_exact_ranked`: the probe set broadcasts,
    the corpus streams ONCE through a map-only scored scan, and the
    threshold filter replaces the ranking window entirely — no shuffle
    at all after the scan (cheaper than top-k, which needs the per-probe
    window). At 100 TB swap the exact scan for any bucketed candidate
    generator (LSH/IVF) and keep the same filter; recall then follows
    the candidate stage's measured recall.
    """
    emb = _with_norm(spark.table("embeddings"))
    probes = emb.where(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("p_emb"),
        F.col("norm").alias("p_norm"),
    )
    return (
        emb.crossJoin(F.broadcast(probes))
        .where(F.col("vec_id") != F.col("probe_id"))
        .withColumn(
            "cosine",
            F.round(
                F.expr(DOT.format(a="p_emb", b="embedding"))
                / (F.col("p_norm") * F.col("norm")),
                6,
            ),
        )
        .where(F.col("cosine") >= RANGE_COS)
        .select("probe_id", F.col("vec_id").alias("neighbor_id"), "cosine")
        .orderBy("probe_id", "neighbor_id")
    )


RANGE_SEARCH_ORACLE = f"""
SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
       round(list_cosine_similarity(p.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings p JOIN embeddings e ON e.vec_id != p.vec_id
WHERE p.vec_id < {N_PROBES}
  AND round(list_cosine_similarity(p.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) >= {RANGE_COS}
ORDER BY probe_id, neighbor_id
"""


def _label_centroid_cosines(spark: SparkSession) -> DataFrame:
    """(label, vec_id, cos): every member's cosine (rounded to 6 dp) to
    its label's mean embedding — the scored scan :func:`medoid_per_label`
    and :func:`outlier_scores` share.

    One posexplode aggregation builds the per-label mean (shuffle on
    (label, pos), partial-aggregated map-side), the centroid array is
    rebuilt row-locally from sorted (pos, value) structs, and members
    join their label's centroid — a #labels-row relation, broadcast-safe
    because labels are a bounded class vocabulary, not corpus-scale.
    """
    cent = (
        spark.table("embeddings")
        .select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("cv"))
        .groupBy("label")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, cv))), s -> s.cv)"
            ).alias("centroid")
        )
        .withColumn("cnorm", F.expr(NORM.format(a="centroid")))
    )
    return (
        _with_norm(spark.table("embeddings"))
        .join(F.broadcast(cent), "label")
        .withColumn(
            "cos",
            F.round(
                F.expr(DOT.format(a="embedding", b="centroid"))
                / (F.col("norm") * F.col("cnorm")),
                6,
            ),
        )
    )


def medoid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative selection: per label, the member vector most
    cosine-similar to the label's mean embedding (the medoid-style
    exemplar cluster-curation pipelines keep when collapsing a cluster
    to one document/vector).

    Scale shape: one posexplode aggregation builds the per-label mean
    (shuffle on (label, pos) — partial-aggregated map-side), the
    centroid array is rebuilt row-locally from the sorted (pos, value)
    structs, members join their label's centroid (a #labels-row
    relation — broadcast is safe because labels are a bounded class
    vocabulary, not corpus-scale), and the winner per label is ONE
    scored-struct max aggregation — no window shuffle. Scores are
    rounded to 6 dp before the argmax with a lowest-vec_id tiebreak
    (the shared round-before-rank pattern), so both engines pick the
    same medoid.
    """
    scored = _label_centroid_cosines(spark)
    return (
        scored.groupBy("label")
        .agg(
            F.expr("max(struct(cos AS cos, -vec_id AS neg, vec_id AS vec_id))").alias(
                "m"
            ),
            F.count("*").alias("n_members"),
        )
        .select(
            "label",
            F.col("m.vec_id").alias("medoid_id"),
            F.col("m.cos").alias("medoid_cos"),
            "n_members",
        )
        .orderBy("label")
    )


MEDOID_ORACLE = """
WITH cent AS (
  SELECT label, list(cv ORDER BY i) AS centroid FROM (
    SELECT label, i, round(avg(embedding[i]::DOUBLE), 6) AS cv
    FROM embeddings, range(1, 65) t(i)
    GROUP BY label, i)
  GROUP BY label
),
scored AS (
  SELECT e.label, e.vec_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[], c.centroid), 6) AS cos
  FROM embeddings e JOIN cent c USING (label)
),
ranked AS (
  SELECT label, vec_id, cos,
         row_number() OVER (PARTITION BY label ORDER BY cos DESC, vec_id) AS rn,
         count(*) OVER (PARTITION BY label) AS n_members
  FROM scored
)
SELECT label, vec_id AS medoid_id, cos AS medoid_cos, n_members
FROM ranked WHERE rn = 1
ORDER BY label
"""


PCA_ITERS = 3  # power-iteration rounds for the top principal direction


def pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding cloud by power
    iteration — the spectral building block (PCA whitening, ABTT
    "all-but-the-top" embedding post-processing, spectral init for
    clustering) the k-means trainer doesn't cover.

    Each round computes ``u = sum_rows x * (x . v)`` — the matvec
    ``(X^T X) v`` without ever materializing the 64x64 Gram matrix —
    as ONE map-only dot per row feeding one 64-group aggregation
    (partial-aggregated map-side, 64 rows collected); the driver
    normalizes and rounds to 6 dp, exactly the k-means centroid
    discipline, so float-summation-order differences between engines
    cannot leak into the next round's literal. PCA_ITERS is fixed (not
    convergence-tested): the oracle unrolls the same rounds as CTE
    stages, and a fixed-depth chain is replayable where a data-dependent
    loop is not. Output: 64 (pos, loading) rows plus the Rayleigh
    quotient (the explained variance of the direction, same value on
    every row) — both engines emit identical doubles.
    """
    emb = spark.table("embeddings").selectExpr(
        "transform(embedding, x -> cast(x AS double)) AS v"
    )
    vec = [1.0] + [0.0] * (N_DIM - 1)
    for _ in range(PCA_ITERS):
        lit = "array(" + ", ".join(f"{x!r}D" for x in vec) + ")"
        rows = (
            emb.selectExpr(
                f"aggregate(zip_with(v, {lit}, (a, b) -> a * b), 0D, (acc, x) -> acc + x) AS d",
                "v",
            )
            .select(F.col("d"), F.posexplode("v").alias("pos", "x"))
            .groupBy("pos")
            .agg(F.sum(F.col("d") * F.col("x")).alias("u"))
            .collect()
        )  # N_DIM rows — constant-size
        u = [0.0] * N_DIM
        for r in rows:
            u[int(r["pos"])] = float(r["u"])
        n = _l2(u)
        if n == 0.0:
            # Empty table, or the whole corpus is orthogonal to the
            # current direction: power iteration is degenerate. Fail
            # loudly instead of dividing by zero / returning garbage.
            raise ValueError(
                "pca_top_component: zero matvec result (empty embeddings "
                "table or corpus orthogonal to the iteration direction)"
            )
        # HALF-AWAY-FROM-ZERO to 6 dp, matching SQL round() in BOTH
        # engines — Python's round() is banker's (half-to-even) and
        # would diverge from the oracle on exact dyadic ties.
        vec = [math.copysign(math.floor(abs(x / n) * 1e6 + 0.5), x) / 1e6 for x in u]
    lit = "array(" + ", ".join(f"{x!r}D" for x in vec) + ")"
    lam = emb.selectExpr(
        f"aggregate(zip_with(v, {lit}, (a, b) -> a * b), 0D, (acc, x) -> acc + x) AS d"
    ).agg(F.round(F.sum(F.expr("d * d")), 4).alias("lam")).first()["lam"]
    return spark.createDataFrame(
        [(i, vec[i], float(lam)) for i in range(N_DIM)],
        "pos int, loading double, eigenvalue double",
    ).orderBy("pos")


def _pca_ctes() -> str:
    """Unrolled power-iteration CTE chain mirroring pca_top_component
    round for round (same init, same round-6 normalization); the final
    direction is ``l{PCA_ITERS}.v`` — shared by the PCA oracle and the
    remove-top-component oracle."""
    init = "[" + ", ".join(
        ("1.0" if i == 0 else "0.0") for i in range(N_DIM)
    ) + "]::DOUBLE[]"
    ctes = [
        "e AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)",
        f"l0 AS (SELECT {init} AS v)",
    ]
    for it in range(1, PCA_ITERS + 1):
        ctes.append(
            f"d{it} AS (SELECT list_inner_product(e.v, l{it - 1}.v) AS d, e.v AS v "
            f"FROM e, l{it - 1})"
        )
        ctes.append(
            f"u{it} AS (SELECT i, sum(d * v[i]) AS u "
            f"FROM d{it}, range(1, {N_DIM + 1}) t(i) GROUP BY i)"
        )
        ctes.append(
            f"n{it} AS (SELECT sqrt(sum(u * u)) AS n FROM u{it})"
        )
        ctes.append(
            f"l{it} AS (SELECT list(round(u / n, 6) ORDER BY i) AS v "
            f"FROM u{it}, n{it})"
        )
    return ", ".join(ctes)


def _pca_oracle() -> str:
    return f"""
WITH {_pca_ctes()},
lam AS (
  SELECT round(sum(d * d), 4) AS lam
  FROM (SELECT list_inner_product(e.v, l{PCA_ITERS}.v) AS d FROM e, l{PCA_ITERS})
)
SELECT i - 1 AS pos, l{PCA_ITERS}.v[i] AS loading, lam.lam AS eigenvalue
FROM l{PCA_ITERS}, lam, range(1, {N_DIM + 1}) t(i)
ORDER BY pos
"""


def remove_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-but-the-top embedding post-processing (Mu & Viswanath, ICLR
    2018): subtract each vector's projection onto the corpus' top
    principal direction — the cheap isotropy fix that measurably
    improves cosine-similarity quality on real embedding stores.

    Composition of :func:`pca_top_component`'s power iteration (the
    direction lands on the driver as 64 doubles) with a MAP-ONLY
    rewrite: ``x' = x - (x . v) v`` is one dot plus one fused
    scale-subtract per row against the constant-folded direction
    literal — zero shuffles over the corpus beyond the PCA rounds
    themselves. Output verifies the actual arithmetic, not just shapes:
    per-vector original/residual norms and the residual's re-projection
    onto v (~0 by construction, rounded to 6 — the orthogonality
    invariant both engines must agree on).
    """
    comp = {r["pos"]: r["loading"] for r in pca_top_component(spark, sf_dir).collect()}
    vec = [comp[i] for i in range(N_DIM)]
    lit = "array(" + ", ".join(f"{x!r}D" for x in vec) + ")"
    return spark.sql(
        f"""
        SELECT vec_id,
               round(sqrt(aggregate(transform(v, x -> x * x), 0D, (acc, x) -> acc + x)), 6)
                 AS orig_norm,
               round(sqrt(aggregate(transform(resid, x -> x * x), 0D, (acc, x) -> acc + x)), 6)
                 AS resid_norm,
               round(abs(aggregate(zip_with(resid, {lit}, (a, b) -> a * b), 0D, (acc, x) -> acc + x)), 6)
                 AS abs_resid_dot_v
        FROM (
          SELECT vec_id, v,
                 zip_with(v, {lit}, (x, c) -> x - d * c) AS resid
          FROM (
            SELECT vec_id,
                   transform(embedding, x -> cast(x AS double)) AS v,
                   aggregate(zip_with(transform(embedding, x -> cast(x AS double)), {lit},
                             (a, b) -> a * b), 0D, (acc, x) -> acc + x) AS d
            FROM embeddings
          )
        )
        ORDER BY vec_id
        """
    )


def _remove_top_oracle() -> str:
    return f"""
WITH {_pca_ctes()},
base AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v,
         list_inner_product(list_transform(embedding, x -> x::DOUBLE), l{PCA_ITERS}.v) AS d,
         l{PCA_ITERS}.v AS pv
  FROM embeddings, l{PCA_ITERS}
),
resid AS (
  SELECT vec_id, v,
         list_transform(range(1, {N_DIM + 1}), i -> v[i] - d * pv[i]) AS r,
         pv
  FROM base
)
SELECT vec_id,
       round(sqrt(list_inner_product(v, v)), 6) AS orig_norm,
       round(sqrt(list_inner_product(r, r)), 6) AS resid_norm,
       round(abs(list_inner_product(r, pv)), 6) AS abs_resid_dot_v
FROM resid
ORDER BY vec_id
"""


OUTLIER_Z = 2.0  # flag members more than 2 sigma BELOW their label's mean cosine


def outlier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier scoring (the SemDeDup-style prune signal,
    inverted): each vector's cosine to its label centroid, z-scored
    within the label — members far below their cluster's typical
    similarity are mislabeled/noisy candidates a curation pipeline drops
    (or routes for re-labeling) before training.

    Scale shape on top of the shared :func:`_label_centroid_cosines`
    scan: ONE additional #labels-sized aggregation for (mean, stddev)
    per label, broadcast back — the corpus streams twice total, shuffles
    only label-keyed partials. The z-score uses stddev_pop over the
    6-dp-rounded cosines and is itself rounded to 4 dp BEFORE the flag
    comparison (the shared rounded-flag pattern from
    events_anomaly_zscore), so the kept/flag set is cross-engine
    identical; a single-member label (sd = 0) yields NULL z and a false
    flag in both engines via nullif + coalesce.
    """
    scored = _label_centroid_cosines(spark).select("label", "vec_id", "cos")
    stats = scored.groupBy("label").agg(
        F.avg("cos").alias("mu"), F.stddev_pop("cos").alias("sd")
    )
    return (
        scored.join(F.broadcast(stats), "label")
        .selectExpr(
            "vec_id",
            "label",
            "cos AS centroid_cos",
            "round((cos - mu) / nullif(sd, 0.0D), 4) AS z",
        )
        .selectExpr(
            "vec_id",
            "label",
            "centroid_cos",
            "z",
            f"coalesce(z <= -{OUTLIER_Z}, false) AS is_outlier",
        )
        .orderBy("vec_id")
    )


OUTLIER_ORACLE = f"""
WITH cent AS (
  SELECT label, list(cv ORDER BY i) AS centroid FROM (
    SELECT label, i, round(avg(embedding[i]::DOUBLE), 6) AS cv
    FROM embeddings, range(1, 65) t(i)
    GROUP BY label, i)
  GROUP BY label
),
scored AS (
  SELECT e.label, e.vec_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[], c.centroid), 6) AS cos
  FROM embeddings e JOIN cent c USING (label)
),
stats AS (
  SELECT label, avg(cos) AS mu, stddev_pop(cos) AS sd FROM scored GROUP BY label
)
SELECT vec_id, label, cos AS centroid_cos,
       round((cos - mu) / nullif(sd, 0.0), 4) AS z,
       coalesce(round((cos - mu) / nullif(sd, 0.0), 4) <= -{OUTLIER_Z}, false)
         AS is_outlier
FROM scored JOIN stats USING (label)
ORDER BY vec_id
"""


def _recall_eval(ex, approx, approx_col: str):
    """Shared recall@k rollup: exact top-k (probe_id, neighbor_id) LEFT
    JOIN the approximate kernel's picks, counted per probe — the one
    place the eval shape lives (the approximate kernel is the only
    varying input)."""
    ap = approx.select("probe_id", F.col("neighbor_id").alias(approx_col))
    return (
        ex.join(
            ap,
            (ex.probe_id == ap.probe_id) & (ex.neighbor_id == ap[approx_col]),
            "left",
        )
        .groupBy(ex.probe_id.alias("probe_id"))
        .agg(F.count(F.col(approx_col)).alias("n_hits"))
        .selectExpr(
            "probe_id",
            "n_hits",
            f"round(n_hits * cast(1 AS double) / {TOP_K}, 4) AS recall_at_k",
        )
        .orderBy("probe_id")
    )


def _recall_oracle(approx_sql: str) -> str:
    """DuckDB side of the same eval shape over any approximate kernel's
    oracle text."""
    return f"""
WITH ex AS ({BRUTE_FORCE_ORACLE}),
ap AS ({approx_sql})
SELECT ex.probe_id,
       cast(count(ap.neighbor_id) AS bigint) AS n_hits,
       round(count(ap.neighbor_id) * cast(1 AS double) / {TOP_K}, 4) AS recall_at_k
FROM ex LEFT JOIN ap
  ON ap.probe_id = ex.probe_id AND ap.neighbor_id = ex.neighbor_id
GROUP BY ex.probe_id
ORDER BY ex.probe_id
"""


def lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the LSH-bucketed ANN against the exact baseline,
    measured IN-PLAN per probe — the eval loop every ANN deployment
    runs, here with both sides oracle-checkable (the kernels' own
    oracles compose into the eval's oracle, so the measurement can
    never drift from the deployed kernels).

    Scale: both inputs are the existing top-k relations (probes x k
    rows); the eval join and rollup are probe-scale.
    """
    return _recall_eval(
        brute_force_topk(spark, sf_dir).select("probe_id", "neighbor_id"),
        lsh_bucket_topk(spark, sf_dir),
        "lsh_neighbor",
    )


def _lsh_recall_oracle() -> str:
    return _recall_oracle(_lsh_oracle())


def ivf_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF ANN against the exact baseline, per probe,
    in-plan — the same eval shape as :func:`lsh_recall_eval` but over
    the learned coarse quantizer (the oracle replays the identical
    deterministic k-means, so even the trained index's recall is
    differential-tested, not just reported by the bench)."""
    return _recall_eval(
        brute_force_topk(spark, sf_dir).select("probe_id", "neighbor_id"),
        ivf_topk(spark, sf_dir),
        "ivf_neighbor",
    )


def _ivf_recall_oracle() -> str:
    return _recall_oracle(IVF_ORACLE)


def knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label prediction + evaluation: each probe's label is
    predicted by majority vote of its top-{TOP_K} exact-cosine
    neighbors, reported against the probe's true label — the retrieval
    quality-eval every embedding pipeline runs before trusting its
    vectors. Tiebreak is fully deterministic: (votes DESC, best
    neighbor rank ASC, label ASC).

    Scale shape: reuses the shared exact-ranked scan (broadcast probes,
    corpus streams once); the vote aggregation is |probes x labels|
    sized. At 100 TB the exact scan swaps for any ANN entry — the vote
    and eval stages are unchanged (they run on top-k rows only).
    """
    ranked = _exact_ranked(spark).where(F.col("rank") <= TOP_K)
    labels = spark.table("embeddings").select("vec_id", "label")
    votes = (
        ranked.join(labels, "vec_id")
        .groupBy("probe_id", "label")
        .agg(F.count("*").alias("n_votes"), F.min("rank").alias("best_rank"))
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("n_votes").desc(), F.col("best_rank"), F.col("label")
    )
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("probe_id", F.col("label").alias("pred_label"), "n_votes")
    )
    truth = spark.table("embeddings").selectExpr(
        "vec_id AS probe_id", "label AS true_label"
    )
    return (
        pred.join(truth, "probe_id")
        .selectExpr(
            "probe_id",
            "true_label",
            "pred_label",
            "n_votes",
            "pred_label = true_label AS correct",
        )
        .orderBy("probe_id")
    )


KNN_EVAL_ORACLE = f"""
WITH scored AS (
  SELECT p.vec_id AS probe_id, e.vec_id AS vec_id,
         round(list_cosine_similarity(p.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cos
  FROM embeddings p JOIN embeddings e ON e.vec_id != p.vec_id
  WHERE p.vec_id < {N_PROBES}
),
ranked AS (
  SELECT probe_id, vec_id,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rank
  FROM scored
),
votes AS (
  SELECT r.probe_id, e.label,
         count(*) AS n_votes, min(r.rank) AS best_rank
  FROM ranked r JOIN embeddings e ON e.vec_id = r.vec_id
  WHERE r.rank <= {TOP_K}
  GROUP BY r.probe_id, e.label
),
pred AS (
  SELECT probe_id, label AS pred_label, cast(n_votes AS bigint) AS n_votes,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY n_votes DESC, best_rank, label) AS rn
  FROM votes
)
SELECT p.probe_id, t.label AS true_label, p.pred_label, p.n_votes,
       p.pred_label = t.label AS correct
FROM pred p JOIN embeddings t ON t.vec_id = p.probe_id
WHERE p.rn = 1
ORDER BY p.probe_id
"""


# --- Matryoshka (truncated-prefix) retrieval eval --------------------------

#: prefix widths for the truncated-embedding recall curve (MRL-style:
#: nested representations where the first dims carry the coarse
#: signal). The eval measures how much signal the prefixes actually
#: carry — on embeddings NOT trained with nested representations (like
#: the synthetic fixture) recall is near chance, which is precisely the
#: deployment mistake this eval exists to catch before switching
#: serving to prefix scans.
MRL_DIMS = (16, 32, 48)


def matryoshka_topk(spark: SparkSession, sf_dir: str, dim: int) -> DataFrame:
    """Approximate top-k over the first ``dim`` dims only — the
    Matryoshka/truncated-prefix serving trade: a prefix scan reads
    dim/64 of the vector bytes (at 100 TB of embeddings, 16/64 is the
    difference between scanning 25 TB and 100 TB), at a recall cost
    this kernel makes measurable. Same probe set, same
    round-before-rank discipline as the exact baseline."""
    emb = spark.table("embeddings").select(
        "vec_id", F.expr(f"slice(embedding, 1, {dim})").alias("emb_t")
    )
    emb = emb.withColumn("norm_t", F.expr(NORM.format(a="emb_t")))
    probes = emb.where(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("emb_t").alias("p_emb"),
        F.col("norm_t").alias("p_norm"),
    )
    pairs = emb.crossJoin(F.broadcast(probes)).where(
        F.col("vec_id") != F.col("probe_id")
    )
    scored = pairs.withColumn(
        "cos",
        F.round(
            F.expr(DOT.format(a="p_emb", b="emb_t"))
            / (F.col("p_norm") * F.col("norm_t")),
            6,
        ),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.select("probe_id", "vec_id", "cos")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("probe_id", F.col("vec_id").alias("neighbor_id"), "rank")
        .orderBy("probe_id", "rank")
    )


def _mrl_topk_oracle(dim: int) -> str:
    return f"""
WITH scored AS (
  SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(p.embedding[1:{dim}]::DOUBLE[],
                                      e.embedding[1:{dim}]::DOUBLE[]), 6) AS cos
  FROM embeddings p JOIN embeddings e ON e.vec_id != p.vec_id
  WHERE p.vec_id < {N_PROBES}
),
ranked AS (
  SELECT probe_id, neighbor_id,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT probe_id, neighbor_id, rank FROM ranked WHERE rank <= {TOP_K}
"""


def matryoshka_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k CURVE of prefix-truncated search vs the full-dimension
    exact baseline: one row per (prefix width, probe) through the same
    differential-tested eval shape as the LSH/IVF recall entries —
    quantifying what each cheaper prefix scan gives up. Scale: the
    exact full-dimension baseline is materialized ONCE (eager
    localCheckpoint of the probe x k relation — otherwise the unioned
    plan re-executes the full scored scan per prefix width); every eval
    join is probe x k sized."""
    ex = (
        brute_force_topk(spark, sf_dir)
        .select("probe_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    out = None
    for dim in MRL_DIMS:
        ev = _recall_eval(ex, matryoshka_topk(spark, sf_dir, dim), "mrl_neighbor")
        ev = ev.select(
            F.lit(dim).cast("int").alias("prefix_dim"), "probe_id", "n_hits",
            "recall_at_k",
        )
        out = ev if out is None else out.unionByName(ev)
    return out.orderBy("prefix_dim", "probe_id")


def _matryoshka_recall_oracle() -> str:
    blocks = []
    for dim in MRL_DIMS:
        blocks.append(
            f"""
SELECT CAST({dim} AS INTEGER) AS prefix_dim, ex.probe_id,
       cast(count(ap.neighbor_id) AS bigint) AS n_hits,
       round(count(ap.neighbor_id) * cast(1 AS double) / {TOP_K}, 4) AS recall_at_k
FROM ({BRUTE_FORCE_ORACLE.replace("ORDER BY probe_id, rank", "")}) ex
LEFT JOIN ({_mrl_topk_oracle(dim)}) ap
  ON ap.probe_id = ex.probe_id AND ap.neighbor_id = ex.neighbor_id
GROUP BY ex.probe_id"""
        )
    return "\nUNION ALL\n".join(blocks) + "\nORDER BY prefix_dim, probe_id"


# --- clustering quality: learned cells vs ground-truth labels ---------------


def cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purity of the learned coarse quantizer against the fixture's
    ground-truth labels: assign EVERY embedding to its k-means cell
    (the same row-local argmax the IVF path uses), build the
    cell x label contingency, and report each cell's majority label
    and purity — the eval that says whether the quantizer's cells mean
    anything semantically (high purity => cell routing approximates
    label routing, which is why IVF recall saturates at the routing
    ceiling on this corpus).

    Scale: assignment is map-only against the driver-resident centroid
    literal; the contingency is one (cell, label) aggregation; the
    majority pick is an argmax over #cells x #labels rows."""
    cents = _kmeans_cents(spark)
    cells = _scored_cells_expr(_centroid_array_expr(cents))
    assigned = (
        _with_norm(spark.table("embeddings"))
        .withColumn("cell", F.expr(f"array_max({cells}).cid"))
        .select("vec_id", "cell", "label")
    )
    cont = assigned.groupBy("cell", "label").agg(F.count("*").alias("n"))
    w = Window.partitionBy("cell").orderBy(F.col("n").desc(), F.col("label"))
    top = (
        cont.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("cell", F.col("label").alias("top_label"), F.col("n").alias("n_top"))
    )
    tot = cont.groupBy("cell").agg(F.sum("n").alias("n_vecs"))
    return (
        tot.join(top, "cell")
        .selectExpr(
            "cell",
            "cast(n_vecs AS bigint) AS n_vecs",
            "top_label",
            "cast(n_top AS bigint) AS n_top",
            "round(n_top * cast(1 AS double) / n_vecs, 4) AS purity",
        )
        .orderBy("cell")
    )


CLUSTER_PURITY_ORACLE = f"""
WITH {_kmeans_oracle_ctes()},
cell_scores AS (
  SELECT e.vec_id, e.label, c.cid,
         round(list_cosine_similarity(e.embedding::DOUBLE[], c.centroid), 6) AS score
  FROM embeddings e, cent{KMEANS_ITERS} c
),
assigned AS (
  SELECT vec_id, label, cid AS cell FROM (
    SELECT vec_id, label, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
    FROM cell_scores)
  WHERE rn = 1
),
cont AS (
  SELECT cell, label, count(*) AS n FROM assigned GROUP BY cell, label
),
top AS (
  SELECT cell, label AS top_label, n AS n_top FROM (
    SELECT cell, label, n,
           row_number() OVER (PARTITION BY cell ORDER BY n DESC, label) AS rn
    FROM cont)
  WHERE rn = 1
),
tot AS (
  SELECT cell, cast(sum(n) AS BIGINT) AS n_vecs FROM cont GROUP BY cell
)
SELECT t.cell, t.n_vecs, p.top_label,
       cast(p.n_top AS BIGINT) AS n_top,
       round(p.n_top * cast(1 AS double) / t.n_vecs, 4) AS purity
FROM tot t JOIN top p USING (cell)
ORDER BY cell
"""


def registry() -> dict[str, dict]:
    return {
        "embedding_knn_eval": {"fn": knn_label_eval, "oracle": KNN_EVAL_ORACLE},
        "embedding_cluster_purity": {
            "fn": cluster_purity,
            "oracle": CLUSTER_PURITY_ORACLE,
        },
        "embedding_matryoshka_recall": {
            "fn": matryoshka_recall_eval,
            "oracle": _matryoshka_recall_oracle(),
        },
        "ann_lsh_recall_eval": {"fn": lsh_recall_eval, "oracle": _lsh_recall_oracle()},
        "ann_ivf_recall_eval": {"fn": ivf_recall_eval, "oracle": _ivf_recall_oracle()},
        "embedding_quantize_int8": {"fn": quantize_int8, "oracle": QUANTIZE_ORACLE},
        "ann_range_search": {"fn": range_search, "oracle": RANGE_SEARCH_ORACLE},
        "embedding_medoid_per_label": {"fn": medoid_per_label, "oracle": MEDOID_ORACLE},
        "embedding_outlier_scores": {"fn": outlier_scores, "oracle": OUTLIER_ORACLE},
        "embedding_pca_top_component": {"fn": pca_top_component, "oracle": _pca_oracle()},
        "embedding_remove_top_component": {
            "fn": remove_top_component,
            "oracle": _remove_top_oracle(),
        },
        "ann_brute_force_topk": {"fn": brute_force_topk, "oracle": BRUTE_FORCE_ORACLE},
        "ann_lsh_bucket_topk": {"fn": lsh_bucket_topk, "oracle": _lsh_oracle()},
        "ann_ivf_topk": {"fn": ivf_topk, "oracle": IVF_ORACLE},
        "ann_pq_topk": {"fn": pq_topk, "oracle": _pq_oracle()},
        "ann_pq_from_artifact": {"fn": pq_from_artifact, "oracle": _pq_oracle()},
        "ann_ivfpq_topk": {"fn": ivfpq_topk, "oracle": _ivfpq_oracle()},
        "retrieval_training_triplets": {
            "fn": training_triplets,
            "oracle": TRIPLETS_ORACLE,
        },
        "doc_embedding_hashed": {
            "fn": doc_embedding_hashed,
            "oracle": _doc_embedding_hashed_oracle(),
        },
        "embedding_neardup_pairs": {"fn": neardup_pairs, "oracle": NEARDUP_ORACLE},
        "embedding_label_centroids": {"fn": label_centroids, "oracle": CENTROIDS_ORACLE},
    }
