"""Similarity search over the ``embeddings`` table (array<float> x 64).

North-star extensions (BASELINE.json; SURVEY.md §2.C):

- **brute-force cosine top-k** — the exact baseline: broadcast the
  (small) probe set against all vectors; one pass, no shuffle of the
  big side beyond the final per-probe top-k.
- **LSH-bucketed top-k** — the scale path: sign-bit bucketing (random
  hyperplanes degenerate to coordinate hyperplanes for isotropic
  embeddings) so candidate generation is an equi-join on a bucket key
  instead of a cross join.
- **all-pairs near-dup** — cosine >= threshold over candidate pairs.

All dot products run in double precision via ``zip_with``/``aggregate``
(JVM codegen, no Python). DuckDB oracles use ``list_cosine_similarity``
on DOUBLE[] — same arithmetic, differences absorbed by round(.., 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TOP_K = 5
N_PROBES = 5  # probe set: vec_id < N_PROBES
N_SIGN_BITS = 8
NEARDUP_COS = 0.35

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x AS double) * cast(y AS double)), "
    "cast(0 AS double), (acc, v) -> acc + v)"
)
NORM = "sqrt(aggregate(transform({a}, x -> cast(x AS double) * cast(x AS double)), cast(0 AS double), (acc, v) -> acc + v))"


def _with_norm(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn("norm", F.expr(NORM.format(a=col)))


def brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: probes (vec_id < N_PROBES) vs all vectors.

    The probe side is tiny and broadcast; Catalyst turns the pair
    generation into BroadcastNestedLoopJoin — the data side streams
    once, which is the right physical shape for exact search at scale.
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
        F.expr(DOT.format(a="p_emb", b="embedding")) / (F.col("p_norm") * F.col("norm")),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("cos", 6).alias("cosine"),
        )
        .orderBy("probe_id", "rank")
    )


BRUTE_FORCE_ORACLE = f"""
WITH scored AS (
  SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(p.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cos
  FROM embeddings p JOIN embeddings e ON e.vec_id != p.vec_id
  WHERE p.vec_id < {N_PROBES}
),
ranked AS (
  SELECT probe_id, neighbor_id,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank,
         cos
  FROM scored
)
SELECT probe_id, neighbor_id, rank, round(cos, 6) AS cosine
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
    scored = pairs.withColumn(
        "cos",
        F.expr(DOT.format(a="p_emb", b="embedding")) / (F.col("p_norm") * F.col("norm")),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round("cos", 6).alias("cosine"),
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
         list_cosine_similarity(p.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS cos
  FROM b p JOIN b e ON e.bucket = p.bucket AND e.vec_id != p.vec_id
  WHERE p.vec_id < {N_PROBES}
),
ranked AS (
  SELECT probe_id, neighbor_id,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank,
         cos
  FROM scored
)
SELECT probe_id, neighbor_id, rank, round(cos, 6) AS cosine
FROM ranked WHERE rank <= {TOP_K}
ORDER BY probe_id, rank
"""


def neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= NEARDUP_COS, doc_a < doc_b.

    Exact all-pairs form (the verification step LSH candidates would
    feed at scale; at 100 TB the candidate set comes from bucketing —
    see lsh_bucket_topk — never from this cross join).
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


NEARDUP_ORACLE = f"""
SELECT a.vec_id AS va, b.vec_id AS vb,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {NEARDUP_COS}
ORDER BY va, vb
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


def registry() -> dict[str, dict]:
    return {
        "ann_brute_force_topk": {"fn": brute_force_topk, "oracle": BRUTE_FORCE_ORACLE},
        "ann_lsh_bucket_topk": {"fn": lsh_bucket_topk, "oracle": _lsh_oracle()},
        "embedding_neardup_pairs": {"fn": neardup_pairs, "oracle": NEARDUP_ORACLE},
        "embedding_label_centroids": {"fn": label_centroids, "oracle": CENTROIDS_ORACLE},
    }
