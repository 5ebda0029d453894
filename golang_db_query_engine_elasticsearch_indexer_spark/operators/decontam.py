"""Benchmark decontamination: flag training documents that overlap an
evaluation set by shared word n-grams.

The standard pretraining-hygiene operator (the reference has no
analogue — its surface ends at SQL pass-through,
`api/controllers/query_controller.go:98`): before training, any document
sharing enough contiguous n-grams with a held-out benchmark must be
dropped, else eval scores are contaminated. Here the fixture's
``source = 'src0'`` partition stands in for the benchmark corpus and
every other source is the training pool.

Scale design: the benchmark side is *small by construction* (eval sets
are thousands of docs, the training pool is billions), so its distinct
gram set is broadcast — the contamination check is then a map-side
semi-join against the 100 TB side with no shuffle of the big table;
the only shuffle is the final per-doc count aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from golang_db_query_engine_elasticsearch_indexer_spark.functions import (
    DUCK_TOKENS,
    TOKENS,
    duck_ngrams,
    spark_ngrams,
)

DECONTAM_N = 4  # contiguous-word overlap length (real corpora use 8-13;
# the fixture's 40-word synthetic docs need a shorter window for a
# non-degenerate flagged set — 3 flags ~everything, 5 almost nothing)
BENCH_SOURCE = "src0"


def _grams(spark: SparkSession) -> DataFrame:
    docs = spark.table("documents")
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    return (
        docs.selectExpr("doc_id", "source", f"{TOKENS} AS toks")
        .where(f"size(toks) >= {DECONTAM_N}")
        .selectExpr("doc_id", "source", f"explode({spark_ngrams(DECONTAM_N)}) AS g")
    )


def contaminated_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_shared_grams, n_grams, overlap_frac) for every training
    document sharing >= 1 word-n-gram with the benchmark source."""
    g = _grams(spark)
    bench = (
        g.where(F.col("source") == BENCH_SOURCE)
        .select("g")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = g.where(F.col("source") != BENCH_SOURCE)
    # One pass over the (huge) training gram stream: the broadcast left
    # join marks benchmark grams, and a single aggregation yields both
    # the total and the shared count — no second scan, one shuffle.
    return (
        train.join(F.broadcast(bench), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("hit").alias("n_shared_grams"),
            F.count("*").alias("n_grams"),
        )
        .where("n_shared_grams > 0")
        .selectExpr(
            "doc_id",
            "n_shared_grams",
            "n_grams",
            "round(n_shared_grams / n_grams, 4) AS overlap_frac",
        )
        .orderBy(F.col("n_shared_grams").desc(), "doc_id")
    )


CONTAMINATED_ORACLE = f"""
WITH g AS (
  SELECT doc_id, source, unnest({duck_ngrams(DECONTAM_N, DUCK_TOKENS)}) AS g
  FROM documents
  WHERE len({DUCK_TOKENS}) >= {DECONTAM_N}
),
bench AS (SELECT DISTINCT g FROM g WHERE source = '{BENCH_SOURCE}'),
train AS (SELECT doc_id, g FROM g WHERE source <> '{BENCH_SOURCE}'),
per_doc AS (SELECT doc_id, count(*) AS n_grams FROM train GROUP BY doc_id),
shared AS (
  SELECT doc_id, count(*) AS n_shared_grams
  FROM train JOIN bench USING (g)
  GROUP BY doc_id
)
SELECT s.doc_id, s.n_shared_grams, p.n_grams,
       round(s.n_shared_grams / p.n_grams, 4) AS overlap_frac
FROM shared s JOIN per_doc p ON s.doc_id = p.doc_id
ORDER BY s.n_shared_grams DESC, s.doc_id
"""


def registry() -> dict[str, dict]:
    return {
        "decontam_benchmark_overlap": {
            "fn": contaminated_docs,
            "oracle": CONTAMINATED_ORACLE,
        },
    }
