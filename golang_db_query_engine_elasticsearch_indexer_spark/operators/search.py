"""Native full-text relevance scoring (BM25) over the documents table.

The reference's entire purpose is to ship query results INTO
Elasticsearch so ES can answer relevance queries
(`api/controllers/elastic_controller.go:184-250` bulk-indexes the rows;
search itself is delegated to ES). This operator internalizes the
search side the same way the engine internalizes the RDBMS side: BM25
— the default ES/Lucene similarity — computed as a Catalyst plan, so
"index + search" round-trips entirely inside Spark.

Scale shape: the token array is ``filter()``-ed to query terms *before*
the explode, so non-query tokens never materialize a row; then two
small aggregations (per-(doc,term) tf, per-term df) and broadcast joins
of the tiny per-term/corpus-stats relations back onto the tf stream.
The corpus is scanned once; nothing about the plan changes at 100 TB
except partition counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from golang_db_query_engine_elasticsearch_indexer_spark.functions import (
    DUCK_TOKENS,
    TOKENS,
)

K1 = 1.2
B = 0.75
QUERY_TERMS = ["table", "scan", "fast"]


def _terms_sql(quote: str = "'") -> str:
    return ", ".join(f"{quote}{t}{quote}" for t in QUERY_TERMS)


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score) for documents matching any query term, BM25-ranked.

    Okapi BM25 with the Lucene-style non-negative idf
    ``ln(1 + (N - df + 0.5) / (df + 0.5))``. Scores are rounded to 4
    decimals so cross-engine libm drift in ``ln`` can't flip the
    comparison; ordering is made total with the doc_id tiebreak.
    """
    return spark.sql(
        f"""
        WITH toks AS (
          SELECT doc_id, {TOKENS} AS toks FROM documents
        ),
        stats AS (
          SELECT count(*) AS n_docs, avg(size(toks)) AS avgdl FROM toks
        ),
        tf AS (
          SELECT doc_id, w, count(*) AS tf, max(dl) AS dl
          FROM (
            SELECT doc_id, size(toks) AS dl,
                   explode(filter(toks, x -> x IN ({_terms_sql()}))) AS w
            FROM toks
          )
          GROUP BY doc_id, w
        ),
        df AS (
          SELECT w, count(*) AS df FROM tf GROUP BY w
        )
        SELECT doc_id,
               round(sum(
                 ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                 * tf * ({K1} + 1)
                 / (tf + {K1} * (1 - {B} + {B} * dl / avgdl))
               ), 4) AS bm25
        FROM tf JOIN df USING (w) CROSS JOIN stats
        GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id
        """
    )


BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents
),
stats AS (
  SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM toks
),
tf AS (
  SELECT doc_id, w, count(*) AS tf, max(dl) AS dl
  FROM (
    SELECT doc_id, unnest(toks) AS w, len(toks) AS dl FROM toks
  )
  WHERE w IN ({_terms_sql()})
  GROUP BY doc_id, w
),
df AS (
  SELECT w, count(*) AS df FROM tf GROUP BY w
)
SELECT doc_id,
       round(sum(
         ln(1 + (n_docs - df + 0.5) / (df + 0.5))
         * tf * ({K1} + 1)
         / (tf + {K1} * (1 - {B} + {B} * dl / avgdl))
       ), 4) AS bm25
FROM tf JOIN df USING (w) CROSS JOIN stats
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
"""


def registry() -> dict[str, dict]:
    return {
        "search_bm25": {"fn": bm25_topk, "oracle": BM25_ORACLE},
    }
