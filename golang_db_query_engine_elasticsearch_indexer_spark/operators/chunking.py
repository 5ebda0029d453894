"""Context-window chunking and duplicate-span detection over documents.

Training-data preparation operators beyond the reference's own surface
(SURVEY.md §2.C north-star families; the reference ships rows to ES —
`api/controllers/elastic_controller.go:184-250` — and leaves corpus
preparation to the consumer; this engine internalizes it):

- :func:`chunk_windows` — split each document into overlapping
  fixed-size token windows (the standard "context window packing"
  pre-step for LLM training and for chunked retrieval indexes).
- :func:`span_dup_coverage` — per-document duplicate-span statistics:
  which 8-token spans also occur in another document, and what fraction
  of the document's tokens is covered by such shared spans. The
  distributed counterpart of suffix-array substring dedup (Lee et al.,
  "Deduplicating Training Data Makes Language Models Better"): instead
  of a global suffix array, fixed-width shingle postings are hashed and
  counted — one shuffle on the gram hash, linear in corpus size.

Both are pure Catalyst expressions (whole-stage codegen, no Python),
with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from golang_db_query_engine_elasticsearch_indexer_spark.functions import (
    DUCK_TOKENS,
    TOKENS,
)

CHUNK = 20   # tokens per window
STRIDE = 15  # window start step (CHUNK - STRIDE = 5 tokens of overlap)
SPAN = 8     # duplicate-span width in tokens


def chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_id, start_pos, n_chunk_tokens, chunk_hash) —
    overlapping CHUNK-token windows every STRIDE tokens.

    Windows start at token positions 1, 1+STRIDE, ... <= n_tokens, so a
    document shorter than CHUNK still yields its (partial) head chunk
    and tail chunks may be shorter than CHUNK — deterministic, total
    coverage, no dropped tokens. The chunk text itself is carried as an
    md5 so downstream exact-dedup of chunks is a groupBy on a 32-byte
    key rather than on repeated text.

    Scale: map-only (sequence + explode + slice are row-local under
    codegen); output is ~n_tokens/STRIDE rows per doc. No shuffle.
    """
    return spark.sql(
        f"""
        WITH toks AS (
          SELECT doc_id, {TOKENS} AS toks FROM documents
        )
        SELECT doc_id,
               cast((s - 1) div {STRIDE} AS int) AS chunk_id,
               cast(s AS int) AS start_pos,
               size(slice(toks, s, {CHUNK})) AS n_chunk_tokens,
               md5(array_join(slice(toks, s, {CHUNK}), ' ')) AS chunk_hash
        FROM (
          SELECT doc_id, toks, explode(sequence(1, size(toks), {STRIDE})) AS s
          FROM toks
        )
        ORDER BY doc_id, chunk_id
        """
    )


CHUNK_WINDOWS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents
),
st AS (
  SELECT doc_id, toks, unnest(range(1, len(toks) + 1, {STRIDE})) AS s
  FROM toks
)
SELECT doc_id,
       cast((s - 1) // {STRIDE} AS int) AS chunk_id,
       cast(s AS int) AS start_pos,
       cast(len(toks[s:s + {CHUNK} - 1]) AS int) AS n_chunk_tokens,
       md5(array_to_string(toks[s:s + {CHUNK} - 1], ' ')) AS chunk_hash
FROM st
ORDER BY doc_id, chunk_id
"""


def span_dup_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicate-span stats against the whole corpus:
    n_spans (SPAN-gram positions), n_dup_spans (positions whose gram
    also occurs in ANOTHER document), covered_tokens (distinct token
    positions lying under at least one shared span), dup_fraction.

    Plan shape: one explode to (doc, pos, gram-md5), one groupBy on the
    gram hash for cross-doc document frequency, one join back, one
    bounded re-explode (x SPAN) for coverage. Everything keys on a
    32-hex hash, never on span text, so record width is constant. At
    100 TB this is the practical substitute for suffix-array substring
    dedup: the df aggregation is partial-aggregated map-side and the
    single shuffle key (the gram hash) is uniform by construction.
    """
    return spark.sql(
        f"""
        WITH toks AS (
          SELECT doc_id, {TOKENS} AS toks FROM documents
        ),
        grams AS (
          SELECT doc_id, s AS pos, md5(array_join(slice(toks, s, {SPAN}), ' ')) AS g
          FROM (
            SELECT doc_id, toks, explode(sequence(1, size(toks) - {SPAN} + 1)) AS s
            FROM toks WHERE size(toks) >= {SPAN}
          )
        ),
        df AS (
          SELECT g, count(DISTINCT doc_id) AS df FROM grams GROUP BY g
        ),
        flagged AS (
          SELECT doc_id, pos, df FROM grams JOIN df USING (g)
        ),
        span_stats AS (
          SELECT doc_id, count(*) AS n_spans,
                 count(*) FILTER (WHERE df > 1) AS n_dup_spans
          FROM flagged GROUP BY doc_id
        ),
        cover AS (
          SELECT doc_id, count(DISTINCT p) AS covered_tokens
          FROM (
            SELECT doc_id, explode(sequence(pos, pos + {SPAN} - 1)) AS p
            FROM flagged WHERE df > 1
          )
          GROUP BY doc_id
        )
        SELECT t.doc_id,
               size(t.toks) AS n_tokens,
               coalesce(s.n_spans, 0) AS n_spans,
               coalesce(s.n_dup_spans, 0) AS n_dup_spans,
               coalesce(c.covered_tokens, 0) AS covered_tokens,
               round(cast(coalesce(c.covered_tokens, 0) AS double) / size(t.toks), 4)
                 AS dup_fraction
        FROM toks t
        LEFT JOIN span_stats s ON s.doc_id = t.doc_id
        LEFT JOIN cover c ON c.doc_id = t.doc_id
        ORDER BY t.doc_id
        """
    )


SPAN_DUP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents
),
grams AS (
  SELECT doc_id, s AS pos, md5(array_to_string(toks[s:s + {SPAN} - 1], ' ')) AS g
  FROM (
    SELECT doc_id, toks, unnest(range(1, len(toks) - {SPAN} + 2)) AS s
    FROM toks WHERE len(toks) >= {SPAN}
  )
),
df AS (
  SELECT g, count(DISTINCT doc_id) AS df FROM grams GROUP BY g
),
flagged AS (
  SELECT doc_id, pos, df FROM grams JOIN df USING (g)
),
span_stats AS (
  SELECT doc_id, count(*) AS n_spans,
         count(*) FILTER (WHERE df > 1) AS n_dup_spans
  FROM flagged GROUP BY doc_id
),
cover AS (
  SELECT doc_id, count(DISTINCT p) AS covered_tokens
  FROM (
    SELECT doc_id, unnest(range(pos, pos + {SPAN})) AS p
    FROM flagged WHERE df > 1
  )
  GROUP BY doc_id
)
SELECT t.doc_id,
       len(t.toks) AS n_tokens,
       coalesce(s.n_spans, 0) AS n_spans,
       coalesce(s.n_dup_spans, 0) AS n_dup_spans,
       coalesce(c.covered_tokens, 0) AS covered_tokens,
       round(coalesce(c.covered_tokens, 0) * 1.0 / len(t.toks), 4)
         AS dup_fraction
FROM toks t
LEFT JOIN span_stats s ON s.doc_id = t.doc_id
LEFT JOIN cover c ON c.doc_id = t.doc_id
ORDER BY t.doc_id
"""


def registry() -> dict[str, dict]:
    return {
        "doc_chunk_windows": {"fn": chunk_windows, "oracle": CHUNK_WINDOWS_ORACLE},
        "dedup_span_coverage": {"fn": span_dup_coverage, "oracle": SPAN_DUP_ORACLE},
    }
