"""Event-sequence pattern matching (MATCH_RECOGNIZE-lite).

Neither the reference's gate grammar (2018 Vitess snapshot,
`api/controllers/query_controller.go:27`) nor Spark SQL has
MATCH_RECOGNIZE; the idiomatic Spark shape for per-entity sequence
patterns is: deterministic per-entity ordering -> one aggregation that
folds the entity's event-type codes into a journey STRING -> regex
kernels over that string, all JVM-side codegen. One shuffle (the
groupBy user), then map-only regex — the same shape at 100 TB, where
the per-user state is bounded by events-per-user, not corpus size.

Pattern discipline: the regexes use only literal character classes and
greedy quantifiers semantics shared by Java (Spark) and RE2-ish
(DuckDB) engines — the same Java-RE2 common-subset rule as
text_pii_redact; `regexp_extract_all` is non-overlapping
left-to-right in both. Journey strings order by (ts, event_id) —
event_id is unique, so the fold is total-ordered and both engines
build the identical string. Counting is integer — hash-safe.

:func:`pattern_match` — per user: journey length, completed funnel
count (``vc*p``: a view leading to a purchase through clicks only),
total view count (funnel-start denominator), and the longest error
streak.
:func:`top_paths` — the most common 3-step event paths (the order-2
extension of the Markov transition matrix in
`operators/sampling.py`-adjacent analytics): windows, no journey
string needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# single-char code per event type; journey = per-user coded string
_CODE_CASE = (
    "CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c' "
    "WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's' ELSE 'e' END"
)
FUNNEL_PATTERN = "vc*p"
ERROR_RUN_PATTERN = "e+"
TOP_PATHS_K = 15


def _pattern_sql(*, dialect: str) -> str:
    if dialect == "spark":
        journey = (
            "array_join(transform(array_sort(collect_list("
            "struct(ts, event_id, code))), x -> x.code), '')"
        )
        streak = (
            "coalesce(array_max(transform("
            f"regexp_extract_all(journey, '{ERROR_RUN_PATTERN}', 0), "
            "x -> length(x))), 0)"
        )
        n_funnels = f"size(regexp_extract_all(journey, '{FUNNEL_PATTERN}', 0))"
    else:
        journey = "string_agg(code, '' ORDER BY ts, event_id)"
        streak = (
            "coalesce(list_max(list_transform("
            f"regexp_extract_all(journey, '{ERROR_RUN_PATTERN}'), "
            "x -> length(x))), 0)"
        )
        n_funnels = f"len(regexp_extract_all(journey, '{FUNNEL_PATTERN}'))"
    return f"""
WITH coded AS (
  SELECT user_id, ts, event_id, {_CODE_CASE} AS code FROM events
),
journeys AS (
  SELECT user_id, {journey} AS journey
  FROM coded GROUP BY user_id
)
SELECT user_id,
       length(journey) AS journey_len,
       CAST({n_funnels} AS BIGINT) AS n_funnels,
       CAST(length(journey) - length(replace(journey, 'v', '')) AS BIGINT)
         AS n_views,
       CAST({streak} AS BIGINT) AS max_error_streak
FROM journeys
ORDER BY user_id
"""


def pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sequence-pattern summary over the coded journey string:
    completed view->clicks->purchase funnels (non-overlapping regex
    count), total views, and the longest error streak."""
    return spark.sql(_pattern_sql(dialect="spark"))


def _top_paths_sql() -> str:
    """Most common 3-step event paths. Dialect-shared text: two LEAD
    windows over the per-user (ts, event_id) total order, then a plain
    count. Ranked with an explicit (count DESC, path) total order so the
    LIMIT is deterministic in both engines."""
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS nxt1,
         lead(event_type, 2) OVER w AS nxt2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT concat(event_type, '>', nxt1, '>', nxt2) AS path,
       count(*) AS n
FROM seq
WHERE nxt1 IS NOT NULL AND nxt2 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, path
LIMIT {TOP_PATHS_K}
"""


def top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TOP_PATHS_K most frequent 3-step paths — the order-2
    extension of the Markov transition matrix entry."""
    return spark.sql(_top_paths_sql())


def registry() -> dict[str, dict]:
    return {
        "events_pattern_match": {
            "fn": pattern_match,
            "oracle": _pattern_sql(dialect="duckdb"),
        },
        "events_top_paths": {
            "fn": top_paths,
            "oracle": _top_paths_sql(),
        },
    }
