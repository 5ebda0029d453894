"""ES|QL compiler semantics, pinned on hand-derived rows (the es_dsl
test discipline): stage behavior, expression grammar, loud rejections,
and both dialects compiling every registered statement."""

from __future__ import annotations

import duckdb
import pytest

from golang_db_query_engine_elasticsearch_indexer_spark.operators.esql import (
    ESQL_EVAL_KEEP,
    ESQL_FILTER_STATS,
    ESQL_MEDIAN_RENAME,
    compile_esql,
)


@pytest.fixture()
def tiny():
    con = duckdb.connect()
    con.execute(
        """
        CREATE TABLE t AS SELECT * FROM (VALUES
          (1, 'en', 'alpha beta',  10.0),
          (2, 'en', 'beta gamma',  20.0),
          (3, 'de', 'gamma delta', 30.0),
          (4, 'de', 'delta',       40.0),
          (5, 'fr', NULL,          NULL)
        ) AS x(id, lang, text, v)
        """
    )
    return con


def _rows(con, q):
    return con.execute(compile_esql(q, "duck")).fetchall()


def test_where_eval_keep_sort_limit(tiny):
    rows = _rows(tiny, """FROM t
      | EVAL dv = v * 2, tag = CONCAT(lang, "!")
      | WHERE dv >= 40 AND lang != "fr"
      | KEEP id, tag, dv
      | SORT dv DESC, id ASC
      | LIMIT 2""")
    assert rows == [(4, "de!", 80.0), (3, "de!", 60.0)]


def test_stats_by_and_aggs(tiny):
    rows = _rows(tiny, """FROM t
      | STATS n = COUNT(*), nv = COUNT(v), s = SUM(v), a = AVG(v),
              m = MEDIAN(v), langs = COUNT_DISTINCT(lang)
      """)
    (n, nv, s, a, m, langs), = rows
    assert (n, nv, langs) == (5, 4, 3)
    assert s == 100.0 and a == 25.0 and m == 25.0
    by = _rows(tiny, "FROM t | STATS n = COUNT(*) BY lang | SORT lang")
    assert by == [("de", 2), ("en", 2), ("fr", 1)]


def test_like_wildcards_and_predicates(tiny):
    rows = _rows(tiny, 'FROM t | WHERE text LIKE "*beta*" | SORT id')
    assert [r[0] for r in rows] == [1, 2]
    rows = _rows(tiny, 'FROM t | WHERE text LIKE "delt?" | SORT id')
    assert [r[0] for r in rows] == [4]
    rows = _rows(tiny, "FROM t | WHERE v IS NULL")
    assert [r[0] for r in rows] == [5]
    rows = _rows(tiny, 'FROM t | WHERE lang IN ("en", "fr") | SORT id')
    assert [r[0] for r in rows] == [1, 2, 5]
    rows = _rows(tiny, "FROM t | WHERE NOT (v > 15) | SORT id")
    assert [r[0] for r in rows] == [1]  # NULL fails the negation too


def test_drop_and_rename(tiny):
    rows = tiny.execute(compile_esql(
        "FROM t | DROP text, v | RENAME lang AS language | SORT id"
        " | LIMIT 1", "duck")).fetchdf()
    assert list(rows.columns) == ["id", "language"]


def test_esql_rejections(tiny):
    for q, msg in [
        ("", "empty query"),
        ("WHERE x == 1", "source command must be FROM"),
        ("FROM t | GROK x", "unsupported command"),
        ("FROM t | WHERE x ~ 1", "unsupported syntax"),
        ("FROM t | STATS PERCENTILE(v, 90)", "unsupported function"),
        ("FROM t | WHERE SUM(v) > 1", "only inside STATS"),
        ("FROM t | STATS n = COUNT(*) BY v + 1",
         "BY wants plain column names"),
        ("FROM t | LIMIT many", "LIMIT wants one integer"),
        ("FROM t | EVAL 3 = v", "EVAL wants name"),
        ("FROM t | SORT v NULLS", "SORT wants column"),
        ('FROM t | WHERE text LIKE 5', "LIKE wants a string"),
    ]:
        with pytest.raises(ValueError, match=msg):
            compile_esql(q, "duck")


def test_registered_statements_compile_both_dialects():
    for q in (ESQL_FILTER_STATS, ESQL_EVAL_KEEP, ESQL_MEDIAN_RENAME):
        for dialect in ("spark", "duck"):
            assert "SELECT" in compile_esql(q, dialect)
