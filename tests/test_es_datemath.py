"""ES date math: anchors, calendar arithmetic, per-operator rounding.

The rounding table is the part users get wrong reading the ES docs —
every case here is hand-derived from that table, including the op
REWRITES (`gt /M` becomes `gte <next month start>`) that keep both
engines comparing against clean unit boundaries instead of a
.999999 instant.
"""

from __future__ import annotations

from datetime import datetime

import duckdb
import pytest

from golang_db_query_engine_elasticsearch_indexer_spark.operators import (
    es_datemath as dm,
)
from golang_db_query_engine_elasticsearch_indexer_spark.operators.es_dsl import (
    compile_search,
)


@pytest.mark.parametrize(
    ("expr", "op", "want"),
    [
        # the ES docs' own /M example, all four operators
        ("2014-11-18||/M", "gte", ("gte", "2014-11-01 00:00:00")),
        ("2014-11-18||/M", "gt", ("gte", "2014-12-01 00:00:00")),
        ("2014-11-18||/M", "lte", ("lt", "2014-12-01 00:00:00")),
        ("2014-11-18||/M", "lt", ("lt", "2014-11-01 00:00:00")),
        # chained arithmetic, day rounding
        ("2024-01-04||+1w/d", "lt", ("lt", "2024-01-11 00:00:00")),
        ("2024-01-04||-3d/d", "gte", ("gte", "2024-01-01 00:00:00")),
        # month-end clamping (java.time rule), leap year
        ("2024-01-31||+1M", "gte", ("gte", "2024-02-29 00:00:00")),
        ("2023-01-31||+1M", "gte", ("gte", "2023-02-28 00:00:00")),
        # time-of-day anchors and h/m units
        ("2024-01-10T12:30:45||+2h-15m", "lte",
         ("lte", "2024-01-10 14:15:45")),
        # ISO week rounding: Wednesday -> Monday
        ("2024-01-10||/w", "gte", ("gte", "2024-01-08 00:00:00")),
        ("2024-01-04||+1y/y", "lt", ("lt", "2025-01-01 00:00:00")),
    ],
)
def test_rounding_table(expr, op, want):
    assert dm.resolve(expr, op) == want


def test_now_anchor_pinned():
    dm.set_now(datetime(2024, 1, 15, 13, 45, 7))
    try:
        assert dm.resolve("now-7d/d", "gte") == ("gte", "2024-01-08 00:00:00")
        assert dm.resolve("now", "lte") == ("lte", "2024-01-15 13:45:07")
        assert dm.resolve("now/d", "lte") == ("lt", "2024-01-16 00:00:00")
    finally:
        dm.set_now(None)


def test_unpinned_now_is_current():
    # serving default: resolves, lands near the wall clock
    _, lit = dm.resolve("now", "gte")
    got = datetime.strptime(lit, "%Y-%m-%d %H:%M:%S")
    assert abs((got - datetime.utcnow()).total_seconds()) < 60


@pytest.mark.parametrize(
    "bad",
    ["now//d", "2024-01-04||/d+1d", "now+d", "now-1q", "now 7d",
     "2024-13-40||"],
)
def test_rejections(bad):
    with pytest.raises(ValueError):
        dm.resolve(bad, "gte")


def test_range_compiles_date_math_both_dialects():
    con = duckdb.connect()
    con.execute("""
        CREATE TABLE ev AS SELECT * FROM (VALUES
          (1, TIMESTAMP '2023-12-31 23:59:59'),
          (2, TIMESTAMP '2024-01-01 00:00:00'),
          (3, TIMESTAMP '2024-01-10 23:59:59'),
          (4, TIMESTAMP '2024-01-11 00:00:00')
        ) AS t(event_id, ts)
    """)
    body = {"query": {"range": {"ts": {"gte": "2024-01-04||-3d/d",
                                       "lt": "2024-01-04||+1w/d"}}},
            "size": 100}
    ids = [r[0] for r in con.execute(
        compile_search("ev", body, "duck", "event_id")).fetchall()]
    assert ids == [2, 3]  # [Jan 1, Jan 11): boundary-exact
    # the spark dialect emits the same literals
    assert "'2024-01-01 00:00:00'" in compile_search(
        "ev", body, "spark", "event_id")
