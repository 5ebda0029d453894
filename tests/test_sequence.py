"""Behavioral contracts for sequence-pattern matching and the
Matryoshka recall curve (oracle equality is covered by the gate in
test_oracle_queries.py)."""

from __future__ import annotations

from golang_db_query_engine_elasticsearch_indexer_spark.operators import (
    sequence,
    similarity,
)


def test_pattern_match_counts_vs_recompute(spark, tables):
    """The regex funnel count must equal a pure-Python re count over an
    independently-built journey string (catches ordering and
    coding-table drift between the fold and the regex)."""
    import re

    rows = sequence.pattern_match(spark, None).collect()
    got = {r.user_id: (r.journey_len, r.n_funnels, r.n_views, r.max_error_streak)
           for r in rows}
    code = {"view": "v", "click": "c", "purchase": "p", "signup": "s"}
    ev = (
        spark.table("events")
        .select("user_id", "ts", "event_id", "event_type")
        .orderBy("user_id", "ts", "event_id")
        .collect()
    )
    journeys: dict[int, str] = {}
    for r in ev:
        journeys[r.user_id] = journeys.get(r.user_id, "") + code.get(
            r.event_type, "e"
        )
    assert set(got) == set(journeys)
    for uid, j in journeys.items():
        exp = (
            len(j),
            len(re.findall(sequence.FUNNEL_PATTERN, j)),
            j.count("v"),
            max((len(m) for m in re.findall("e+", j)), default=0),
        )
        assert got[uid] == exp, f"user {uid}: {got[uid]} != {exp}"


def test_top_paths_are_valid_and_ranked(spark, tables):
    rows = sequence.top_paths(spark, None).collect()
    assert 0 < len(rows) <= sequence.TOP_PATHS_K
    types = {"view", "click", "purchase", "signup", "error"}
    for r in rows:
        a, b, c = r.path.split(">")
        assert {a, b, c} <= types
    counts = [r.n for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_matryoshka_recall_curve_shape(spark, tables):
    """One row per (prefix width, probe); recall in [0,1]; wider
    prefixes cannot lose MEAN recall by a large margin (the curve is
    noisy per-probe but the mean is monotone-ish; assert no collapse)."""
    rows = similarity.matryoshka_recall_eval(spark, None).collect()
    dims = sorted({r.prefix_dim for r in rows})
    assert dims == sorted(similarity.MRL_DIMS)
    per_dim = {
        d: [r.recall_at_k for r in rows if r.prefix_dim == d] for d in dims
    }
    assert all(len(v) == similarity.N_PROBES for v in per_dim.values())
    assert all(0.0 <= x <= 1.0 for v in per_dim.values() for x in v)
    means = [sum(per_dim[d]) / len(per_dim[d]) for d in dims]
    assert means[-1] >= means[0] - 0.2, f"curve collapsed: {means}"
