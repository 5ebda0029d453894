"""ES Query-DSL compiler: semantics pinned on hand-derived rows.

The registered es_dsl_* entries get the full Spark-vs-DuckDB
differential from the oracle gate (both texts come from one compiler,
so that gate proves dialect CONSISTENCY); these tests pin the DSL
SEMANTICS themselves — bool logic, minimum_should_match defaults,
must_not NULL handling, analyzer behavior, wildcard/prefix escaping,
range-bucket edge rules — against expected results derived by hand
from the ES docs, so the two dialects cannot simply share a mistake.
"""

from __future__ import annotations

import duckdb
import pytest

from golang_db_query_engine_elasticsearch_indexer_spark.operators.es_dsl import (
    _analyze,
    compile_aggs,
    compile_search,
)


@pytest.fixture()
def tiny():
    """An in-memory corpus small enough to evaluate the DSL by eye."""
    con = duckdb.connect()
    con.execute(
        """
        CREATE TABLE docs AS SELECT * FROM (VALUES
          (1, 'Alpha Beta Gamma', 'en',   'news',  10),
          (2, 'beta gamma delta', 'en',   'blog',  20),
          (3, 'delta epsilon',    'de',   'news',  30),
          (4, 'beta alpha',       'de',   NULL,    40),
          (5, 'gamma beta alpha', 'fr',   'a_c',   50),
          (6, 'zeta',             'fr',   'abc',   60),
          (7, 'epsilon zeta',     NULL,   '10%x',  70),
          (8, 'alpha',            'en',   '105x',  80)
        ) AS t(doc_id, text, lang, source, n)
        """
    )
    return con


def _ids(con, sql: str) -> list[int]:
    return [r[0] for r in con.execute(sql).fetchall()]


def _search(body: dict) -> str:
    return compile_search("docs", body, "duck")


def test_match_analyzes_and_ors_tokens(tiny):
    # "ALPHA delta" analyzes to [alpha, delta]; any token hit matches
    body = {"query": {"match": {"text": "ALPHA   delta"}}, "size": 100}
    assert _ids(tiny, _search(body)) == [1, 2, 3, 4, 5, 8]


def test_match_phrase_requires_adjacency(tiny):
    # "beta alpha" adjacent in 4 and 5 only (1 has alpha THEN beta)
    body = {"query": {"match_phrase": {"text": "Beta ALPHA"}}, "size": 100}
    assert _ids(tiny, _search(body)) == [4, 5]


def test_bool_must_not_matches_null_fields(tiny):
    # ES: a doc whose field is NULL fails the inner clause, so it
    # MATCHES the must_not — plain SQL NOT would drop doc 4 and 7
    body = {
        "query": {"bool": {"must_not": [{"term": {"source": "news"}}]}},
        "size": 100,
    }
    assert _ids(tiny, _search(body)) == [2, 4, 5, 6, 7, 8]


def test_bool_should_msm_defaults(tiny):
    # should-only: minimum_should_match defaults to 1
    only = {
        "query": {"bool": {"should": [
            {"term": {"lang": "fr"}}, {"term": {"source": "blog"}},
        ]}},
        "size": 100,
    }
    assert _ids(tiny, _search(only)) == [2, 5, 6]
    # with a must present it defaults to 0: should becomes pure
    # scoring and must alone decides membership
    with_must = {
        "query": {"bool": {
            "must": [{"term": {"lang": "en"}}],
            "should": [{"term": {"source": "news"}}],
        }},
        "size": 100,
    }
    assert _ids(tiny, _search(with_must)) == [1, 2, 8]


def test_bool_explicit_msm_counts_votes(tiny):
    body = {
        "query": {"bool": {
            "should": [
                {"match": {"text": "alpha"}},
                {"term": {"lang": "en"}},
                {"range": {"n": {"gte": 50}}},
            ],
            "minimum_should_match": 2,
        }},
        "size": 100,
    }
    # votes: 1:(a,en)=2  2:(en)=1  4:(a)=1  5:(a,n)=2  8:(a,en,n)=3
    assert _ids(tiny, _search(body)) == [1, 5, 8]


def test_wildcard_translation_and_escaping(tiny):
    # ? = one char, * = any run
    body = {"query": {"wildcard": {"source": "a*c"}}, "size": 100}
    assert _ids(tiny, _search(body)) == [5, 6]
    # a literal _ in the pattern must NOT act as a metacharacter
    body = {"query": {"wildcard": {"source": "a_c"}}, "size": 100}
    assert _ids(tiny, _search(body)) == [5]
    # a literal % in a prefix value must NOT act as a metacharacter
    body = {"query": {"prefix": {"source": "10%"}}, "size": 100}
    assert _ids(tiny, _search(body)) == [7]


def test_terms_ids_exists_range(tiny):
    assert _ids(tiny, _search(
        {"query": {"terms": {"lang": ["de", "fr"]}}, "size": 100})) == [3, 4, 5, 6]
    assert _ids(tiny, _search(
        {"query": {"ids": {"values": [3, 5]}}, "size": 100})) == [3, 5]
    assert _ids(tiny, _search(
        {"query": {"exists": {"field": "lang"}}, "size": 100})) == [
        1, 2, 3, 4, 5, 6, 8]
    # gte inclusive, lt exclusive
    assert _ids(tiny, _search(
        {"query": {"range": {"n": {"gte": 30, "lt": 70}}}, "size": 100})) == [
        3, 4, 5, 6]


def test_sort_size_from_and_source(tiny):
    body = {
        "query": {"match_all": {}},
        "sort": [{"n": {"order": "desc"}}],
        "size": 3,
        "from": 2,
        "_source": ["doc_id", "n"],
    }
    rows = tiny.execute(_search(body)).fetchall()
    assert rows == [(6, 60), (5, 50), (4, 40)]


def test_range_agg_edges_and_order(tiny):
    body = {
        "aggs": {"b": {
            "range": {"field": "n", "ranges": [
                {"to": 30}, {"from": 30, "to": 60}, {"from": 60},
            ]},
        }},
    }
    rows = tiny.execute(compile_aggs("docs", body, "duck")).fetchall()
    # from inclusive, to exclusive: 10,20 | 30,40,50 | 60,70,80
    assert rows == [("*-30", 2), ("30-60", 3), ("60-*", 3)]


def test_terms_agg_orders_by_count_then_key(tiny):
    body = {"aggs": {"t": {"terms": {"field": "lang", "size": 10}}}}
    rows = tiny.execute(compile_aggs("docs", body, "duck")).fetchall()
    assert rows == [("en", 3), ("de", 2), ("fr", 2), (None, 1)]


def test_unsupported_dsl_raises_loudly():
    for body, msg in [
        ({"query": {"fuzzy": {"text": "x"}}}, "unsupported query clause"),
        ({"query": {"bool": {"boost": 2}}}, "unsupported bool keys"),
        ({"query": {"match": {"text": "  "}}}, "empty query string"),
        ({"suggest": {}}, "unsupported body keys"),
        ({"knn": {}}, "knn requires"),
        ({"sort": [{"n": {"order": "sideways"}}]}, "bad sort order"),
        ({"query": {"term": {"n; DROP": 1}}}, "bad field name"),
        (
            {"query": {"bool": {"should": [{"term": {"lang": "en"}}],
                                "minimum_should_match": 2}}},
            "exceeds should count",
        ),
    ]:
        with pytest.raises(ValueError, match=msg):
            compile_search("docs", body, "duck")
    with pytest.raises(ValueError, match="overlapping range buckets"):
        compile_aggs("docs", {"aggs": {"b": {"range": {
            "field": "n", "ranges": [{"to": 50}, {"from": 40}],
        }}}}, "duck")
    with pytest.raises(ValueError, match="unknown dialect"):
        compile_search("docs", {}, "mysql")


def test_analyzer_matches_repo_tokenizer():
    assert _analyze("  Foo   BAR\tbaz\n") == ["foo", "bar", "baz"]
    assert _analyze("one") == ["one"]


def test_registered_entries_match_duckdb(spark, tables, sf_dir, duck):
    """The five registered DSL bodies: Spark dialect vs DuckDB dialect,
    hash-style compare (same check the driver gate runs)."""
    from golang_db_query_engine_elasticsearch_indexer_spark.operators import es_dsl
    from golang_db_query_engine_elasticsearch_indexer_spark.oracle import compare

    for name, spec in es_dsl.registry().items():
        ok, diag = compare(spec["fn"](spark, sf_dir), duck, spec["oracle"])
        assert ok, (name, diag)


def test_avg_sum_metrics_are_order_independent(tiny):
    """sum/avg metrics aggregate exact DECIMALs and emit the raw IEEE
    double — a value pair straddling the round-to-4 half boundary
    (avg exactly 46.49875, the case that flipped between partition
    counts live) must come back as the one deterministic double, not a
    partition-order-dependent rounding."""
    tiny.execute(
        "CREATE TABLE vals AS SELECT * FROM (VALUES"
        " (1, 46.4987), (2, 46.4988)) AS t(doc_id, v)"
    )
    body = {"aggs": {"all": {
        "histogram": {"field": "doc_id", "interval": 100},
        "aggs": {"m": {"avg": {"field": "v"}},
                 "s": {"sum": {"field": "v"}}},
    }}}
    row = tiny.execute(compile_aggs("vals", body, "duck")).fetchall()[0]
    assert row[2] == float(str(92.9975)) / 2   # exact decimal sum, then /2
    assert row[3] == float(str(92.9975))


def test_knn_semantics_and_validation(tiny):
    """knn: exact cosine ordering, k limit, pre-filter, and loud
    rejection of malformed bodies — hand-checkable 2-d vectors."""
    tiny.execute(
        "CREATE TABLE vecs AS SELECT * FROM (VALUES"
        " (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.6, 0.8]),"
        " (4, [-1.0, 0.0]), (5, [0.8, 0.6])) AS t(vec_id, embedding)"
    )

    def knn(spec):
        return compile_search("vecs", {"knn": spec}, "duck", id_field="vec_id")

    base = {"field": "embedding", "query_vector": [1.0, 0.0], "k": 3}
    rows = tiny.execute(knn(base)).fetchall()
    # cos vs [1,0]: 1->1.0, 5->0.8, 3->0.6, 2->0.0, 4->-1.0
    assert rows == [(1, 1.0), (5, 0.8), (3, 0.6)]
    filtered = dict(base, filter={"range": {"vec_id": {"gt": 1}}})
    assert tiny.execute(knn(filtered)).fetchall() == [
        (5, 0.8), (3, 0.6), (2, 0.0)]

    for spec, msg in [
        (dict(base, query_vector=[]), "number list"),
        (dict(base, query_vector=["a"]), "number list"),
        (dict(base, similarity=0.5), "unsupported knn keys"),
    ]:
        with pytest.raises(ValueError, match=msg):
            knn(spec)
    with pytest.raises(ValueError, match="knn combines only"):
        compile_search("vecs", {"knn": base, "sort": ["vec_id"]}, "duck")


def test_es_search_gateway_api(spark, tables, sf_dir):
    """The public gateway verb: POST /{index}/_search parity — lazy
    df variant, enveloped variant, null params, and the loud
    unsupported-DSL failure BEFORE execution."""
    from golang_db_query_engine_elasticsearch_indexer_spark import (
        es_search,
        es_search_df,
    )
    from golang_db_query_engine_elasticsearch_indexer_spark.errors import (
        ParamsNullError,
    )

    body = {
        "query": {"term": {"lang": "en"}},
        "_source": ["doc_id", "lang"],
        "size": 5,
    }
    df = es_search_df(spark, "documents", body)
    rows = df.collect()
    assert len(rows) == 5 and all(r.lang == "en" for r in rows)
    res = es_search(spark, "documents", body)
    assert res.count == 5 and [c["name"] for c in res.schema] == ["doc_id", "lang"]
    # empty body = match_all with ES's default size 10
    assert es_search(spark, "documents", {}).count == 10
    with pytest.raises(ParamsNullError):
        es_search_df(spark, None, body)
    with pytest.raises(ParamsNullError):
        es_search_df(spark, "documents", None)
    with pytest.raises(ValueError, match="unsupported query clause"):
        es_search_df(spark, "documents", {"query": {"more_like_this": {}}})
