"""Query-string mini-languages: parser + semantics pinned by hand.

`simple_query_string` and `query_string` (operators/es_querystring.py)
get the Spark-vs-DuckDB differential from the oracle gate; these tests
pin the LANGUAGE itself — lexing, precedence refusal, negation NULL
semantics, token-level wildcards, range brackets — against rows
derived by eye from the ES docs, so both dialects can't share a
parser mistake. Also covers the batch-6 `regexp` and `terms_set`
query kinds.
"""

from __future__ import annotations

import duckdb
import pytest

from golang_db_query_engine_elasticsearch_indexer_spark.operators.es_dsl import (
    compile_search,
)
from golang_db_query_engine_elasticsearch_indexer_spark.operators.es_querystring import (
    parse_query_string,
    parse_simple_query_string,
)


@pytest.fixture()
def tiny():
    con = duckdb.connect()
    con.execute(
        """
        CREATE TABLE docs AS SELECT * FROM (VALUES
          (1, 'Alpha Beta Gamma', 'en',   'news',  10, 1),
          (2, 'beta gamma delta', 'en',   'blog',  20, 2),
          (3, 'delta epsilon',    'de',   'news',  30, 2),
          (4, 'beta alpha',       'de',   NULL,    40, 1),
          (5, 'gamma beta alpha', 'fr',   'a_c',   50, 3),
          (6, 'zeta',             'fr',   'abc',   60, 1),
          (7, 'epsilon zeta',     NULL,   '10%x',  70, 2),
          (8, 'alpha',            'en',   '105x',  80, 1)
        ) AS t(doc_id, text, lang, source, n, msm)
        """
    )
    return con


def _ids(con, body: dict) -> list[int]:
    return [
        r[0]
        for r in con.execute(compile_search("docs", body, "duck")).fetchall()
    ]


# --- regexp -------------------------------------------------------------------


def test_regexp_is_full_match(tiny):
    # 'ews' matches nothing (full match, not substring); 'n.ws' does
    assert _ids(tiny, {"query": {"regexp": {"source": "ews"}},
                       "size": 100}) == []
    assert _ids(tiny, {"query": {"regexp": {"source": "n.ws"}},
                       "size": 100}) == [1, 3]
    # dict form with value key; alternation
    assert _ids(tiny, {"query": {"regexp": {
        "source": {"value": "n.ws|bl.g"}}}, "size": 100}) == [1, 2, 3]


def test_regexp_rejections(tiny):
    for bad in ("it's", "a\\d+"):
        with pytest.raises(ValueError, match="quotes or backslashes"):
            _ids(tiny, {"query": {"regexp": {"source": bad}}})
    with pytest.raises(ValueError, match="unsupported regexp keys"):
        _ids(tiny, {"query": {"regexp": {
            "source": {"value": "x", "case_insensitive": True}}}})


# --- terms_set ----------------------------------------------------------------


def test_terms_set_field_and_script(tiny):
    # msm column: doc 5 needs 3 matches (has alpha+beta+gamma -> in),
    # doc 2 needs 2 (has beta+gamma -> in), doc 8 needs 1 (alpha -> in)
    body = {"query": {"terms_set": {"text": {
        "terms": ["alpha", "beta", "gamma"],
        "minimum_should_match_field": "msm",
    }}}, "size": 100}
    assert _ids(tiny, body) == [1, 2, 4, 5, 8]
    # literal script constant
    body2 = {"query": {"terms_set": {"text": {
        "terms": ["alpha", "beta", "gamma"],
        "minimum_should_match_script": {"source": "3"},
    }}}, "size": 100}
    assert _ids(tiny, body2) == [1, 5]


def test_terms_set_rejections(tiny):
    with pytest.raises(ValueError, match="exactly one of"):
        _ids(tiny, {"query": {"terms_set": {"text": {
            "terms": ["a"]}}}})
    with pytest.raises(ValueError, match="literal integer"):
        _ids(tiny, {"query": {"terms_set": {"text": {
            "terms": ["a"],
            "minimum_should_match_script": {
                "source": "doc['m'].value"},
        }}}})


# --- simple_query_string ------------------------------------------------------


def _sqs(q: str, **kw) -> dict:
    spec = {"query": q, "fields": ["text"], **kw}
    return {"query": {"simple_query_string": spec}, "size": 100}


def test_sqs_phrase_and_prefix(tiny):
    assert _ids(tiny, _sqs('"beta gamma"')) == [1, 2]
    assert _ids(tiny, _sqs("eps* | zet*")) == [3, 6, 7]


def test_sqs_negation_matches_nulls(tiny):
    # -term over a NULL-able field: membership via fields on lang
    body = {"query": {"simple_query_string": {
        "query": "-en", "fields": ["lang"]}}, "size": 100}
    # docs whose lang token stream does NOT contain 'en' — NULL lang
    # (doc 7) matches the negation, the ES must_not rule
    assert _ids(tiny, body) == [3, 4, 5, 6, 7]


def test_sqs_default_operator(tiny):
    # implicit adjacency: OR by default...
    assert _ids(tiny, _sqs("zeta epsilon")) == [3, 6, 7]
    # ...AND with default_operator
    assert _ids(tiny, _sqs("zeta epsilon",
                           default_operator="and")) == [7]


def test_sqs_grouping_and_explicit_ops(tiny):
    assert _ids(tiny, _sqs('(alpha | delta) + -"beta gamma"')) == [3, 4, 5, 8]


def test_sqs_multi_field_or(tiny):
    # a term matches if ANY listed field holds it
    body = {"query": {"simple_query_string": {
        "query": "news | zeta", "fields": ["text", "source"]}},
        "size": 100}
    assert _ids(tiny, body) == [1, 3, 6, 7]


def test_sqs_rejections(tiny):
    with pytest.raises(ValueError, match="parenthesize"):
        parse_simple_query_string("a | b + c", "or")
    with pytest.raises(ValueError, match="TRAILING"):
        parse_simple_query_string("fo*o", "or")
    with pytest.raises(ValueError, match="TRAILING"):
        parse_simple_query_string("fo?o", "or")
    with pytest.raises(ValueError, match="unterminated"):
        parse_simple_query_string('"open phrase', "or")
    with pytest.raises(ValueError, match="unbalanced"):
        parse_simple_query_string("(a | b", "or")
    with pytest.raises(ValueError, match="unbalanced"):
        parse_simple_query_string("a | b)", "or")
    with pytest.raises(ValueError, match="dangling"):
        parse_simple_query_string("| a", "or")
    with pytest.raises(ValueError, match="trailing operator"):
        parse_simple_query_string("a |", "or")
    with pytest.raises(ValueError, match="backslash"):
        parse_simple_query_string("a\\b", "or")
    with pytest.raises(ValueError, match="fields list"):
        compile_search(
            "docs",
            {"query": {"simple_query_string": {"query": "a"}}},
            "duck",
        )


# --- query_string -------------------------------------------------------------


def _qs(q: str, **kw) -> dict:
    spec = {"query": q, **kw}
    return {"query": {"query_string": spec}, "size": 100}


def test_qs_field_term_phrase_group(tiny):
    assert _ids(tiny, _qs("lang:en")) == [1, 2, 8]
    assert _ids(tiny, _qs('text:"beta gamma"')) == [1, 2]
    assert _ids(tiny, _qs("source:(news OR blog)")) == [1, 2, 3]


def test_qs_ranges_and_comparisons(tiny):
    # [10 TO 30] inclusive; {10 TO 30} exclusive; mixed brackets
    assert _ids(tiny, _qs("n:[10 TO 30]")) == [1, 2, 3]
    assert _ids(tiny, _qs("n:{10 TO 30}")) == [2]
    assert _ids(tiny, _qs("n:[10 TO 30}")) == [1, 2]
    assert _ids(tiny, _qs("n:[* TO 20]")) == [1, 2]
    assert _ids(tiny, _qs("n:>=70")) == [7, 8]
    assert _ids(tiny, _qs("n:<20")) == [1]


def test_qs_exists_and_not(tiny):
    assert _ids(tiny, _qs("NOT _exists_:lang")) == [7]
    assert _ids(tiny, _qs("!_exists_:source")) == [4]
    # NOT over a NULL-able field matches the NULL doc (must_not rule)
    assert _ids(tiny, _qs("NOT lang:en")) == [3, 4, 5, 6, 7]
    assert _ids(tiny, _qs("-lang:en")) == [3, 4, 5, 6, 7]


def test_qs_boolean_spellings(tiny):
    a = _ids(tiny, _qs("lang:en AND n:>=20"))
    b = _ids(tiny, _qs("lang:en && n:>=20"))
    assert a == b == [2, 8]
    c = _ids(tiny, _qs("lang:de OR lang:fr"))
    d = _ids(tiny, _qs("lang:de || lang:fr"))
    assert c == d == [3, 4, 5, 6]


def test_qs_wildcards_are_token_level(tiny):
    # 'a_c' and 'abc' and '10%x'/'105x' probe LIKE metachar escaping:
    # a?c must hit both a_c and abc (token-level '?'), while the
    # LIKE-special '_' in the data never acts as a wildcard itself
    assert _ids(tiny, _qs("source:a?c")) == [5, 6]
    assert _ids(tiny, _qs("source:10*x")) == [7, 8]
    assert _ids(tiny, _qs("text:gam*")) == [1, 2, 5]


def test_qs_default_field_and_bare_term(tiny):
    assert _ids(tiny, _qs("zeta", default_field="text")) == [6, 7]
    with pytest.raises(ValueError, match="needs fields/default_field"):
        _ids(tiny, _qs("zeta"))


def test_qs_default_operator_and_fields(tiny):
    body = {"query": {"query_string": {
        "query": "zeta epsilon", "fields": ["text"],
        "default_operator": "and"}}, "size": 100}
    assert _ids(tiny, body) == [7]


def test_qs_rejections(tiny):
    with pytest.raises(ValueError, match="boost/fuzzy/regex"):
        parse_query_string("text:foo^2", "or")
    with pytest.raises(ValueError, match="boost/fuzzy/regex"):
        parse_query_string("text:foo~1", "or")
    with pytest.raises(ValueError, match="boost/fuzzy/regex"):
        parse_query_string("text:/re.gex/", "or")
    with pytest.raises(ValueError, match="leading wildcards"):
        parse_query_string("text:*foo", "or")
    with pytest.raises(ValueError, match="'\\+' \\(must\\)"):
        parse_query_string("+text:foo", "or")
    with pytest.raises(ValueError, match="parenthesize"):
        parse_query_string("a AND b OR c", "or")
    with pytest.raises(ValueError, match="unterminated range"):
        parse_query_string("n:[1 TO", "or")
    with pytest.raises(ValueError, match="wants a term"):
        parse_query_string("lang: AND x", "or")
    with pytest.raises(ValueError, match="both bounds"):
        parse_query_string("n:[* TO *]", "or")
    with pytest.raises(ValueError, match="exclusive"):
        compile_search("docs", {"query": {"query_string": {
            "query": "a", "fields": ["text"],
            "default_field": "text"}}}, "duck")


def test_qs_parser_ast_shapes():
    # the AST itself, pinned: field group distributes the field
    node = parse_query_string("source:(news OR blog)", "or")
    assert node == ("or", [("term", "source", "news"),
                           ("term", "source", "blog")])
    node = parse_simple_query_string("a + -b", "or")
    assert node == ("and", [("term", None, "a"),
                            ("not", ("term", None, "b"))])
    # default_operator resolves implicit adjacency
    assert parse_simple_query_string("a b", "and")[0] == "and"
    assert parse_simple_query_string("a b", "or")[0] == "or"


# --- property fuzz: the parsers are total and deterministic -------------------


def _sqs_strategy():
    from hypothesis import strategies as st

    terms = st.sampled_from(["alpha", "beta", "gamma", "delta",
                             "epsilon", "zeta", "eps*", "zet*"])
    phrase = st.sampled_from(['"beta gamma"', '"alpha"'])
    clause = st.one_of(terms, phrase)
    neg = st.builds(lambda c: f"-{c}", clause)
    unit = st.one_of(clause, neg)

    def group(children):
        # one operator kind per level (the compiler's refusal rule)
        return st.builds(
            lambda op, parts: "(" + f" {op} ".join(parts) + ")",
            st.sampled_from(["|", "+", ""]),
            st.lists(children, min_size=1, max_size=3),
        )

    return st.recursive(unit, group, max_leaves=6)


def test_sqs_fuzz_total_and_deterministic(tiny):
    from hypothesis import HealthCheck, given, settings

    @given(q=_sqs_strategy())
    @settings(max_examples=80, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def prop(q):
        body = {"query": {"simple_query_string": {
            "query": q, "fields": ["text"]}}, "size": 100}
        d1 = compile_search("docs", body, "duck")
        assert d1 == compile_search("docs", body, "duck")  # pure
        compile_search("docs", body, "spark")              # both dialects
        ids = [r[0] for r in tiny.execute(d1).fetchall()]
        assert ids == sorted(ids)  # id-tiebreak total order

    prop()


def test_qs_fuzz_field_expressions(tiny):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    leaf = st.one_of(
        st.sampled_from([
            "lang:en", "lang:de", 'text:"beta gamma"', "source:news",
            "n:[10 TO 50]", "n:{20 TO 70}", "n:>=30", "n:<40",
            "_exists_:lang", "source:a?c", "text:gam*",
        ]),
    )
    neg = st.builds(lambda c: f"NOT {c}", leaf)
    unit = st.one_of(leaf, neg)

    def group(children):
        return st.builds(
            lambda op, parts: "(" + f" {op} ".join(parts) + ")",
            st.sampled_from(["AND", "OR"]),
            st.lists(children, min_size=1, max_size=3),
        )

    expr = st.recursive(unit, group, max_leaves=6)

    @given(q=expr)
    @settings(max_examples=80, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def prop(q):
        body = {"query": {"query_string": {
            "query": q, "default_field": "text"}}, "size": 100}
        d1 = compile_search("docs", body, "duck")
        assert d1 == compile_search("docs", body, "duck")
        compile_search("docs", body, "spark")
        tiny.execute(d1).fetchall()  # executes without binder errors

    prop()
