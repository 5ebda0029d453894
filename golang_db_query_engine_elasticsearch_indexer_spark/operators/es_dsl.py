"""Elasticsearch Query-DSL compiler: `_search` bodies -> Spark SQL.

The reference exists to put rows INTO Elasticsearch so users can query
them with the ES `_search` DSL (`api/controllers/elastic_controller.go`
ships the documents; querying is the whole point of shipping). This
module closes that loop natively: the SAME JSON body a reference user
sends to `POST /index/_search` compiles to a Catalyst plan over the
engine's tables.

Query context: bool trees with ES minimum_should_match defaults;
term/terms/ids/exists/range (incl. `now-7d/d` date math,
operators/es_datemath.py; dotted names reach inside JSON columns as
typed object fields); prefix/wildcard/regexp; analyzed
match/match_phrase/match_phrase_prefix/match_bool_prefix/fuzzy/
terms_set; the query_string and simple_query_string mini-languages
(operators/es_querystring.py); dis_max/boosting/constant_score/
wrapper compound wrappers; intervals/span_near positional proximity;
geo_distance/geo_bounding_box over the f_lat/f_lon point convention;
has_child/has_parent over declared key-pair relations; bare
match/multi_match (and the FULL function_score — decay curves,
script_score, random_score, functions arrays — plus pinned /
more_like_this / rank_feature / distance_feature / combined_fields /
rescore) = scored hits with optional min_score; SCORED BOOL (full-text
musts/shoulds sum, filters gate membership — the everyday search
shape); knn; percolate; _rank_eval (precision@k / MRR / DCG vs rated
documents).
Hit surface: `_source`/`fields`/`sort`/`size`/`from`, search_after
and the stateless scroll cursor (plus `slice` disjoint partitions and
the PIT snapshot assertion), collapse, in-body highlight,
runtime_mappings, the suggest API (term + completion).

Aggregation context up to three bucket levels: terms (order/missing/
include/exclude), date_histogram (calendar/fixed intervals,
zero-filled axes), histogram (offset, zero-fill), range/date_range,
rare_terms, multi_terms, auto_date_histogram, geotile_grid,
significant_terms/significant_text, adjacency_matrix,
sampler/diversified_sampler, composite-with-after,
filters/filter/global/missing, matrix_stats; metrics
avg/sum/min/max/value_count/cardinality/stats/extended_stats/
percentiles/percentile_ranks/weighted_avg/string_stats/boxplot/rate/
median_absolute_deviation/t_test/top_metrics/geo_centroid/geo_bounds;
parent pipelines
cumulative_sum/derivative/serial_diff/moving_fn/moving_percentiles/
bucket_script/bucket_selector/normalize/bucket_sort/
cumulative_cardinality; sibling pipelines avg/sum/min/max_bucket/
stats_bucket/percentiles_bucket; and top_hits.

Design:

- The compiler emits SQL TEXT in two dialects ("spark", "duck") from
  one clause tree — the registered entries run the Spark dialect and
  hand the DuckDB dialect to the driver's differential gate, the same
  split discipline as TOKENS/DUCK_TOKENS everywhere else. DSL
  *semantics* (bool logic, minimum_should_match, wildcard translation,
  phrase adjacency, range-bucket edges) are additionally pinned by
  unit tests against hand-derived expected rows, so the two dialects
  can't just agree on a shared mistake.
- Analysis model: the engine's standard analyzer is the repo tokenizer
  (lowercase, whitespace split — functions.TOKENS). `match` analyzes
  its query string at COMPILE time (Python) with the same rule and
  tests token membership; `match_phrase` tests adjacency on the
  space-joined token stream.
- Query vs filter context, the ES split: a TOP-LEVEL bare `match` /
  `multi_match` with no explicit `sort` is QUERY CONTEXT — it compiles
  to a BM25-scored (`operators/search.py` formula, same K1/B),
  `_score`-ordered hit list, which is how ES users experience
  `_search` by default. Everything else (bool trees, any clause with
  an explicit sort, agg filters) is FILTER CONTEXT: membership only,
  no score. Scoring inside arbitrary bool trees is intentionally
  unsupported (a loud ValueError via the normal clause path), never a
  silent constant score.
- Determinism discipline: every search gets a trailing id tiebreak,
  every double metric is round()-ed, terms buckets order by
  (doc_count DESC, key) — so LIMIT windows and hashes are total and
  cross-engine stable.
- Unsupported DSL raises ValueError loudly (no silent best-effort):
  a clause the compiler doesn't understand must never return wrong
  rows quietly.

Scale shape: compilation is driver-side string work; the emitted plan
is ordinary Catalyst SQL — filters push down to the parquet scan,
single-level aggs are one partial+final aggregation, terms-agg top-N
is TakeOrdered. Nothing in the compiled text changes at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# --- analysis (the standard analyzer: lowercase + whitespace split) ---------


def _analyze(query: str) -> list[str]:
    """Compile-time analyzer for match/match_phrase query strings —
    the Python replay of functions.TOKENS (lowercase, trim, split on
    whitespace runs)."""
    return [t for t in re.split(r"\s+", query.strip().lower()) if t]


def _tokens_expr(field: str, dialect: str) -> str:
    if dialect == "spark":
        return rf"split(lower(trim({field})), '\\s+')"
    return rf"string_split_regex(lower(trim({field})), '\s+')"


# --- literal rendering -------------------------------------------------------


def _lit(v, dialect: str) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        # Strings stay plain string literals — INCLUDING date-shaped
        # ones. Both engines coerce a string literal to the column's
        # temporal type in comparisons (verified: identical counts and
        # parquet pushdown either way), while a forced TIMESTAMP
        # literal against a STRING column holding date-shaped text
        # (ids, versions) silently compiled to the wrong comparison
        # (ADVICE r08 finding #2). ES date math is still out of scope.
        return "'" + v.replace("'", "''") + "'"
    raise ValueError(f"es_dsl: unsupported literal {v!r}")


def _like_escape(s: str) -> str:
    """Escape LIKE metacharacters in a literal fragment. Uses '!' with
    an explicit ESCAPE clause — backslash escapes parse differently in
    Spark vs DuckDB STRING literals, so backslash is the one escape
    char a cross-dialect compiler must not use."""
    return (
        s.replace("!", "!!").replace("%", "!%").replace("_", "!_")
        .replace("'", "''")
    )


def _ident(f) -> str:
    if not isinstance(f, str) or not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", f):
        raise ValueError(f"es_dsl: bad field name {f!r}")
    return f


_JSON_FIELD = re.compile(
    r"[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)+"
)


def _field_or_json(f, probe_value, dialect: str) -> str:
    """Field reference for term/terms/range/exists: a plain column
    name renders as itself; a DOTTED name (``props.k``) is the ES
    object-field idiom — the leading segment is a JSON string column
    and the rest is the path inside it, rendered as a JSON extraction
    cast by the comparison value's type (numbers compare numerically,
    strings as text). Pure scan-local projection: Catalyst/DuckDB
    evaluate the extraction inside the scan, and a NULL path (absent
    key, malformed document) fails the predicate like ES's missing
    field."""
    if not isinstance(f, str) or "." not in f:
        return _ident(f)
    if not _JSON_FIELD.fullmatch(f):
        raise ValueError(f"es_dsl: bad field name {f!r}")
    col, _, path = f.partition(".")
    numeric = isinstance(probe_value, (int, float)) and not isinstance(
        probe_value, bool
    )
    if dialect == "spark":
        e = f"get_json_object({col}, '$.{path}')"
        return f"cast({e} AS double)" if numeric else e
    # DuckDB's extraction ERRORS on malformed JSON where Spark's
    # returns NULL — the json_valid guard pins both engines to the ES
    # behavior (a malformed document simply doesn't match)
    e = (
        f"json_extract_string(CASE WHEN json_valid({col})"
        f" THEN {col} END, '$.{path}')"
    )
    return f"CAST({e} AS DOUBLE)" if numeric else e


# --- query context -----------------------------------------------------------


def _one(d: dict, what: str) -> tuple:
    if not isinstance(d, dict) or len(d) != 1:
        raise ValueError(f"es_dsl: {what} must be a single-key object")
    return next(iter(d.items()))


def _query_expr(q: dict, dialect: str, id_field: str,
                relations: dict | None = None) -> str:
    kind, body = _one(q, "query clause")
    if kind == "match_all":
        return "TRUE"
    if kind == "bool":
        return _bool_expr(body, dialect, id_field, relations)
    if kind == "term":
        f, v = _one(body, "term")
        ci = False
        if isinstance(v, dict):
            bad = set(v) - {"value", "case_insensitive", "boost"}
            if bad:
                raise ValueError(
                    f"es_dsl: unsupported term keys {sorted(bad)}"
                )
            ci = bool(v.get("case_insensitive", False))
            v = v["value"]
        if ci:
            if not isinstance(v, str):
                raise ValueError(
                    "es_dsl: term case_insensitive wants a string value"
                )
            return (
                f"lower({_field_or_json(f, v, dialect)})"
                f" = {_lit(v.lower(), dialect)}"
            )
        return f"{_field_or_json(f, v, dialect)} = {_lit(v, dialect)}"
    if kind == "terms":
        f, vals = _one(body, "terms")
        if isinstance(vals, dict):
            # ES terms LOOKUP: the allowed values come from another
            # document — relationally, the `path` column of the row in
            # `index` whose id matches. Compiles to an IN-subquery: a
            # point lookup the planner turns into a broadcast semi-join
            # (one row), so the lookup costs what the literal list
            # costs at any scale.
            bad = set(vals) - {"index", "id", "path", "routing"}
            if bad:
                raise ValueError(
                    f"es_dsl: unsupported terms lookup keys {sorted(bad)}"
                )
            missing = {"index", "id", "path"} - set(vals)
            if missing:
                raise ValueError(
                    f"es_dsl: terms lookup requires {sorted(missing)}"
                )
            src = _ident(vals["index"])
            path = _ident(vals["path"])
            key = vals["id"]
            if not isinstance(key, (str, int)) or isinstance(key, bool):
                raise ValueError("es_dsl: terms lookup id must be str/int")
            # Alias the lookup table and QUALIFY both columns: an
            # unqualified id predicate would silently resolve as a
            # CORRELATED reference to the outer table whenever the
            # lookup table lacks the id column — turning the point
            # lookup into per-row correlation with wrong matches.
            # Qualified, a missing column raises at analysis time.
            return (
                f"{_ident(f)} IN (SELECT lk.{path} FROM {src} AS lk\n"
                f"    WHERE lk.{id_field} = {_lit(key, dialect)})"
            )
        if not isinstance(vals, list) or not vals:
            raise ValueError("es_dsl: terms wants a non-empty list")
        fe = _field_or_json(f, vals[0], dialect)
        return f"{fe} IN ({', '.join(_lit(v, dialect) for v in vals)})"
    if kind == "ids":
        vals = body["values"]
        return f"{id_field} IN ({', '.join(_lit(v, dialect) for v in vals)})"
    if kind == "exists":
        return f"{_field_or_json(body['field'], '', dialect)} IS NOT NULL"
    if kind == "range":
        f, conds = _one(body, "range")
        ops = {"gte": ">=", "gt": ">", "lte": "<=", "lt": "<"}
        parts = []
        for op, v in conds.items():
            if op not in ops:
                raise ValueError(f"es_dsl: unsupported range op {op!r}")
            if isinstance(v, str):
                from golang_db_query_engine_elasticsearch_indexer_spark.operators import (  # noqa: PLC0415
                    es_datemath,
                )

                if es_datemath.looks_like_date_math(v):
                    # `now-7d/d` / `2024-01-04||+1w/d`: resolved at
                    # compile time to a plain timestamp literal (with
                    # the ES per-operator rounding rules, rewritten to
                    # clean unit boundaries — es_datemath)
                    op, v = es_datemath.resolve(v, op)
            fe = _field_or_json(f, v, dialect)
            parts.append(f"{fe} {ops[op]} {_lit(v, dialect)}")
        if not parts:
            raise ValueError("es_dsl: empty range")
        return "(" + " AND ".join(parts) + ")"
    if kind == "prefix":
        f, v = _one(body, "prefix")
        ci = False
        if isinstance(v, dict):
            bad = set(v) - {"value", "case_insensitive", "boost"}
            if bad:
                raise ValueError(
                    f"es_dsl: unsupported prefix keys {sorted(bad)}"
                )
            ci = bool(v.get("case_insensitive", False))
            v = v["value"]
        if ci:
            return (
                f"lower({_ident(f)}) LIKE "
                f"'{_like_escape(v.lower())}%' ESCAPE '!'"
            )
        return f"{_ident(f)} LIKE '{_like_escape(v)}%' ESCAPE '!'"
    if kind == "wildcard":
        f, v = _one(body, "wildcard")
        ci = False
        if isinstance(v, dict):
            bad = set(v) - {"value", "case_insensitive", "boost"}
            if bad:
                raise ValueError(
                    f"es_dsl: unsupported wildcard keys {sorted(bad)}"
                )
            ci = bool(v.get("case_insensitive", False))
            v = v["value"]
        if ci:
            v = v.lower()
        pat = "".join(
            "%" if c == "*" else "_" if c == "?" else _like_escape(c) for c in v
        )
        fe = f"lower({_ident(f)})" if ci else _ident(f)
        return f"{fe} LIKE '{pat}' ESCAPE '!'"
    if kind == "match":
        f, v = _one(body, "match")
        op = "or"
        if isinstance(v, dict):
            bad = set(v) - {"query", "operator"}
            if bad:
                raise ValueError(f"es_dsl: unsupported match keys {sorted(bad)}")
            op = v.get("operator", "or")
            if op not in ("or", "and"):
                raise ValueError(f"es_dsl: bad match operator {op!r}")
            v = v["query"]
        toks = _analyze(v)
        if not toks:
            raise ValueError("es_dsl: match with an empty query string")
        arr = ", ".join(_lit(t, dialect) for t in toks)
        te = _tokens_expr(_ident(f), dialect)
        if op == "and":
            # every analyzed term must be present (ES operator: and)
            if dialect == "spark":
                return f"forall(array({arr}), t -> array_contains({te}, t))"
            return f"list_has_all({te}, [{arr}])"
        if dialect == "spark":
            return f"arrays_overlap({te}, array({arr}))"
        return f"len(list_intersect({te}, [{arr}])) > 0"
    if kind == "fuzzy":
        f, v = _one(body, "fuzzy")
        fuzz = "AUTO"
        if isinstance(v, dict):
            bad = set(v) - {"value", "fuzziness"}
            if bad:
                raise ValueError(f"es_dsl: unsupported fuzzy keys {sorted(bad)}")
            fuzz = v.get("fuzziness", "AUTO")
            v = v["value"]
        if not isinstance(v, str) or not v.strip():
            raise ValueError("es_dsl: fuzzy wants a non-empty term")
        term = v.strip().lower()  # term-level query against analyzed tokens
        if fuzz == "AUTO":
            # the ES AUTO ladder: exact < 3 chars, 1 edit 3..5, 2 above
            fuzz = 0 if len(term) < 3 else (1 if len(term) < 6 else 2)
        if not isinstance(fuzz, int) or fuzz < 0 or fuzz > 2:
            raise ValueError(f"es_dsl: bad fuzziness {fuzz!r}")
        te = _tokens_expr(_ident(f), dialect)
        lit = _lit(term, dialect)
        # any token within the edit budget matches; levenshtein agrees
        # between engines (checked: both pure Levenshtein, no transposition
        # discount)
        if dialect == "spark":
            return f"exists({te}, t -> levenshtein(t, {lit}) <= {fuzz})"
        return (
            f"len(list_filter({te}, t -> levenshtein(t, {lit}) <= {fuzz}))"
            " > 0"
        )
    if kind == "dis_max":
        # best-match scoring wrapper; in filter context membership is
        # the union of the sub-queries (a doc matching ANY scores)
        bad = set(body) - {"queries", "tie_breaker"}
        if bad:
            raise ValueError(f"es_dsl: unsupported dis_max keys {sorted(bad)}")
        subs = body.get("queries")
        if not isinstance(subs, list) or not subs:
            raise ValueError("es_dsl: dis_max wants a non-empty queries list")
        parts = [
            f"coalesce({_query_expr(c, dialect, id_field)}, FALSE)"
            for c in subs
        ]
        return "(" + " OR ".join(parts) + ")"
    if kind == "boosting":
        # the negative clause DEMOTES, it does not exclude (ES
        # semantics) — so filter-context membership is the positive
        # clause alone; the demotion is a scoring effect this context
        # drops by design
        bad = set(body) - {"positive", "negative", "negative_boost"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported boosting keys {sorted(bad)}"
            )
        if "positive" not in body:
            raise ValueError("es_dsl: boosting requires a positive clause")
        return _query_expr(body["positive"], dialect, id_field)
    if kind == "constant_score":
        # scoring wrapper; in filter context only the inner filter
        # membership matters (the boost has no relational meaning)
        bad = set(body) - {"filter", "boost"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported constant_score keys {sorted(bad)}"
            )
        return _query_expr(body["filter"], dialect, id_field)
    if kind == "match_phrase_prefix":
        f, v = _one(body, "match_phrase_prefix")
        if isinstance(v, dict):
            v = v["query"]
        toks = _analyze(v)
        if not toks:
            raise ValueError(
                "es_dsl: match_phrase_prefix with an empty query string"
            )
        te = _tokens_expr(_ident(f), dialect)
        joined = (
            f"concat(' ', array_join({te}, ' '), ' ')"
            if dialect == "spark"
            else f"' ' || array_to_string({te}, ' ') || ' '"
        )
        # phrase adjacency, but the LAST term matches as a PREFIX: the
        # needle keeps its leading token boundary and drops the
        # trailing one, so 'quick bro' hits 'quick brown'
        needle = " ".join(toks)
        return f"{joined} LIKE '%{_like_escape(' ' + needle)}%' ESCAPE '!'"
    if kind == "match_phrase":
        f, v = _one(body, "match_phrase")
        slop = 0
        if isinstance(v, dict):
            bad = set(v) - {"query", "slop"}
            if bad:
                raise ValueError(
                    f"es_dsl: unsupported match_phrase keys {sorted(bad)}"
                )
            slop = v.get("slop", 0)
            if not isinstance(slop, int) or isinstance(slop, bool) or slop < 0:
                raise ValueError(
                    "es_dsl: match_phrase slop must be an int >= 0"
                )
            v = v["query"]
        toks = _analyze(v)
        if not toks:
            raise ValueError("es_dsl: match_phrase with an empty query string")
        if slop:
            # Lucene sloppy phrase, exactly, for two terms: forward
            # with up to `slop` intervening positions; the transposed
            # order costs 2 moves, so it matches iff slop >= 2 with
            # the residual budget as its gap allowance. Three-plus
            # sloppy terms need positional DP no single predicate
            # expresses — loud raise, never an approximation.
            if len(toks) != 2:
                raise ValueError(
                    "es_dsl: match_phrase slop supports exactly 2 terms "
                    f"(got {len(toks)}; use intervals for longer "
                    "unbounded sequences)"
                )
            a, b_ = toks
            pred = _proximity_pred(f, [a, b_], slop, True, dialect,
                                   "match_phrase")
            if slop >= 2:
                rev = _proximity_pred(f, [b_, a], slop - 2, True, dialect,
                                      "match_phrase")
                pred = f"({pred} OR {rev})"
            return pred
        te = _tokens_expr(_ident(f), dialect)
        joined = (
            f"concat(' ', array_join({te}, ' '), ' ')"
            if dialect == "spark"
            else f"' ' || array_to_string({te}, ' ') || ' '"
        )
        needle = " ".join(toks)
        return f"{joined} LIKE '%{_like_escape(' ' + needle + ' ')}%' ESCAPE '!'"
    if kind == "match_bool_prefix":
        # ES match_bool_prefix: every analyzed term is a term match,
        # the LAST is a token prefix; operator or (default) = any
        # clause matches, and = all must. Unlike match_phrase_prefix,
        # no adjacency — the "search-as-you-type over bags of words"
        # query.
        f, v = _one(body, "match_bool_prefix")
        op = "or"
        if isinstance(v, dict):
            bad = set(v) - {"query", "operator"}
            if bad:
                raise ValueError(
                    f"es_dsl: unsupported match_bool_prefix keys "
                    f"{sorted(bad)}"
                )
            op = v.get("operator", "or")
            if op not in ("or", "and"):
                raise ValueError(
                    f"es_dsl: bad match_bool_prefix operator {op!r}"
                )
            v = v["query"]
        toks = _analyze(v)
        if not toks:
            raise ValueError(
                "es_dsl: match_bool_prefix with an empty query string"
            )
        te = _tokens_expr(_ident(f), dialect)
        *full, last = toks
        clauses = []
        for t in full:
            lit = _lit(t, dialect)
            clauses.append(
                f"array_contains({te}, {lit})" if dialect == "spark"
                else f"list_contains({te}, {lit})"
            )
        pat = f"{_like_escape(last)}%"
        clauses.append(
            f"exists({te}, t -> t LIKE '{pat}' ESCAPE '!')"
            if dialect == "spark"
            else f"len(list_filter({te}, t -> t LIKE '{pat}'"
                 " ESCAPE '!')) > 0"
        )
        glue = " AND " if op == "and" else " OR "
        return "(" + glue.join(clauses) + ")"
    if kind == "wrapper":
        # base64-embedded query clause (clients that must smuggle JSON
        # through string-only config) — decode and compile the inner
        # clause; a decode/parse failure is the loud compile error
        import base64 as _b64  # noqa: PLC0415
        import json as _json  # noqa: PLC0415

        raw = body.get("query") if isinstance(body, dict) else None
        if not isinstance(raw, str):
            raise ValueError("es_dsl: wrapper wants a base64 query string")
        try:
            inner = _json.loads(_b64.b64decode(raw, validate=True))
        except Exception as exc:
            raise ValueError(f"es_dsl: wrapper query does not decode: {exc}")
        return _query_expr(inner, dialect, id_field)
    if kind == "regexp":
        # Lucene regexp is FULL-match on the field value (the keyword-
        # field idiom, like terms include/exclude); Spark rlike is
        # partial -> anchored there. Quotes/backslashes raise: escape
        # sequences parse differently across dialects.
        f, v = _one(body, "regexp")
        if isinstance(v, dict):
            bad = set(v) - {"value"}
            if bad:
                raise ValueError(
                    f"es_dsl: unsupported regexp keys {sorted(bad)} "
                    "(flags/case_insensitive are unsupported)"
                )
            v = v["value"]
        if not isinstance(v, str) or not v:
            raise ValueError("es_dsl: regexp wants a non-empty pattern")
        if "'" in v or "\\" in v:
            raise ValueError(
                "es_dsl: regexp may not contain quotes or backslashes "
                "(escapes parse differently across dialects)"
            )
        if dialect == "spark":
            return f"rlike({_ident(f)}, '^(?:{v})$')"
        return f"regexp_full_match({_ident(f)}, '{v}')"
    if kind == "terms_set":
        # ES terms_set: match when >= N of the given terms appear, N
        # read per-doc from minimum_should_match_field, or a CONSTANT
        # via a literal-integer minimum_should_match_script (the only
        # script shape accepted — anything else raises). Terms match
        # against the analyzed token stream, the module's text rule.
        f, spec = _one(body, "terms_set")
        bad = set(spec) - {"terms", "minimum_should_match_field",
                           "minimum_should_match_script"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported terms_set keys {sorted(bad)}"
            )
        terms = spec.get("terms")
        if not isinstance(terms, list) or not terms or not all(
            isinstance(t, str) and t for t in terms
        ):
            raise ValueError(
                "es_dsl: terms_set wants a non-empty string terms list"
            )
        has_field = "minimum_should_match_field" in spec
        has_script = "minimum_should_match_script" in spec
        if has_field == has_script:
            raise ValueError(
                "es_dsl: terms_set needs exactly one of "
                "minimum_should_match_field / _script"
            )
        if has_field:
            msm = _ident(spec["minimum_should_match_field"])
        else:
            src = spec["minimum_should_match_script"]
            src = src.get("source") if isinstance(src, dict) else src
            if not re.fullmatch(r"\d+", str(src).strip()):
                raise ValueError(
                    "es_dsl: terms_set minimum_should_match_script "
                    "supports a literal integer source only"
                )
            msm = str(int(str(src).strip()))
        arr = ", ".join(_lit(t.lower(), dialect) for t in set(terms))
        te = _tokens_expr(_ident(f), dialect)
        if dialect == "spark":
            return (
                f"size(array_intersect({te}, array({arr}))) >= {msm}"
            )
        return f"len(list_intersect({te}, [{arr}])) >= {msm}"
    if kind == "simple_query_string":
        from golang_db_query_engine_elasticsearch_indexer_spark.operators import (  # noqa: PLC0415
            es_querystring,
        )

        return es_querystring.simple_query_string_expr(
            body, dialect, id_field
        )
    if kind == "query_string":
        from golang_db_query_engine_elasticsearch_indexer_spark.operators import (  # noqa: PLC0415
            es_querystring,
        )

        return es_querystring.query_string_expr(body, dialect, id_field)
    if kind == "intervals":
        f, spec = _one(body, "intervals")
        rule, m = _one(spec, "intervals rule")
        if rule != "match":
            raise ValueError(
                f"es_dsl: unsupported intervals rule {rule!r} (match only; "
                "all_of/any_of/prefix/wildcard/fuzzy are unsupported)"
            )
        if not isinstance(m, dict):
            raise ValueError("es_dsl: intervals match wants an object")
        bad = set(m) - {"query", "max_gaps", "ordered"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported intervals match keys {sorted(bad)}"
            )
        terms = _analyze(m.get("query", ""))
        gaps = m.get("max_gaps", -1)
        if not isinstance(gaps, int) or isinstance(gaps, bool) or gaps < -1:
            raise ValueError("es_dsl: max_gaps must be an int >= -1")
        ordered = m.get("ordered", False)
        if not isinstance(ordered, bool):
            raise ValueError("es_dsl: intervals ordered must be a boolean")
        return _proximity_pred(f, terms, gaps, ordered, dialect, "intervals")
    if kind == "span_near":
        spec = body
        bad = set(spec) - {"clauses", "slop", "in_order"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported span_near keys {sorted(bad)}"
            )
        clauses = spec.get("clauses")
        if not isinstance(clauses, list) or len(clauses) < 2:
            raise ValueError("es_dsl: span_near wants >= 2 clauses")
        field = None
        terms = []
        for c in clauses:
            ck, cs = _one(c, "span_near clause")
            if ck != "span_term":
                raise ValueError(
                    f"es_dsl: unsupported span clause {ck!r} (span_term only)"
                )
            cf, cv = _one(cs, "span_term")
            if field is None:
                field = cf
            elif cf != field:
                raise ValueError(
                    "es_dsl: span_near clauses must share one field"
                )
            if not isinstance(cv, str):
                raise ValueError("es_dsl: span_term wants a string value")
            terms.append(cv.lower().strip())
        slop = spec.get("slop", 0)
        if not isinstance(slop, int) or isinstance(slop, bool) or slop < 0:
            raise ValueError("es_dsl: span_near slop must be an int >= 0")
        in_order = spec.get("in_order", True)
        if not isinstance(in_order, bool):
            raise ValueError("es_dsl: span_near in_order must be a boolean")
        return _proximity_pred(
            field, terms, slop, in_order, dialect, "span_near"
        )
    if kind in ("has_child", "has_parent"):
        # ES parent-child (the join field) relationally: the parent
        # and child types are TABLES related by a declared key pair,
        # and the query compiles to a semi-join — SELECT on one side
        # gated by an IN-subquery on the other. min/max_children add a
        # GROUP BY + HAVING on the child key first (aggregate BEFORE
        # the join, the partial-agg-friendly shape). score_mode none
        # only: scored parent-child needs the child scores joined into
        # the parent ranking, which this filter context doesn't carry.
        rels = relations or {}
        if kind == "has_child":
            bad = set(body) - {"type", "query", "min_children",
                               "max_children", "score_mode"}
            if bad:
                raise ValueError(
                    f"es_dsl: unsupported has_child keys {sorted(bad)}"
                )
            rel_name = body.get("type")
        else:
            bad = set(body) - {"parent_type", "query", "score_mode"}
            if bad:
                raise ValueError(
                    f"es_dsl: unsupported has_parent keys {sorted(bad)}"
                )
            rel_name = body.get("parent_type")
        if body.get("score_mode", "none") != "none":
            raise ValueError(
                "es_dsl: has_child/has_parent support score_mode none "
                "only (filter context)"
            )
        rel = rels.get(rel_name)
        if rel is None:
            raise ValueError(
                f"es_dsl: {kind} type {rel_name!r} has no declared "
                "relation (pass relations={type: {table, parent_key, "
                "child_key}} to compile_search)"
            )
        table = _ident(rel["table"])
        pk, ck = _ident(rel["parent_key"]), _ident(rel["child_key"])
        inner = _query_expr(
            body.get("query", {"match_all": {}}), dialect,
            rel.get("id_field", id_field), relations,
        )
        if kind == "has_parent":
            # current index is the CHILD side: keep rows whose parent
            # (in rel.table, keyed parent_key) matches the inner query
            return (
                f"{ck} IN (SELECT {pk} FROM {table}\n"
                f"    WHERE {inner})"
            )
        min_c = body.get("min_children", 1)
        max_c = body.get("max_children")
        for v, what in ((min_c, "min_children"), (max_c, "max_children")):
            if v is not None and (
                not isinstance(v, int) or isinstance(v, bool) or v < 1
            ):
                raise ValueError(f"es_dsl: {what} must be an int >= 1")
        if min_c == 1 and max_c is None:
            return (
                f"{pk} IN (SELECT {ck} FROM {table}\n"
                f"    WHERE {inner})"
            )
        having = f"count(*) >= {min_c}"
        if max_c is not None:
            having += f" AND count(*) <= {max_c}"
        return (
            f"{pk} IN (SELECT {ck} FROM {table}\n"
            f"    WHERE {inner}\n"
            f"    GROUP BY {ck} HAVING {having})"
        )
    if kind == "geo_bounding_box":
        f, box = _one(body, "geo_bounding_box")
        lat, lon = _geo_cols(f)
        if not isinstance(box, dict) or set(box) != {
            "top_left", "bottom_right",
        }:
            raise ValueError(
                "es_dsl: geo_bounding_box wants {top_left, bottom_right}"
            )
        tl = _geo_point(box["top_left"], "top_left")
        br = _geo_point(box["bottom_right"], "bottom_right")
        if tl[0] < br[0]:
            raise ValueError(
                "es_dsl: geo_bounding_box top_left.lat must be >= "
                "bottom_right.lat"
            )
        if tl[1] > br[1]:
            raise ValueError(
                "es_dsl: geo_bounding_box crossing the antimeridian is "
                "unsupported (top_left.lon must be <= bottom_right.lon)"
            )
        return (
            f"({lat} BETWEEN {br[0]!r} AND {tl[0]!r}"
            f" AND {lon} BETWEEN {tl[1]!r} AND {br[1]!r})"
        )
    if kind == "geo_distance":
        spec = dict(body)
        dist = spec.pop("distance", None)
        if dist is None or len(spec) != 1:
            raise ValueError(
                "es_dsl: geo_distance wants {distance, <geo_field>: "
                "{lat, lon}}"
            )
        meters = _distance_meters(dist)
        f, pt = next(iter(spec.items()))
        lat, lon = _geo_cols(f)
        lat0, lon0 = _geo_point(pt, f)
        return (
            f"({lat} IS NOT NULL AND {lon} IS NOT NULL AND "
            f"{_haversine(lat, lon, lat0, lon0)} <= {float(meters)!r})"
        )
    raise ValueError(f"es_dsl: unsupported query clause {kind!r}")


def _geo_cols(field) -> tuple[str, str]:
    """The engine's geo_point column convention: geo field ``f`` reads
    doubles ``f_lat`` / ``f_lon`` (the relational layout of ES's
    doc-values pair; runtime_mappings derive them when the table
    stores points differently)."""
    f = _ident(field)
    return f"{f}_lat", f"{f}_lon"


def _geo_point(pt, what: str) -> tuple[float, float]:
    if not isinstance(pt, dict) or set(pt) != {"lat", "lon"}:
        raise ValueError(f"es_dsl: {what} wants {{lat, lon}} numbers")
    lat, lon = pt["lat"], pt["lon"]
    for v in (lat, lon):
        if not isinstance(v, (int, float)) or isinstance(v, bool):
            raise ValueError(f"es_dsl: {what} wants {{lat, lon}} numbers")
    if not -90 <= lat <= 90 or not -180 <= lon <= 180:
        raise ValueError(f"es_dsl: {what} out of range")
    return float(lat), float(lon)


_DISTANCE = re.compile(r"(\d+(?:\.\d+)?)(m|km|mi)")


def _distance_meters(s) -> float:
    m = _DISTANCE.fullmatch(str(s))
    if not m:
        raise ValueError(
            f"es_dsl: bad distance {s!r} (want e.g. 500m / 200km / 10mi)"
        )
    return float(m.group(1)) * {"m": 1.0, "km": 1000.0,
                                "mi": 1609.344}[m.group(2)]


# ES GeoUtils.EARTH_MEAN_RADIUS (meters) — the radius ES's arc
# distance uses, so thresholds mean the same thing here
_EARTH_R = 6371008.7714


def _haversine(lat: str, lon: str, lat0: float, lon0: float) -> str:
    """Great-circle distance in meters from (lat, lon) columns to a
    fixed origin — haversine over doubles, identical text in both
    dialects (radians/sin/cos/asin/sqrt are shared), with the origin's
    trigonometry folded to Python float literals at compile time."""
    import math

    p0, l0 = math.radians(lat0), math.radians(lon0)
    cos0 = math.cos(p0)
    dphi = f"((radians({lat}) - {p0!r}) / 2)"
    dl = f"((radians({lon}) - {l0!r}) / 2)"
    a = (
        f"sin({dphi}) * sin({dphi})"
        f" + cos(radians({lat})) * {cos0!r} * sin({dl}) * sin({dl})"
    )
    return f"(2 * {_EARTH_R!r} * asin(sqrt({a})))"


_PROX_TERM = re.compile(r"[a-z0-9]+")


def _proximity_pred(
    field, terms: list[str], gaps: int, ordered: bool, dialect: str,
    what: str,
) -> str:
    """intervals-match / span_near as ONE regex over the analyzed
    token string: the field's tokens joined by single spaces, so token
    adjacency in the string IS positional adjacency in the index —
    exact proximity semantics with zero extra relations, evaluated
    inside the scan (map-only; the cheapest possible shape at scale).

    Bounded gap counts (`max_gaps`/`slop` >= 0) render as counted
    `( [^ ]+){0,g}` runs between terms — exact for TWO terms, where the
    pair gap IS the interval gap; three-plus terms with a bounded gap
    budget would need cross-pair gap accounting no single regex can
    express, so that shape raises loudly rather than approximating.
    Unbounded (-1 intervals / no-limit spans) supports any term count:
    ordered = subsequence containment, unordered = all-terms
    containment. Terms must analyze to [a-z0-9]+ tokens (regex-safe by
    construction — no escaping path to audit)."""
    f = _ident(field)
    if len(terms) < 2:
        raise ValueError(f"es_dsl: {what} wants >= 2 terms")
    for t in terms:
        if not _PROX_TERM.fullmatch(t):
            raise ValueError(
                f"es_dsl: {what} term {t!r} must analyze to a plain "
                "[a-z0-9]+ token"
            )
    if gaps >= 0 and len(terms) != 2:
        raise ValueError(
            f"es_dsl: {what} with a bounded gap budget supports exactly "
            f"2 terms (got {len(terms)}; cross-pair gap accounting is "
            "not expressible exactly — use -1/unbounded)"
        )
    te = _tokens_expr(f, dialect)
    joined = (
        f"array_join({te}, ' ')" if dialect == "spark"
        else f"array_to_string({te}, ' ')"
    )

    def rx(pat: str) -> str:
        if dialect == "spark":
            return f"{joined} RLIKE '{pat}'"
        return f"regexp_matches({joined}, '{pat}')"

    if gaps >= 0:
        a, b = terms
        fwd = f"(^| ){a}( [^ ]+){{0,{gaps}}} {b}( |$)"
        if ordered:
            return rx(fwd)
        rev = f"(^| ){b}( [^ ]+){{0,{gaps}}} {a}( |$)"
        return f"({rx(fwd)} OR {rx(rev)})"
    if ordered:
        pat = "(^| )" + "( [^ ]+)* ".join(terms) + "( |$)"
        return rx(pat)
    return "(" + " AND ".join(
        rx(f"(^| ){t}( |$)") for t in terms
    ) + ")"


def _bool_expr(body: dict, dialect: str, id_field: str,
               relations: dict | None = None) -> str:
    """ES bool semantics: must/filter AND, must_not AND NOT, should
    with minimum_should_match defaulting to 1 when there is no
    must/filter and 0 otherwise (pure scoring — dropped, since this is
    filter context)."""
    known = {"must", "filter", "should", "must_not", "minimum_should_match"}
    bad = set(body) - known
    if bad:
        raise ValueError(f"es_dsl: unsupported bool keys {sorted(bad)}")

    def clauses(key: str) -> list[dict]:
        v = body.get(key, [])
        return v if isinstance(v, list) else [v]

    parts: list[str] = []
    for c in clauses("must") + clauses("filter"):
        parts.append(_query_expr(c, dialect, id_field, relations))
    for c in clauses("must_not"):
        neg = _query_expr(c, dialect, id_field, relations)
        # must_not matches docs where the clause is NOT true — in ES a
        # NULL field simply fails the inner clause, so NULLs MATCH the
        # negation; plain SQL NOT would drop them
        parts.append(f"NOT coalesce({neg}, FALSE)")
    should = clauses("should")
    msm = body.get("minimum_should_match")
    if msm is None:
        msm = 1 if should and not (clauses("must") + clauses("filter")) else 0
    if not isinstance(msm, int) or msm < 0:
        raise ValueError("es_dsl: minimum_should_match must be an int >= 0")
    if msm > 0:
        if msm > len(should):
            raise ValueError("es_dsl: minimum_should_match exceeds should count")
        votes = " + ".join(
            "(CASE WHEN coalesce("
            f"{_query_expr(c, dialect, id_field, relations)}, FALSE)"
            " THEN 1 ELSE 0 END)"
            for c in should
        )
        parts.append(f"({votes}) >= {msm}")
    if not parts:
        return "TRUE"
    return "(" + " AND ".join(parts) + ")"


# --- query context: BM25 relevance scoring -----------------------------------
#
# The same Okapi BM25 the engine's search operators use
# (operators/search.py:38 — Lucene-style non-negative idf, shared
# K1/B), emitted in both dialects. Scores round to 4 dp BEFORE the
# rank order (libm ln drift discipline) and every ordering carries the
# id tiebreak, so the hit permutation is total and cross-engine stable.

_BM25_K1 = 1.2  # = search.K1 (pinned by test_scored_constants_match_search)
_BM25_B = 0.75  # = search.B


def _bm25_field_ctes(
    index: str, field: str, terms: list[str], p: str, dialect: str,
    id_field: str, require_all: bool = False,
) -> str:
    """CTE chain scoring ONE analyzed field: `{p}_bm(_id, s)` holds the
    per-doc BM25 over ``terms``. Corpus stats (N, avgdl) are per field,
    as in Lucene.

    Scale shape: the token array is filter()-ed to query terms before
    the explode (spark dialect), so non-query tokens never materialize
    rows; tf/df are two partial-aggregatable GROUP BYs; df and stats
    are vocabulary-/constant-sized relations joined back onto the tf
    stream (AQE broadcasts them)."""
    arr = ", ".join(_lit(t, dialect) for t in terms)
    te = _tokens_expr(field, dialect)
    if dialect == "spark":
        inner = (
            f"SELECT _id, size(toks) AS dl,\n"
            f"           explode(filter(toks, x -> x IN ({arr}))) AS w\n"
            f"    FROM {p}_toks"
        )
        tf_where = ""
        ln = "size"
    else:
        inner = (
            f"SELECT _id, len(toks) AS dl, unnest(toks) AS w\n"
            f"    FROM {p}_toks"
        )
        tf_where = f"\n  WHERE w IN ({arr})"
        ln = "len"
    k1, b = _BM25_K1, _BM25_B
    # operator: and — a hit must match EVERY distinct analyzed term;
    # scoring is unchanged (BM25 over the matched terms)
    having = (
        f"\n  HAVING count(DISTINCT w) = {len(set(terms))}"
        if require_all else ""
    )
    return f"""{p}_toks AS (
  SELECT {id_field} AS _id, {te} AS toks FROM {_ident(index)}
),
{p}_stats AS (
  SELECT count(*) AS n_docs, avg({ln}(toks)) AS avgdl FROM {p}_toks
),
{p}_tf AS (
  SELECT _id, w, count(*) AS tf, max(dl) AS dl
  FROM ({inner}){tf_where}
  GROUP BY _id, w
),
{p}_df AS (
  SELECT w, count(*) AS df FROM {p}_tf GROUP BY w
),
{p}_bm AS (
  SELECT _id,
         sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
             * tf * ({k1} + 1)
             / (tf + {k1} * (1 - {b} + {b} * dl / avgdl))) AS s
  FROM {p}_tf JOIN {p}_df USING (w) CROSS JOIN {p}_stats
  GROUP BY _id{having}
)"""


def _fvf_expr(fvf: dict, dialect: str) -> str:
    """field_value_factor as one SQL expression over the joined-back
    hit row `t`: modifier(factor * t.field), ES's application order.
    Optional `missing` substitutes for NULL field values (without it a
    NULL field yields a NULL score, which ES would reject at runtime —
    pass `missing` for nullable fields)."""
    bad = set(fvf) - {"field", "factor", "modifier", "missing"}
    if bad:
        raise ValueError(
            f"es_dsl: unsupported field_value_factor keys {sorted(bad)}"
        )
    f = f"t.{_ident(fvf['field'])}"
    if "missing" in fvf:
        f = f"coalesce({f}, {_lit(fvf['missing'], dialect)})"
    factor = fvf.get("factor", 1)
    if not isinstance(factor, (int, float)) or isinstance(factor, bool):
        raise ValueError("es_dsl: field_value_factor factor must be numeric")
    x = f"{factor} * {f}" if factor != 1 else f
    modifier = fvf.get("modifier", "none")
    if modifier == "none":
        return f"({x})"
    if modifier == "log1p":
        return f"ln(1 + {x})"
    if modifier == "sqrt":
        return f"sqrt({x})"
    raise ValueError(
        f"es_dsl: unsupported field_value_factor modifier {modifier!r} "
        "(none/log1p/sqrt)"
    )


_DURATION = re.compile(r"(\d+)([smhd])")
_ORIGIN_TS = re.compile(r"\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}:\d{2})?")


def _duration_secs(s, what: str) -> int:
    m = _DURATION.fullmatch(str(s))
    if not m:
        raise ValueError(
            f"es_dsl: {what} wants a duration like 7d/12h/30m/45s, "
            f"got {s!r}"
        )
    return int(m.group(1)) * {"s": 1, "m": 60, "h": 3600, "d": 86400}[
        m.group(2)
    ]


def _epoch_secs(col: str, origin: str, dialect: str) -> tuple[str, str]:
    """(field, origin) as microsecond-exact epoch SECONDS, double in
    both dialects. Spark's unix_timestamp truncates to whole seconds
    while DuckDB's epoch keeps the fraction — enough to flip rounded
    score boundaries — so both sides read integer MICROS
    (unix_micros / epoch_us agree exactly) and divide by the same
    double. Used only as differences, so timezone conventions cancel."""
    m = "cast(1000000 AS double)"
    if dialect == "spark":
        # the fixture surfaces TIMESTAMP_NTZ (and the engine session
        # sets spark.sql.timestampType=TIMESTAMP_NTZ, so a bare
        # `timestamp` cast/literal is ALSO ntz); unix_micros wants
        # TIMESTAMP_LTZ — cast both sides to timestamp_ltz explicitly:
        # the session-tz shift applies equally and cancels in the
        # difference
        return (
            f"(cast(unix_micros(cast({col} AS timestamp_ltz)) AS double)"
            f" / {m})",
            f"(cast(unix_micros(cast(timestamp '{origin}' AS"
            f" timestamp_ltz)) AS double) / {m})",
        )
    return (
        f"(cast(epoch_us({col}) AS double) / {m})",
        f"(cast(epoch_us(TIMESTAMP '{origin}') AS double) / {m})",
    )


def _decay_expr(kind: str, spec: dict, dialect: str) -> str:
    """function_score decay (gauss/exp/linear) as one row-local SQL
    expression over the joined-back hit row — the ES recency/proximity
    boosting idiom. The decay curve's constants (lambda / pivot span)
    are folded to Python float literals at compile time, so both
    dialects evaluate IDENTICAL IEEE operations on identical operands
    and the 4-dp score round never sits on an engine-dependent
    boundary. Date fields take an explicit ISO origin (never "now" —
    a non-deterministic origin can't be oracle-checked) with duration
    scale/offset; the epoch conversion enters only as a DIFFERENCE, so
    session-timezone conventions cancel."""
    import math

    f, p = _one(spec, f"{kind} decay")
    bad = set(p) - {"origin", "scale", "offset", "decay"}
    if bad:
        raise ValueError(f"es_dsl: unsupported {kind} decay keys {sorted(bad)}")
    missing = {"origin", "scale"} - set(p)
    if missing:
        raise ValueError(f"es_dsl: {kind} decay requires {sorted(missing)}")
    decay = p.get("decay", 0.5)
    if (
        not isinstance(decay, (int, float)) or isinstance(decay, bool)
        or not 0 < decay < 1
    ):
        raise ValueError("es_dsl: decay must be a number in (0, 1)")
    col = _ident(f)
    origin = p["origin"]
    if isinstance(origin, str):
        if not _ORIGIN_TS.fullmatch(origin):
            raise ValueError(
                f"es_dsl: bad decay origin {origin!r} (ISO date/datetime; "
                "'now' is unsupported — pass an explicit origin)"
            )
        s_secs = _duration_secs(p["scale"], f"{kind} decay scale")
        off = _duration_secs(p.get("offset", "0s"), f"{kind} decay offset")
        x, o = _epoch_secs(col, origin, dialect)
        scale = float(s_secs)
        offset = float(off)
    else:
        if not isinstance(origin, (int, float)) or isinstance(origin, bool):
            raise ValueError("es_dsl: decay origin must be a number or date")
        scale = p["scale"]
        if (
            not isinstance(scale, (int, float)) or isinstance(scale, bool)
            or scale <= 0
        ):
            raise ValueError("es_dsl: decay scale must be a positive number")
        offset = p.get("offset", 0)
        if (
            not isinstance(offset, (int, float)) or isinstance(offset, bool)
            or offset < 0
        ):
            raise ValueError("es_dsl: decay offset must be a number >= 0")
        x, o = f"cast({col} AS double)", repr(float(origin))
        scale, offset = float(scale), float(offset)
    dist = f"greatest(cast(0 AS double), abs({x} - {o}) - {offset!r})"
    if kind == "gauss":
        lam = math.log(decay) / (scale * scale)
        return f"exp({lam!r} * {dist} * {dist})"
    if kind == "exp":
        lam = math.log(decay) / scale
        return f"exp({lam!r} * {dist})"
    span = scale / (1.0 - decay)
    return f"greatest(cast(0 AS double), ({span!r} - {dist}) / {span!r})"


def _random_score_expr(rs: dict, dialect: str, id_field: str) -> str:
    """random_score with an EXPLICIT seed+field: ES's deterministic
    shuffle (same seed -> same order). Rendered as the engine's
    md5-uniform primitive (functions.hash16 over md5('seed:field')),
    the same dialect-portable hash the sampling operators are built
    on — so the "random" permutation is identical in Spark and DuckDB
    and the query is oracle-checkable, unlike a rand() call."""
    if not isinstance(rs, dict):
        raise ValueError("es_dsl: random_score wants an object")
    bad = set(rs) - {"seed", "field"}
    if bad:
        raise ValueError(f"es_dsl: unsupported random_score keys {sorted(bad)}")
    seed = rs.get("seed", 0)
    if not isinstance(seed, int) or isinstance(seed, bool):
        raise ValueError("es_dsl: random_score seed must be an int")
    f = _ident(rs.get("field", id_field))
    cast = "string" if dialect == "spark" else "varchar"
    from golang_db_query_engine_elasticsearch_indexer_spark.functions import (
        hash16,
    )

    h = hash16(f"md5(concat('{seed}:', cast({f} AS {cast})))")
    return f"({h} / cast(65536 AS double))"


def _script_score_expr(ss: dict) -> str:
    """script_score over the Painless-lite grammar _compile_script
    already enforces for bucket_script (arithmetic + comparisons
    only): doc['field'].value refs read the joined-back hit row,
    params.* resolve to numeric literals, and `_score` reads the BM25
    relevance of the inner query — the three inputs real ES
    script_score bodies combine. Anything beyond the grammar (method
    calls, strings, ternaries) raises at compile time."""
    if not isinstance(ss, dict) or set(ss) != {"script"}:
        raise ValueError("es_dsl: script_score wants {script: {...}}")
    script = ss["script"]
    if not isinstance(script, dict) or set(script) - {"source", "params"}:
        raise ValueError(
            "es_dsl: script_score script wants {source, params?}"
        )
    src = script.get("source")
    if not isinstance(src, str) or not src.strip():
        raise ValueError("es_dsl: script_score needs a source string")
    pmap: dict[str, str] = {}
    for k, v in (script.get("params") or {}).items():
        if not isinstance(v, (int, float)) or isinstance(v, bool):
            raise ValueError(
                f"es_dsl: script_score param {k!r} must be numeric"
            )
        pmap[k] = repr(float(v)) if isinstance(v, float) else str(v)
    # `_score` reads the inner query's BM25 score (scored CTE column)
    src = re.sub(r"(?<![\w.'])_score\b", "params._score", src)
    pmap["_score"] = "sc.s"
    return "(" + _compile_script(
        src, pmap, "script_score", allow_doc_fields=True
    ) + ")"


_FS_FUNCTION_KINDS = (
    "field_value_factor", "gauss", "exp", "linear",
    "script_score", "random_score",
)


def _fs_one_function(entry: dict, dialect: str, id_field: str,
                     what: str) -> str:
    """Render the single score function in a function_score entry
    (shorthand body or one element of `functions`) as a row-local SQL
    expression; `weight` multiplies, a bare weight IS the function."""
    kinds = [k for k in entry if k in _FS_FUNCTION_KINDS]
    if len(kinds) > 1:
        raise ValueError(
            f"es_dsl: {what} has multiple score functions {sorted(kinds)}"
        )
    if kinds:
        k = kinds[0]
        if k == "field_value_factor":
            expr = _fvf_expr(entry[k], dialect)
        elif k in ("gauss", "exp", "linear"):
            expr = _decay_expr(k, entry[k], dialect)
        elif k == "script_score":
            expr = _script_score_expr(entry[k])
        else:
            expr = _random_score_expr(entry[k], dialect, id_field)
    else:
        expr = "cast(1 AS double)"
    w = entry.get("weight")
    if w is not None:
        if not isinstance(w, (int, float)) or isinstance(w, bool):
            raise ValueError(f"es_dsl: {what} weight must be numeric")
        expr = f"{w} * ({expr})" if kinds else f"cast({w} AS double)"
    elif not kinds:
        raise ValueError(
            f"es_dsl: {what} needs a score function or a weight"
        )
    return expr


def _fs_factor(fs: dict, dialect: str, id_field: str) -> str:
    """The combined function_score factor: either the shorthand single
    function, or the `functions` array — each entry optionally gated
    by a `filter` (non-matching entries contribute NOTHING, the ES
    semantics), combined by `score_mode` multiply (product, absent
    entries = 1) or sum (sum of matching entries; if NO entry matches
    the factor is 1, i.e. the score is unmodified — ES's documented
    behavior). `max_boost` caps the factor before it combines with
    the query score. Everything is row-local arithmetic over the
    joined-back hit row: zero extra shuffles, zero extra scans."""
    if "functions" in fs:
        if set(fs) & {*_FS_FUNCTION_KINDS, "weight"}:
            raise ValueError(
                "es_dsl: function_score takes functions OR a shorthand "
                "function, not both"
            )
        entries = fs["functions"]
        if not isinstance(entries, list) or not entries:
            raise ValueError("es_dsl: functions wants a non-empty list")
        exprs = []
        for i, entry in enumerate(entries):
            if not isinstance(entry, dict):
                raise ValueError("es_dsl: functions entries must be objects")
            bad = set(entry) - {"filter", "weight", *_FS_FUNCTION_KINDS}
            if bad:
                raise ValueError(
                    f"es_dsl: unsupported functions[{i}] keys {sorted(bad)}"
                )
            expr = _fs_one_function(entry, dialect, id_field, f"functions[{i}]")
            if "filter" in entry:
                pred = _query_expr(entry["filter"], dialect, id_field)
                expr = f"CASE WHEN {pred} THEN {expr} END"
            exprs.append(f"({expr})")
        mode = fs.get("score_mode", "multiply")
        if mode == "multiply":
            factor = " * ".join(
                f"coalesce({e}, cast(1 AS double))" for e in exprs
            )
        elif mode == "sum":
            all_null = " AND ".join(f"{e} IS NULL" for e in exprs)
            total = " + ".join(
                f"coalesce({e}, cast(0 AS double))" for e in exprs
            )
            factor = (
                f"CASE WHEN {all_null} THEN cast(1 AS double) "
                f"ELSE {total} END"
            )
        else:
            raise ValueError(
                f"es_dsl: unsupported score_mode {mode!r} (multiply/sum)"
            )
    else:
        if "score_mode" in fs:
            raise ValueError(
                "es_dsl: score_mode needs a functions array"
            )
        factor = _fs_one_function(fs, dialect, id_field, "function_score")
    mb = fs.get("max_boost")
    if mb is not None:
        if not isinstance(mb, (int, float)) or isinstance(mb, bool):
            raise ValueError("es_dsl: max_boost must be numeric")
        factor = f"least(({factor}), cast({mb} AS double))"
    return f"({factor})"


def _boosted_field(x) -> tuple[str, float]:
    """ES caret syntax: ``"text^2"`` boosts one field's score by 2.
    Returns (column, weight)."""
    if not isinstance(x, str):
        raise ValueError(f"es_dsl: bad field entry {x!r}")
    name, caret, w = x.partition("^")
    if not caret:
        return _ident(name), 1.0
    try:
        weight = float(w)
    except ValueError:
        raise ValueError(f"es_dsl: bad field boost {x!r}")
    if weight <= 0:
        raise ValueError(f"es_dsl: field boost must be positive ({x!r})")
    return _ident(name), weight


def _parse_fulltext(q: dict):
    """Normalize a match / multi_match clause for the scored path:
    ([(field, weight)], analyzed terms, per-field combine fn,
    require_all). Weights carry the ES caret boosts (``"text^2"`` in
    multi_match fields) and the match clause's own ``boost``."""
    kind, spec = _one(q, "query clause")
    require_all = False
    if kind == "match":
        f, v = _one(spec, "match")
        boost = 1.0
        if isinstance(v, dict):
            bad = set(v) - {"query", "operator", "boost"}
            if bad:
                raise ValueError(
                    f"es_dsl: unsupported match keys {sorted(bad)}"
                )
            op = v.get("operator", "or")
            if op not in ("or", "and"):
                raise ValueError(f"es_dsl: bad match operator {op!r}")
            require_all = op == "and"
            boost = v.get("boost", 1.0)
            if (
                not isinstance(boost, (int, float))
                or isinstance(boost, bool) or boost <= 0
            ):
                raise ValueError("es_dsl: match boost must be positive")
            v = v["query"]
        fields = [(_ident(f), float(boost))]
        combine = "max"
    else:
        known = {"query", "fields", "type"}
        bad = set(spec) - known
        if bad:
            raise ValueError(f"es_dsl: unsupported multi_match keys {sorted(bad)}")
        v = spec["query"]
        fields = [_boosted_field(x) for x in spec["fields"]]
        if not fields:
            raise ValueError("es_dsl: multi_match wants >= 1 field")
        mtype = spec.get("type", "best_fields")
        if mtype not in ("best_fields", "most_fields"):
            raise ValueError(f"es_dsl: unsupported multi_match type {mtype!r}")
        combine = "max" if mtype == "best_fields" else "sum"
    terms = _analyze(v)
    if not terms:
        raise ValueError("es_dsl: match with an empty query string")
    return fields, terms, combine, require_all


def _scored_ctes(
    index: str, fields: list[tuple[str, float]], terms: list[str],
    prefix: str, dialect: str, id_field: str, require_all: bool,
) -> tuple[str, str]:
    """(BM25 CTE chain, per-field score UNION) for one full-text
    clause, with CTE names namespaced by ``prefix`` so two scored
    clauses (query + rescore_query) coexist in one statement. Field
    weights (caret boosts / match boost) scale each field's score
    BEFORE the per-doc combine, the Lucene order."""
    ctes = ",\n".join(
        _bm25_field_ctes(
            index, f, terms, f"{prefix}{i}", dialect, id_field,
            require_all=require_all,
        )
        for i, (f, _) in enumerate(fields)
    )
    union = "\n    UNION ALL ".join(
        f"SELECT _id, s{'' if w == 1.0 else f' * {w!r}'} AS s"
        f" FROM {prefix}{i}_bm"
        for i, (_, w) in enumerate(fields)
    )
    return ctes, union


def _compile_scored(
    index: str, body: dict, dialect: str, id_field: str,
    factor: str | None = None, fs_mode: str = "multiply",
    min_score: float | None = None,
) -> str:
    """Top-level `match` / `multi_match` with no explicit sort: BM25
    query context. `multi_match` combines per-field scores by its ES
    `type` — best_fields = max over fields (the default), most_fields
    = sum. Hits are docs scoring on >= 1 term; `_source`/`size`/`from`
    apply as usual; `_score` is always appended."""
    # an EMPTY sort list routes here (ES: [] = default _score order),
    # so tolerate the key; any non-empty sort took the filter-context
    # path before this function was reached
    extra = set(body) - {"query", "_source", "size", "from", "sort",
                         "highlight"}
    if extra:
        raise ValueError(
            f"es_dsl: scored match combines only with _source/size/from/"
            f"highlight (got {sorted(extra)})"
        )
    fields, terms, combine, require_all = _parse_fulltext(body["query"])
    ctes, union = _scored_ctes(
        index, fields, terms, "f", dialect, id_field, require_all
    )
    cols = _source_cols(body, "scored hits")
    size = int(body.get("size", 10))
    offset = int(body.get("from", 0))
    off = f" OFFSET {offset}" if offset else ""
    if "highlight" in body:
        if factor or min_score is not None:
            raise ValueError(
                "es_dsl: function_score with highlight is unsupported"
            )
        return _compile_scored_highlight(
            index, body, ctes, combine, union, terms, cols,
            size, off, dialect, id_field,
        )
    sc = "sc.s"
    if factor:
        sc = {
            "multiply": f"sc.s * {factor}",
            "sum": f"sc.s + {factor}",
            "replace": factor,
        }[fs_mode]
    score = f"round({sc}, 4) AS _score"
    # min_score filters on the FINAL (post-function) rounded score —
    # rendered in the WHERE so the predicate sits below the top-k sort
    msw = (
        f"\nWHERE round({sc}, 4) >= {min_score}"
        if min_score is not None else ""
    )
    if cols is None and "_source" in body:
        # _source: true — full source + _score via the join-back
        return f"""
WITH {ctes},
scored AS (
  SELECT _id, {combine}(s) AS s
  FROM ({union}) u
  GROUP BY _id
)
SELECT t.*, {score}
FROM scored sc JOIN {_ident(index)} t ON t.{id_field} = sc._id{msw}
ORDER BY _score DESC, t.{id_field} ASC
LIMIT {size}{off}
"""
    if cols:
        select = ", ".join(f"t.{_ident(c)}" for c in cols)
        return f"""
WITH {ctes},
scored AS (
  SELECT _id, {combine}(s) AS s
  FROM ({union}) u
  GROUP BY _id
)
SELECT {select}, {score}
FROM scored sc JOIN {_ident(index)} t ON t.{id_field} = sc._id{msw}
ORDER BY _score DESC, t.{id_field} ASC
LIMIT {size}{off}
"""
    if factor or min_score is not None:
        # the factor may read fields, so the id-only shape still joins
        return f"""
WITH {ctes},
scored AS (
  SELECT _id, {combine}(s) AS s
  FROM ({union}) u
  GROUP BY _id
)
SELECT t.{id_field} AS {id_field}, {score}
FROM scored sc JOIN {_ident(index)} t ON t.{id_field} = sc._id{msw}
ORDER BY _score DESC, {id_field} ASC
LIMIT {size}{off}
"""
    return f"""
WITH {ctes},
scored AS (
  SELECT _id, {combine}(s) AS s
  FROM ({union}) u
  GROUP BY _id
)
SELECT _id AS {id_field}, round(s, 4) AS _score
FROM scored
ORDER BY _score DESC, {id_field} ASC
LIMIT {size}{off}
"""


def _compile_scored_bool(
    index: str, body: dict, dialect: str, id_field: str,
    factor: str | None = None, fs_mode: str = "multiply",
    min_score: float | None = None,
) -> str:
    """The everyday ES search shape, scored: a top-level ``bool``
    whose ``must`` clauses are full-text (match / multi_match) and
    therefore SCORE, with ``filter`` / ``must_not`` gating membership
    (score-neutral, ES semantics) and optional full-text ``should``
    clauses adding score when they match. `_score` = sum of must
    scores + sum of matching should scores — the Lucene boolean
    scorer's sum.

    Shape: one BM25 CTE chain per full-text clause (namespaced m0../
    s0..), musts INNER-join on _id (a hit must match every must),
    shoulds LEFT-join (optional score), then ONE join-back to the
    source row where the filter predicates apply — filters prune
    HITS, never the corpus statistics (ES computes idf over the whole
    index, so a filtered search must not reweight terms; this is why
    the filters sit at the join-back, not inside the scoring scan).
    Everything after the per-field aggs is id-keyed joins over
    hit-sized relations."""
    q = body["query"]["bool"]
    known = {"must", "filter", "should", "must_not"}
    bad = set(q) - known
    if bad:
        raise ValueError(
            f"es_dsl: unsupported scored bool keys {sorted(bad)} "
            "(minimum_should_match is filter-context only)"
        )

    def listed(key: str) -> list[dict]:
        v = q.get(key, [])
        return v if isinstance(v, list) else [v]

    musts = listed("must")
    shoulds = listed("should")
    if not musts:
        raise ValueError(
            "es_dsl: scored bool needs >= 1 full-text must clause"
        )
    for c in musts + shoulds:
        kind, _ = _one(c, "bool clause")
        if kind not in ("match", "multi_match"):
            raise ValueError(
                "es_dsl: scored bool must/should clauses are full-text "
                f"(match/multi_match), got {kind!r} — put membership "
                "clauses under filter"
            )
    preds = [
        _query_expr(c, dialect, id_field) for c in listed("filter")
    ]
    for c in listed("must_not"):
        neg = _query_expr(c, dialect, id_field)
        preds.append(f"NOT coalesce({neg}, FALSE)")
    all_ctes, score_terms, joins = [], [], []
    for i, c in enumerate(musts):
        fields, terms, comb, req = _parse_fulltext(c)
        ctes, union = _scored_ctes(
            index, fields, terms, f"m{i}x", dialect, id_field, req
        )
        all_ctes.append(ctes)
        all_ctes.append(
            f"m{i}_s AS (SELECT _id, {comb}(s) AS s FROM ({union}) u"
            " GROUP BY _id)"
        )
        score_terms.append(f"m{i}_s.s")
        joins.append(
            f"JOIN m{i}_s ON m{i}_s._id = m0_s._id" if i else ""
        )
    for i, c in enumerate(shoulds):
        fields, terms, comb, req = _parse_fulltext(c)
        ctes, union = _scored_ctes(
            index, fields, terms, f"s{i}x", dialect, id_field, req
        )
        all_ctes.append(ctes)
        all_ctes.append(
            f"s{i}_s AS (SELECT _id, {comb}(s) AS s FROM ({union}) u"
            " GROUP BY _id)"
        )
        score_terms.append(f"coalesce(s{i}_s.s, 0)")
        joins.append(f"LEFT JOIN s{i}_s ON s{i}_s._id = m0_s._id")
    cols = _source_cols(body, "scored bool hits")
    if cols is None and "_source" in body:
        select = "t.*"
    elif not cols:
        select = f"t.{id_field} AS {id_field}"
    else:
        select = ", ".join(f"t.{_ident(c)}" for c in cols)
    size = int(body.get("size", 10))
    offset = int(body.get("from", 0))
    off = f" OFFSET {offset}" if offset else ""
    join_sql = "\n".join(j for j in joins if j)
    score = " + ".join(score_terms)
    ctes_sql = ",\n".join(all_ctes)
    # function_score composition: the factor expression reads the
    # joined-back row `t`, exactly like the single-clause scored path
    sc = "sc.s"
    if factor:
        sc = {
            "multiply": f"sc.s * {factor}",
            "sum": f"sc.s + {factor}",
            "replace": factor,
        }[fs_mode]
    if min_score is not None:
        preds.append(f"round({sc}, 4) >= {min_score}")
    where = f"\nWHERE {' AND '.join(preds)}" if preds else ""
    return f"""
WITH {ctes_sql},
scored AS (
  SELECT m0_s._id, {score} AS s
  FROM m0_s
{join_sql}
)
SELECT {select}, round({sc}, 4) AS _score
FROM scored sc JOIN {_ident(index)} t ON t.{id_field} = sc._id{where}
ORDER BY _score DESC, t.{id_field} ASC
LIMIT {size}{off}
"""


def _compile_rescore(
    index: str, body: dict, dialect: str, id_field: str,
) -> str:
    """ES query rescoring: re-rank the TOP window_size first-pass hits
    by a combination of the original score and a second query's score
    — the classic precision-pass idiom (cheap recall query first,
    expensive phrase/proximity query over the window only).

    Plan shape is the scale argument: the first pass is the standard
    BM25 TakeOrdered (window_size rows survive), the rescore query's
    relation LEFT JOINs onto those window_size rows, and the final
    sort is over window_size rows — the rescore cost never touches
    the full corpus ordering. score_mode total (w1*s1 + w2*s2, hits
    missing from the rescore query contribute 0) or multiply."""
    rs = body["rescore"]
    bad = set(rs) - {"window_size", "query"}
    if bad:
        raise ValueError(f"es_dsl: unsupported rescore keys {sorted(bad)}")
    window = rs.get("window_size", 10)
    if not isinstance(window, int) or isinstance(window, bool) or window < 1:
        raise ValueError("es_dsl: rescore window_size must be an int >= 1")
    rq = rs.get("query")
    if not isinstance(rq, dict):
        raise ValueError("es_dsl: rescore wants a query object")
    bad = set(rq) - {"rescore_query", "query_weight",
                     "rescore_query_weight", "score_mode"}
    if bad:
        raise ValueError(
            f"es_dsl: unsupported rescore query keys {sorted(bad)}"
        )
    mode = rq.get("score_mode", "total")
    if mode not in ("total", "multiply"):
        raise ValueError(
            f"es_dsl: unsupported rescore score_mode {mode!r} "
            "(total/multiply)"
        )
    w1 = rq.get("query_weight", 1)
    w2 = rq.get("rescore_query_weight", 1)
    for w, what in ((w1, "query_weight"), (w2, "rescore_query_weight")):
        if not isinstance(w, (int, float)) or isinstance(w, bool):
            raise ValueError(f"es_dsl: rescore {what} must be numeric")
    f_fields, f_terms, f_comb, f_all = _parse_fulltext(body["query"])
    r_fields, r_terms, r_comb, r_all = _parse_fulltext(
        rq.get("rescore_query") or {}
    )
    f_ctes, f_union = _scored_ctes(
        index, f_fields, f_terms, "f", dialect, id_field, f_all
    )
    r_ctes, r_union = _scored_ctes(
        index, r_fields, r_terms, "r", dialect, id_field, r_all
    )
    cols = _source_cols(body, "rescored hits")
    if not cols:
        select = f"t.{id_field} AS {id_field}"
    else:
        select = ", ".join(f"t.{_ident(c)}" for c in cols)
    size = int(body.get("size", 10))
    if mode == "total":
        combined = f"{w1} * fp.s1 + {w2} * coalesce(rs.s2, 0)"
    else:
        # ES multiply mode leaves hits absent from the rescore query
        # unmodified (factor 1), exactly like function_score filters
        combined = f"{w1} * fp.s1 * coalesce({w2} * rs.s2, 1)"
    return f"""
WITH {f_ctes},
{r_ctes},
first_pass AS (
  SELECT _id, {f_comb}(s) AS s1
  FROM ({f_union}) u
  GROUP BY _id
  ORDER BY s1 DESC, _id ASC
  LIMIT {window}
),
rescores AS (
  SELECT _id, {r_comb}(s) AS s2
  FROM ({r_union}) u
  GROUP BY _id
)
SELECT {select}, round({combined}, 4) AS _score
FROM first_pass fp
LEFT JOIN rescores rs ON rs._id = fp._id
JOIN {_ident(index)} t ON t.{id_field} = fp._id
ORDER BY _score DESC, t.{id_field} ASC
LIMIT {size}
"""


# snippet geometry — pinned equal to the standalone highlight kernel
# (operators/search.py HIGHLIGHT_PRE/HIGHLIGHT_SUF) by unit test, so a
# `highlight` key inside a _search body and the standalone operator
# return byte-identical snippets for the same hit
_HL_PRE = 20
_HL_SUF = 40


def _compile_scored_highlight(
    index: str, body: dict, ctes: str, combine: str, union: str,
    terms: list[str], cols, size: int, off: str, dialect: str,
    id_field: str,
) -> str:
    """`highlight` inside a scored `_search` body: the BM25 top-k
    relation feeds the same first-occurrence snippet geometry as the
    standalone highlight kernel (search.py _HL_PRE/_HL_SUF, pinned by
    test) — per requested field, the query term with the smallest
    case-insensitive position wins, its original-casing slice wrapped
    in <em>…</em>. One `highlight_<field>` column per requested field;
    NULL when no query term occurs in that field (ES omits the field
    from the hit's highlight object).

    Scale shape: snippet extraction runs on the top-k relation ONLY —
    the ranking CTEs are the shared BM25 body, the rank LIMIT keeps k
    rows, and every highlight CTE is a cross join of those k rows with
    the constant term list. O(top-k), never O(corpus), exactly like
    ES."""
    hl = body["highlight"]
    bad = set(hl) - {"fields"}
    if bad:
        raise ValueError(f"es_dsl: unsupported highlight keys {sorted(bad)}")
    hfields = hl.get("fields")
    if not isinstance(hfields, dict) or not hfields:
        raise ValueError(
            "es_dsl: highlight.fields must be a non-empty map of "
            "field -> options"
        )
    for hf, opts in hfields.items():
        if opts not in ({}, None):
            raise ValueError(
                f"es_dsl: highlight field options are unsupported "
                f"(got {sorted(opts)} for {hf!r}; defaults only)"
            )
    if not cols:
        raise ValueError(
            "es_dsl: highlight requires an explicit _source field list"
        )
    hnames = [_ident(hf) for hf in hfields]
    term_lits = ", ".join(_lit(t, dialect) for t in terms)
    qterms = (
        f"SELECT explode(array({term_lits})) AS term"
        if dialect == "spark"
        else f"SELECT unnest([{term_lits}]) AS term"
    )
    top_cols = [f"t.{id_field} AS _id"]
    top_cols += [f"t.{_ident(c)}" for c in cols]
    top_cols += [f"t.{hf} AS _hl{i}" for i, hf in enumerate(hnames)]
    hl_ctes, joins, out_hl = [], [], []
    for i, hf in enumerate(hnames):
        # occurrence search is case-INSENSITIVE (the analyzer lowercased
        # the match tokens, so a doc can score on 'Alpha' — ES parity);
        # the snippet slices the ORIGINAL field so the hit keeps its
        # casing. lower() is length-preserving for the ASCII/Latin bulk,
        # so positions transfer; locale expansions (Turkish dotted I)
        # can shift a highlight by a char — documented, not defended
        pos = (f"locate(term, lower(_hl{i}))" if dialect == "spark"
               else f"strpos(lower(_hl{i}), term)")
        snip = f"""concat(
      substring(_hl{i}, greatest(1, pos - {_HL_PRE}),
                pos - greatest(1, pos - {_HL_PRE})),
      '<em>', substring(_hl{i}, pos, length(term)), '</em>',
      substring(_hl{i}, pos + length(term), {_HL_SUF}))"""
        hl_ctes.append(f"""hl{i} AS (
  SELECT _id, term, cast({pos} AS INT) AS pos, _hl{i}
  FROM topk CROSS JOIN qterms
),
hl{i}_best AS (
  SELECT _id, {snip} AS snip,
         row_number() OVER (PARTITION BY _id ORDER BY pos ASC, term ASC)
           AS rn
  FROM hl{i} WHERE pos > 0
)""")
        joins.append(f"LEFT JOIN hl{i}_best h{i} ON h{i}._id = k._id "
                     f"AND h{i}.rn = 1")
        out_hl.append(f"h{i}.snip AS highlight_{hf}")
    select = ", ".join(
        [f"k.{_ident(c)}" for c in cols] + ["k._score"] + out_hl
    )
    top_select = ", ".join(top_cols)
    hl_cte_sql = ",\n".join(hl_ctes)
    join_sql = "\n".join(joins)
    return f"""
WITH {ctes},
scored AS (
  SELECT _id, {combine}(s) AS s
  FROM ({union}) u
  GROUP BY _id
),
topk AS (
  SELECT {top_select}, round(sc.s, 4) AS _score
  FROM scored sc JOIN {_ident(index)} t ON t.{id_field} = sc._id
  ORDER BY _score DESC, t.{id_field} ASC
  LIMIT {size}{off}
),
qterms AS ({qterms}),
{hl_cte_sql}
SELECT {select}
FROM topk k
{join_sql}
ORDER BY k._score DESC, k._id ASC
"""


def _compile_pinned(index: str, body: dict, dialect: str,
                    id_field: str) -> str:
    """ES `pinned` query: promoted ids first, in their given order,
    then the organic hits (minus the pinned ones) by score — the
    commerce "sponsored results" idiom. Pinned rows take synthetic
    scores 1e9 - position (ES uses its own huge constant; documented),
    so one `_score DESC` order serves both tiers. The id list is a
    compile-time CASE — no extra relation; the organic query compiles
    as a normal scored search inside a CTE. Requires an explicit
    `_source` list containing the id field (the union needs the id
    column on both sides)."""
    spec = body["query"]["pinned"]
    bad = set(spec) - {"ids", "organic"}
    if bad:
        raise ValueError(f"es_dsl: unsupported pinned keys {sorted(bad)}")
    ids = spec.get("ids")
    if not isinstance(ids, list) or not ids or len(ids) > 100:
        raise ValueError(
            "es_dsl: pinned wants 1..100 ids"
        )
    organic = spec.get("organic")
    okind, _ = _one(organic or {}, "pinned organic")
    if okind not in ("match", "multi_match"):
        raise ValueError(
            "es_dsl: pinned organic must be a match/multi_match query"
        )
    cols = _source_cols(body, "pinned hits")
    if not cols or id_field not in cols:
        raise ValueError(
            "es_dsl: pinned requires an explicit _source list "
            f"containing the id field {id_field!r}"
        )
    if set(body) - {"query", "_source", "size", "from"}:
        raise ValueError(
            "es_dsl: pinned combines only with _source/size/from"
        )
    if "from" in body:
        raise ValueError("es_dsl: pinned with from is unsupported")
    size = int(body.get("size", 10))
    organic_sql = compile_search(
        index, {**{k: v for k, v in body.items() if k != "query"},
                "query": organic},
        dialect, id_field,
    )
    in_list = ", ".join(_lit(i, dialect) for i in ids)
    whens = " ".join(
        f"WHEN {_lit(i, dialect)} THEN {pos}" for pos, i in enumerate(ids)
    )
    sel = ", ".join(_ident(c) for c in cols)
    return f"""
WITH org AS (
{organic_sql}
)
SELECT {sel}, cast(1000000000 - CASE {id_field} {whens} END AS DOUBLE)
       AS _score
FROM {_ident(index)}
WHERE {id_field} IN ({in_list})
UNION ALL
SELECT {sel}, _score FROM org WHERE {id_field} NOT IN ({in_list})
ORDER BY _score DESC, {id_field} ASC
LIMIT {size}
"""


def _compile_mlt(index: str, body: dict, dialect: str,
                 id_field: str) -> str:
    """ES `more_like_this`, fully relational — no driver round-trip to
    pick query terms: the liked document's tokens join the corpus df
    relation, the `max_query_terms` rarest ones (idf-ranked, after
    `min_term_freq`/`min_doc_freq` gates) become the query-term
    relation IN-PLAN, and hits score by the sum of matched-term idf
    ("shared rare terms"), coordinated by `minimum_should_match`
    (int or "N%" of the selected terms). ES's own scoring is the BM25
    of an internally-built term query — idf-sum keeps the same
    rarity-driven ranking without tf normalization; documented
    simplification, not a silent one.

    Determinism: idf quantizes to DECIMAL(18, 9) (lossless at 9 dp for
    ln-scale values) so per-doc sums are order-independent; scores
    round to 4 dp before the rank; id tiebreaks everywhere. Scale
    shape: like-doc tokens are one pushdown point lookup; df is a
    vocabulary-sized agg; qterms is <= max_query_terms rows (a
    broadcast); scoring is one token-stream join + groupBy."""
    q = body["query"]["more_like_this"]
    known = {"fields", "like", "max_query_terms", "min_term_freq",
             "min_doc_freq", "minimum_should_match"}
    bad = set(q) - known
    if bad:
        raise ValueError(
            f"es_dsl: unsupported more_like_this keys {sorted(bad)}"
        )
    extra = set(body) - {"query", "_source", "size", "from"}
    if extra:
        raise ValueError(
            "es_dsl: more_like_this combines only with _source/size/"
            f"from (got {sorted(extra)}) — scored context, no sorts"
        )
    fields = q.get("fields")
    if not isinstance(fields, list) or len(fields) != 1:
        raise ValueError(
            "es_dsl: more_like_this wants exactly one field "
            "(multi-field MLT is unsupported)"
        )
    f = _ident(fields[0])
    like = q.get("like")
    if isinstance(like, list):
        if len(like) != 1:
            raise ValueError(
                "es_dsl: more_like_this wants exactly one like item"
            )
        like = like[0]
    max_terms = int(q.get("max_query_terms", 25))
    min_tf = int(q.get("min_term_freq", 2))
    min_df = int(q.get("min_doc_freq", 5))
    if min(max_terms, min_tf, min_df) < 1:
        raise ValueError("es_dsl: more_like_this knobs must be >= 1")
    msm = q.get("minimum_should_match", "30%")
    te = _tokens_expr(f, dialect)
    if dialect == "spark":
        stream = f"SELECT {id_field} AS _id, explode({te}) AS w"
    else:
        stream = f"SELECT {id_field} AS _id, unnest({te}) AS w"
    exclude_self = ""
    if isinstance(like, dict):
        if set(like) != {"_id"}:
            raise ValueError(
                "es_dsl: more_like_this like wants free text or {_id}"
            )
        like_id = _lit(like["_id"], dialect)
        like_tf = f"""like_tf AS (
  SELECT w, count(*) AS tf
  FROM ({stream} FROM {_ident(index)} WHERE {id_field} = {like_id}) lt
  GROUP BY w
)"""
        exclude_self = f"\n  AND sc._id != {like_id}"
    elif isinstance(like, str) and like.strip():
        toks = _analyze(like)
        arr = ", ".join(_lit(t, dialect) for t in toks)
        raw = (
            f"SELECT explode(array({arr})) AS w" if dialect == "spark"
            else f"SELECT unnest([{arr}]) AS w"
        )
        like_tf = f"""like_raw AS ({raw}),
like_tf AS (SELECT w, count(*) AS tf FROM like_raw GROUP BY w)"""
    else:
        raise ValueError(
            "es_dsl: more_like_this like wants free text or {_id}"
        )
    # minimum_should_match: int, or "N%" of the SELECTED term count —
    # resolved in-plan against count(*) of qterms (ES rounds down)
    if isinstance(msm, str):
        mm = re.fullmatch(r"(\d+)%", msm.strip())
        if not mm:
            raise ValueError(
                f"es_dsl: bad minimum_should_match {msm!r} (int or 'N%')"
            )
        msm_cond = (
            f"matched >= floor(qn.n_terms * {int(mm.group(1))} / 100.0)"
        )
    elif isinstance(msm, int) and msm >= 0:
        msm_cond = f"matched >= {msm}"
    else:
        raise ValueError(
            f"es_dsl: bad minimum_should_match {msm!r} (int or 'N%')"
        )
    cols = _source_cols(body, "more_like_this hits")
    size = int(body.get("size", 10))
    offset = int(body.get("from", 0))
    off = f" OFFSET {offset}" if offset else ""
    if cols:
        select = ", ".join(f"t.{_ident(c)}" for c in cols)
        hit = (f"JOIN {_ident(index)} t ON t.{id_field} = sc._id")
    else:
        select = f"sc._id AS {id_field}"
        hit = ""
    return f"""
WITH corpus AS (
  {stream} FROM {_ident(index)}
),
df AS (
  SELECT w, count(DISTINCT _id) AS df FROM corpus GROUP BY w
),
n_docs AS (SELECT count(*) AS n FROM {_ident(index)}),
{like_tf},
qterms AS (
  SELECT w,
         cast(cast(ln(1 + (n - df + 0.5) / (df + 0.5))
              AS DECIMAL(18, 9)) AS DOUBLE) AS idf
  FROM like_tf JOIN df USING (w) CROSS JOIN n_docs
  WHERE tf >= {min_tf} AND df >= {min_df}
  ORDER BY idf DESC, w ASC
  LIMIT {max_terms}
),
qn AS (SELECT count(*) AS n_terms FROM qterms),
scored AS (
  SELECT _id,
         cast(sum(cast(idf AS DECIMAL(18, 9))) AS DOUBLE) AS s,
         count(DISTINCT w) AS matched
  FROM (SELECT DISTINCT _id, w FROM corpus) c
  JOIN qterms USING (w)
  GROUP BY _id
)
SELECT {select}, round(sc.s, 4) AS _score
FROM scored sc CROSS JOIN qn {hit}
WHERE {msm_cond}{exclude_self}
ORDER BY _score DESC, {'t.' + id_field if cols else 'sc._id'} ASC
LIMIT {size}{off}
"""


def _compile_feature_query(
    index: str, body: dict, qkind: str, dialect: str, id_field: str,
) -> str:
    """rank_feature / distance_feature as top-level scored queries —
    ES's static-signal ranking primitives (popularity, freshness,
    proximity) when no text relevance is in play.

    rank_feature scores boost * fn(field) with the ES function menu:
    saturation x/(x+pivot) (pivot REQUIRED here — ES's default pivot
    is a corpus statistic, which would make the query's meaning change
    under ingestion; an explicit pivot is the deterministic subset),
    log ln(scaling_factor + x), sigmoid x^e/(x^e + pivot^e), linear x.
    distance_feature scores boost * pivot/(pivot + |field - origin|)
    over numbers or dates (duration pivot, explicit origin — never
    "now"). Both are one scan + TakeOrdered: the score is row-local
    arithmetic, hits are rows where the feature exists (ES semantics:
    documents without the feature don't match), and the 6-dp round +
    id tiebreak keep the top-k permutation total and cross-engine
    stable. Scale shape: no shuffle at all below the final top-k."""
    q = body["query"][qkind]
    extra = set(body) - {"query", "_source", "size", "from"}
    if extra:
        raise ValueError(
            f"es_dsl: {qkind} combines only with _source/size/from "
            f"(got {sorted(extra)})"
        )
    if not isinstance(q, dict) or "field" not in q:
        raise ValueError(f"es_dsl: {qkind} requires a field")
    f = _ident(q["field"])
    boost = q.get("boost", 1.0)
    if not isinstance(boost, (int, float)) or isinstance(boost, bool):
        raise ValueError(f"es_dsl: {qkind} boost must be numeric")
    if qkind == "rank_feature":
        bad = set(q) - {"field", "boost", "saturation", "log", "sigmoid",
                        "linear"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported rank_feature keys {sorted(bad)}"
            )
        fns = [k for k in ("saturation", "log", "sigmoid", "linear")
               if k in q]
        if len(fns) != 1:
            raise ValueError(
                "es_dsl: rank_feature wants exactly one of saturation/"
                "log/sigmoid/linear (the ES default pivot is a corpus "
                "statistic — pass saturation with an explicit pivot)"
            )
        kind = fns[0]
        spec = q[kind]
        if not isinstance(spec, dict):
            raise ValueError(f"es_dsl: rank_feature {kind} wants an object")
        x = f"cast({f} AS double)"
        if kind == "saturation":
            if set(spec) != {"pivot"}:
                raise ValueError(
                    "es_dsl: rank_feature saturation requires an explicit "
                    "pivot (corpus-statistic defaults are unsupported)"
                )
            pivot = _num(spec["pivot"], "saturation pivot", positive=True)
            expr = f"{x} / ({x} + {pivot!r})"
        elif kind == "log":
            if set(spec) != {"scaling_factor"}:
                raise ValueError(
                    "es_dsl: rank_feature log wants {scaling_factor}"
                )
            sf = _num(spec["scaling_factor"], "log scaling_factor",
                      positive=True)
            expr = f"ln({sf!r} + {x})"
        elif kind == "sigmoid":
            if set(spec) != {"pivot", "exponent"}:
                raise ValueError(
                    "es_dsl: rank_feature sigmoid wants {pivot, exponent}"
                )
            pivot = _num(spec["pivot"], "sigmoid pivot", positive=True)
            e = _num(spec["exponent"], "sigmoid exponent", positive=True)
            expr = (
                f"power({x}, {e!r}) / (power({x}, {e!r})"
                f" + power({pivot!r}, {e!r}))"
            )
        else:
            if spec:
                raise ValueError("es_dsl: rank_feature linear takes no keys")
            expr = x
    else:
        bad = set(q) - {"field", "boost", "origin", "pivot"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported distance_feature keys {sorted(bad)}"
            )
        missing = {"origin", "pivot"} - set(q)
        if missing:
            raise ValueError(
                f"es_dsl: distance_feature requires {sorted(missing)}"
            )
        origin = q["origin"]
        if isinstance(origin, str):
            if not _ORIGIN_TS.fullmatch(origin):
                raise ValueError(
                    f"es_dsl: bad distance_feature origin {origin!r} "
                    "(ISO date/datetime; 'now' is unsupported)"
                )
            pivot = float(
                _duration_secs(q["pivot"], "distance_feature pivot")
            )
            # microsecond-exact epochs cast to double: Spark's
            # unix_timestamp truncates to seconds while DuckDB's epoch
            # keeps fractional seconds — a 0.04 s disagreement flips
            # 6-dp score boundaries. unix_micros/epoch_us agree exactly,
            # and the double cast keeps Spark's decimal-literal
            # arithmetic from emitting a DECIMAL score.
            x, o = _epoch_secs(f, origin, dialect)
        else:
            o = repr(float(_num(origin, "distance_feature origin")))
            pivot = _num(q["pivot"], "distance_feature pivot",
                         positive=True)
            x = f"cast({f} AS double)"
        expr = f"{pivot!r} / ({pivot!r} + abs({x} - {o}))"
    score = f"round({boost} * ({expr}), 6)"
    cols = _source_cols(body, f"{qkind} hits")
    if cols is None and "_source" in body:
        select = "*"  # _source: true — full source + _score
    elif not cols:
        select = f"{id_field}"
    else:
        select = ", ".join(_ident(c) for c in cols)
    tiebreak = id_field
    size = int(body.get("size", 10))
    offset = int(body.get("from", 0))
    off = f" OFFSET {offset}" if offset else ""
    return f"""
SELECT {select}, {score} AS _score
FROM {_ident(index)}
WHERE {f} IS NOT NULL
ORDER BY _score DESC, {tiebreak} ASC
LIMIT {size}{off}
"""


def _num(v, what: str, positive: bool = False) -> float:
    if not isinstance(v, (int, float)) or isinstance(v, bool) or (
        positive and v <= 0
    ):
        kind = "a positive number" if positive else "a number"
        raise ValueError(f"es_dsl: {what} must be {kind}")
    return float(v)


def _compile_combined_fields(
    index: str, body: dict, dialect: str, id_field: str,
) -> str:
    """combined_fields: term-centric BM25 over N text fields merged
    into ONE synthetic field — per-term frequencies and field lengths
    SUM across fields before scoring (the ES semantics that
    distinguishes it from multi_match best/most_fields, which score
    per-field then combine). The merge is exactly a whitespace
    concatenation of the analyzed fields, so the compiler projects
    concat_ws(' ', fields...) as a one-CTE derived column and reuses
    the standard BM25 scored path over it: same plan shape as a plain
    match (scan -> token agg -> top-k), one extra row-local projection,
    zero extra shuffles."""
    spec = body["query"]["combined_fields"]
    bad = set(spec) - {"query", "fields", "operator"}
    if bad:
        raise ValueError(
            f"es_dsl: unsupported combined_fields keys {sorted(bad)}"
        )
    missing = {"query", "fields"} - set(spec)
    if missing:
        raise ValueError(
            f"es_dsl: combined_fields requires {sorted(missing)}"
        )
    fields = spec["fields"]
    if not isinstance(fields, list) or not fields:
        raise ValueError("es_dsl: combined_fields wants >= 1 field")
    cols = body.get("_source")
    if not isinstance(cols, list) or not cols:
        raise ValueError(
            "es_dsl: combined_fields requires an explicit _source list "
            "(the synthetic merged column must not leak into hits)"
        )
    op = spec.get("operator", "or")
    if op not in ("or", "and"):
        raise ValueError(f"es_dsl: bad combined_fields operator {op!r}")
    merged = ", ".join(f"coalesce({_ident(f)}, '')" for f in fields)
    cte = (
        f"{_ident(index)}_cf AS (\n"
        f"  SELECT *, concat_ws(' ', {merged}) AS _combined\n"
        f"  FROM {_ident(index)}\n)"
    )
    inner_body = {
        "query": {"match": {"_combined": {
            "query": spec["query"], "operator": op,
        }}},
        "_source": cols,
        **{k: body[k] for k in ("size", "from") if k in body},
    }
    inner = _compile_scored(
        f"{index}_cf", inner_body, dialect, id_field
    ).lstrip()
    assert inner.startswith("WITH ")
    return f"WITH {cte},\n{inner[len('WITH '):]}"


def compile_suggest(index: str, body: dict, dialect: str,
                    id_field: str = "doc_id") -> str:
    """The ES `suggest` API (inside a `_search` body), two kinds:

    - `term`: spell correction — for each analyzed input token, the
      closest vocabulary words by (edit distance ASC, corpus doc-freq
      DESC, word ASC), within `max_edits`; `suggest_mode: missing`
      (the ES default) suggests only for tokens ABSENT from the
      vocabulary, `always` for all. Relational shape: the vocabulary
      is one distinct-token aggregation; candidates are vocabulary ×
      input-token rows (|V|·|q| — linear in vocabulary size; the
      SymSpell deletion-neighborhood operator in operators/search.py
      is the indexed swap-in at scale), ranked per token.
    - `completion`: search-box autocomplete approximated over the
      SAME analysis model — top-`size` vocabulary words with the
      given `prefix` by doc frequency (ES's completion type needs a
      dedicated FST mapping; the vocabulary twin is the honest
      schema-driven equivalent, documented).

    One suggester per body (ES allows several; one relation per body
    is this compiler's contract). Output: (input_token, option, score
    columns) rows, totally ordered."""
    if dialect not in ("spark", "duck"):
        raise ValueError(f"es_dsl: unknown dialect {dialect!r}")
    sug = body["suggest"]
    if set(body) - {"suggest", "size"} or body.get("size", 0) != 0:
        raise ValueError(
            "es_dsl: suggest bodies must use the size: 0 idiom and "
            "carry nothing else (one relation per body)"
        )
    name, spec = _one(sug, "suggest")
    _ident(name)
    if "term" in spec:
        bad = set(spec) - {"text", "term"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported term-suggest keys {sorted(bad)}"
            )
        t = spec["term"]
        tbad = set(t) - {"field", "size", "max_edits", "suggest_mode",
                         "min_doc_freq"}
        if tbad:
            raise ValueError(
                f"es_dsl: unsupported term suggester keys {sorted(tbad)}"
            )
        f = _ident(t["field"])
        size = int(t.get("size", 5))
        max_edits = int(t.get("max_edits", 2))
        if not 1 <= max_edits <= 2:
            raise ValueError(
                "es_dsl: term suggester max_edits must be 1 or 2 "
                "(the ES contract)"
            )
        min_df = int(t.get("min_doc_freq", 1))
        mode = t.get("suggest_mode", "missing")
        if mode not in ("missing", "always"):
            raise ValueError(
                f"es_dsl: bad suggest_mode {mode!r} (missing/always)"
            )
        toks = _analyze(spec.get("text") or "")
        if not toks:
            raise ValueError("es_dsl: term suggester wants a text string")
        arr = ", ".join(_lit(x, dialect) for x in dict.fromkeys(toks))
        inputs = (
            f"SELECT explode(array({arr})) AS tok"
            if dialect == "spark"
            else f"SELECT unnest([{arr}]) AS tok"
        )
        te = _tokens_expr(f, dialect)
        distinct_w = (
            f"explode(array_distinct({te})) AS w" if dialect == "spark"
            else f"unnest(list_distinct({te})) AS w"
        )
        missing_filter = (
            "\n  WHERE tok NOT IN (SELECT w FROM vocab)"
            if mode == "missing" else ""
        )
        return f"""
WITH vocab AS (
  SELECT w, count(*) AS freq
  FROM (SELECT {distinct_w} FROM {_ident(index)})
  GROUP BY w
  HAVING count(*) >= {min_df}
),
inputs AS (
  SELECT tok FROM ({inputs}){missing_filter}
),
cands AS (
  SELECT i.tok AS input_token, v.w AS option, v.freq,
         levenshtein(i.tok, v.w) AS dist
  FROM inputs i CROSS JOIN vocab v
  WHERE levenshtein(i.tok, v.w) <= {max_edits} AND i.tok != v.w
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY input_token
    ORDER BY dist ASC, freq DESC, option ASC) AS rn
  FROM cands
)
SELECT input_token, option, dist, freq
FROM ranked WHERE rn <= {size}
ORDER BY input_token ASC, dist ASC, freq DESC, option ASC
"""
    if "phrase" in spec:
        # "did you mean": whole-query corrections. Per input position,
        # the top candidate words by (edit distance, corpus freq) —
        # including the token itself at distance 0 when in-vocabulary —
        # cross-joined across positions (bounded: candidates^positions,
        # both capped) and ranked by sum(ln freq) - sum(edits): the
        # unigram-LM-with-edit-penalty score, the honest deterministic
        # stand-in for ES's smoothed bigram LM (whose smoothing is a
        # configurable approximation to begin with). Scale shape: the
        # vocabulary agg dominates; the phrase lattice is a constant-
        # size cross join of <= 5-row relations.
        bad = set(spec) - {"text", "phrase"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported phrase-suggest keys {sorted(bad)}"
            )
        p = spec["phrase"]
        pbad = set(p) - {"field", "size", "max_edits",
                         "candidates_per_term"}
        if pbad:
            raise ValueError(
                f"es_dsl: unsupported phrase suggester keys {sorted(pbad)}"
            )
        f = _ident(p["field"])
        size = int(p.get("size", 3))
        max_edits = int(p.get("max_edits", 2))
        if not 1 <= max_edits <= 2:
            raise ValueError(
                "es_dsl: phrase suggester max_edits must be 1 or 2"
            )
        cpt = int(p.get("candidates_per_term", 3))
        if not 1 <= cpt <= 5:
            raise ValueError(
                "es_dsl: candidates_per_term must be in [1, 5]"
            )
        toks = _analyze(spec.get("text") or "")
        if not 1 <= len(toks) <= 4:
            raise ValueError(
                "es_dsl: phrase suggester wants 1-4 analyzed tokens "
                "(the lattice is candidates^positions)"
            )
        te = _tokens_expr(f, dialect)
        distinct_w = (
            f"explode(array_distinct({te})) AS w" if dialect == "spark"
            else f"unnest(list_distinct({te})) AS w"
        )
        pos_ctes, froms = [], []
        for i, tok in enumerate(toks):
            lit = _lit(tok, dialect)
            pos_ctes.append(f"""c{i} AS (
  SELECT w, freq, dist FROM (
    SELECT w, freq, levenshtein({lit}, w) AS dist,
           row_number() OVER (
             ORDER BY levenshtein({lit}, w) ASC, freq DESC, w ASC
           ) AS rn
    FROM vocab
    WHERE levenshtein({lit}, w) <= {max_edits}
  ) r WHERE rn <= {cpt}
)""")
            froms.append(f"c{i}")
        phrase = (
            "concat_ws(' ', "
            + ", ".join(f"c{i}.w" for i in range(len(toks)))
            + ")"
        )
        score = " + ".join(
            f"ln(c{i}.freq) - c{i}.dist" for i in range(len(toks))
        )
        edits = " + ".join(f"c{i}.dist" for i in range(len(toks)))
        return f"""
WITH vocab AS (
  SELECT w, count(*) AS freq
  FROM (SELECT {distinct_w} FROM {_ident(index)})
  GROUP BY w
),
{','.join(pos_ctes)}
SELECT {phrase} AS option,
       round({score}, 4) AS score,
       {edits} AS total_edits
FROM {' CROSS JOIN '.join(froms)}
ORDER BY score DESC, option ASC
LIMIT {size}
"""
    if "completion" in spec:
        bad = set(spec) - {"prefix", "completion"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported completion-suggest keys "
                f"{sorted(bad)}"
            )
        c = spec["completion"]
        cbad = set(c) - {"field", "size"}
        if cbad:
            raise ValueError(
                f"es_dsl: unsupported completion suggester keys "
                f"{sorted(cbad)}"
            )
        f = _ident(c["field"])
        size = int(c.get("size", 5))
        prefix = spec.get("prefix")
        if not isinstance(prefix, str) or not prefix.strip():
            raise ValueError(
                "es_dsl: completion suggester wants a prefix string"
            )
        pat = f"{_like_escape(prefix.strip().lower())}%"
        te = _tokens_expr(f, dialect)
        distinct_w = (
            f"explode(array_distinct({te})) AS w" if dialect == "spark"
            else f"unnest(list_distinct({te})) AS w"
        )
        return f"""
SELECT w AS option, count(*) AS freq
FROM (SELECT {distinct_w} FROM {_ident(index)})
WHERE w LIKE '{pat}' ESCAPE '!'
GROUP BY w
ORDER BY freq DESC, option ASC
LIMIT {size}
"""
    raise ValueError(
        "es_dsl: unsupported suggester (term/phrase/completion only)"
    )


# --- search compilation ------------------------------------------------------


def _source_cols(body: dict, what: str):
    """Normalize the ES `_source` key: absent/true = full source (all
    columns), false = no source (id only), list of fields = projection;
    anything else raises. Returning False is the caller's signal for
    the id-only shape."""
    cols = body.get("_source")
    if cols is None or cols is True:
        return None
    if cols is False:
        return False
    if isinstance(cols, list) and cols and all(
        isinstance(c, str) for c in cols
    ):
        return cols
    raise ValueError(
        f"es_dsl: _source for {what} must be a boolean or a non-empty "
        f"list of field names (got {cols!r})"
    )


def _runtime_mappings_cte(index: str, rm: dict, dialect: str) -> str:
    """ES runtime fields (`runtime_mappings`): each field is an
    `emit(<script>)` over doc values, compiled through the module's
    Painless-lite grammar with `doc['field'].value` refs — the Kibana
    runtime-field idiom. Rendered as ONE projection CTE the rest of
    the statement selects from, so runtime fields work everywhere a
    mapped field does (query, sort, aggs, _source) and Catalyst still
    pushes filters on REAL columns below the projection."""
    if not isinstance(rm, dict) or not rm:
        raise ValueError(
            "es_dsl: runtime_mappings must be a non-empty object"
        )
    cols = []
    for name, spec in rm.items():
        bad = set(spec) - {"type", "script"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported runtime field keys {sorted(bad)}"
            )
        rtype = spec.get("type")
        casts = {"long": "BIGINT", "double": "DOUBLE",
                 "boolean": "BOOLEAN"}
        if rtype not in casts:
            raise ValueError(
                f"es_dsl: unsupported runtime field type {rtype!r} "
                "(long/double/boolean — the script grammar is "
                "numeric/boolean)"
            )
        src = spec.get("script")
        src = src.get("source") if isinstance(src, dict) else src
        m = re.fullmatch(r"\s*emit\((.*)\)\s*", str(src or ""), re.S)
        if not m:
            raise ValueError(
                "es_dsl: runtime field scripts must be emit(<expr>) "
                f"(got {src!r})"
            )
        expr = _compile_script(
            m.group(1), {}, f"runtime field {name}", allow_doc_fields=True
        )
        cols.append(f"cast({expr} AS {casts[rtype]}) AS {_ident(name)}")
    return (
        f"{_ident(index)}_rt AS (\n"
        f"  SELECT *, {', '.join(cols)}\n"
        f"  FROM {_ident(index)}\n)"
    )


def compile_search(
    index: str, body: dict, dialect: str, id_field: str = "doc_id",
    relations: dict | None = None,
) -> str:
    """Compile a `_search` body (query context + _source/sort/size/
    from) to one SQL statement over table ``index``."""
    if dialect not in ("spark", "duck"):
        raise ValueError(f"es_dsl: unknown dialect {dialect!r}")
    if "script_fields" in body:
        # the older per-hit computed-field API: each entry is a bare
        # Painless-lite expression (no emit() wrapper) — normalized
        # into runtime_mappings (same projection CTE), with the field
        # auto-appended to an explicit _source list (ES always returns
        # script_fields alongside the source). Numeric expressions
        # only — boolean/string derivations use runtime_mappings with
        # an explicit type.
        sf = body["script_fields"]
        if not isinstance(sf, dict) or not sf:
            raise ValueError(
                "es_dsl: script_fields must be a non-empty object"
            )
        rm = dict(body.get("runtime_mappings", {}))
        for name, spec in sf.items():
            if not isinstance(spec, dict) or set(spec) != {"script"}:
                raise ValueError(
                    f"es_dsl: script_fields {name} wants {{script}}"
                )
            src = spec["script"]
            src = src.get("source") if isinstance(src, dict) else src
            if not isinstance(src, str) or not src.strip():
                raise ValueError(
                    f"es_dsl: script_fields {name} needs a source string"
                )
            rm[name] = {"type": "double",
                        "script": {"source": f"emit({src})"}}
        body = {k: v for k, v in body.items() if k != "script_fields"}
        body["runtime_mappings"] = rm
        if isinstance(body.get("_source"), list):
            body["_source"] = [
                *body["_source"],
                *(n for n in sf if n not in body["_source"]),
            ]
    if "runtime_mappings" in body:
        rm = body["runtime_mappings"]
        rest = {k: v for k, v in body.items() if k != "runtime_mappings"}
        cte = _runtime_mappings_cte(index, rm, dialect)
        inner = compile_search(
            f"{index}_rt", rest, dialect, id_field, relations
        )
        stripped = inner.lstrip()
        if stripped.startswith("WITH "):
            # merge into one top-level WITH list
            return f"WITH {cte},\n{stripped[len('WITH '):]}"
        return f"WITH {cte}\n{inner}"
    if "track_total_hits" in body:
        # accepted and ignored: the knob trades total-count accuracy
        # for speed in ES; this engine's counts are exact either way
        if not isinstance(body["track_total_hits"], (bool, int)):
            raise ValueError("es_dsl: bad track_total_hits value")
        body = {k: v for k, v in body.items() if k != "track_total_hits"}
    for fk in ("fields", "docvalue_fields"):
        if fk not in body:
            continue
        # the modern projection APIs: plain field names (or the
        # {"field": name} object form); relationally identical to a
        # _source list here — one analysis model, no doc-vs-docvalue
        # split (columnar parquet IS doc values). Wildcards/format
        # raise; combining with _source raises (ES merges response
        # sections this engine doesn't have).
        if "_source" in body:
            raise ValueError(
                f"es_dsl: {fk} and _source together are unsupported "
                "(one projection per body)"
            )
        names = []
        for x in body[fk]:
            if isinstance(x, dict):
                if set(x) != {"field"}:
                    raise ValueError(
                        f"es_dsl: unsupported {fk} entry {x!r} "
                        "(format is unsupported)"
                    )
                x = x["field"]
            if not isinstance(x, str) or "*" in x:
                raise ValueError(
                    f"es_dsl: unsupported {fk} entry {x!r} "
                    "(wildcards are unsupported)"
                )
            names.append(x)
        body = {**{k: v for k, v in body.items() if k != fk},
                "_source": names}
    if "suggest" in body:
        return compile_suggest(index, body, dialect, id_field)
    known = {"query", "_source", "sort", "size", "from", "aggs", "knn",
             "collapse", "search_after", "highlight", "min_score",
             "rescore", "slice"}
    bad = set(body) - known
    if bad:
        raise ValueError(f"es_dsl: unsupported body keys {sorted(bad)}")
    ms_top = body.get("min_score")
    if ms_top is not None:
        if not isinstance(ms_top, (int, float)) or isinstance(ms_top, bool):
            raise ValueError("es_dsl: min_score must be numeric")
        body = {k: v for k, v in body.items() if k != "min_score"}
    if "knn" in body:
        return _compile_knn(index, body, dialect, id_field)
    if "aggs" in body:
        # ES returns hits ALONGSIDE aggs; this compiler returns one
        # relation per body, so hit-level keys combined with aggs would
        # be silently meaningless — raise instead (ADVICE r08 finding
        # #3). The ES "size": 0 idiom (aggs only, no hits) is the one
        # accepted shape.
        hit_keys = {"sort", "from", "_source", "collapse",
                    "search_after", "highlight", "rescore",
                    "slice"} & set(body)
        if hit_keys:
            raise ValueError(
                f"es_dsl: {sorted(hit_keys)} cannot combine with aggs "
                "(this compiler returns agg rows only; use size: 0)"
            )
        if body.get("size", 0) != 0:
            raise ValueError(
                "es_dsl: aggs bodies must use the ES size: 0 idiom "
                "(hit output alongside aggs is unsupported)"
            )
        return compile_aggs(index, body, dialect, id_field, relations)
    q = body.get("query", {"match_all": {}})
    qkind, _ = _one(q, "query clause")
    # normalize the sort list: explicit `_score` (desc) entries are the
    # DEFAULT score order spelled out — strip them so `sort: ["_score"]`
    # routes like no sort at all; `_score asc` raises (anti-relevance
    # order is unsupported)
    field_sorts: list = []
    score_sorted = False
    for s in body.get("sort", []):
        if s == "_score" or (
            isinstance(s, dict) and set(s) == {"_score"}
        ):
            spec = s["_score"] if isinstance(s, dict) else "desc"
            d = spec if isinstance(spec, str) else spec.get("order", "desc")
            if d != "desc":
                raise ValueError("es_dsl: sort _score asc is unsupported")
            score_sorted = True
        else:
            field_sorts.append(s)
    if qkind == "bool" and not field_sorts:
        bq = q["bool"]

        def _listed(key: str) -> list:
            v = bq.get(key, []) if isinstance(bq, dict) else []
            return v if isinstance(v, list) else [v]

        def _ft(c) -> bool:
            return isinstance(c, dict) and next(iter(c), None) in (
                "match", "multi_match",
            )

        musts, shoulds = _listed("must"), _listed("should")
        if (
            musts and all(map(_ft, musts)) and all(map(_ft, shoulds))
            and isinstance(bq, dict)
            and "minimum_should_match" not in bq
        ):
            # ES QUERY CONTEXT for bool: full-text musts (+optional
            # full-text shoulds) score as the Lucene sum, filters gate
            # membership. Everything else — explicit field sorts,
            # minimum_should_match vote counting, term-level
            # musts/shoulds — keeps the established filter-context
            # path (membership only).
            extra = set(body) - {"query", "_source", "size", "from",
                                 "sort"}
            if extra or ms_top is not None:
                raise ValueError(
                    "es_dsl: scored bool combines only with _source/"
                    f"size/from (got {sorted(extra) or ['min_score']})"
                )
            return _compile_scored_bool(index, body, dialect, id_field)
    if "rescore" in body:
        if qkind not in ("match", "multi_match") or field_sorts:
            raise ValueError(
                "es_dsl: rescore needs a scored match/multi_match query "
                "with no field sorts"
            )
        extra = set(body) & {"collapse", "search_after", "highlight",
                             "slice", "from"}
        if extra or ms_top is not None:
            raise ValueError(
                "es_dsl: rescore combines only with _source/size "
                f"(got {sorted(extra) or ['min_score']})"
            )
        return _compile_rescore(index, body, dialect, id_field)
    if qkind == "function_score":
        # popularity/recency/proximity boosting: BM25 relevance
        # combined with field-derived factors — the ES idiom for
        # "relevant AND popular/recent/nearby". Shorthand single
        # function (field_value_factor / gauss / exp / linear /
        # script_score / random_score) or a `functions` array with
        # per-entry filter+weight, combined by score_mode and applied
        # by boost_mode; max_boost caps the factor, min_score drops
        # hits below the final threshold. All of it compiles to
        # row-local arithmetic over the joined-back top-k relation.
        fs = q["function_score"]
        bad = set(fs) - {
            "query", "functions", "score_mode", "boost_mode",
            "max_boost", "min_score", "weight", *_FS_FUNCTION_KINDS,
        }
        if bad:
            raise ValueError(
                f"es_dsl: unsupported function_score keys {sorted(bad)}"
            )
        inner = fs.get("query")
        ikind, _ = _one(inner or {}, "function_score query")
        if ikind not in ("match", "multi_match", "bool") or field_sorts:
            raise ValueError(
                "es_dsl: function_score needs a match/multi_match/"
                "scored-bool query and no field sorts (scored context "
                "only)"
            )
        factor = _fs_factor(fs, dialect, id_field)
        mode = fs.get("boost_mode", "multiply")
        if mode not in ("multiply", "sum", "replace"):
            raise ValueError(
                f"es_dsl: unsupported boost_mode {mode!r} "
                "(multiply/sum/replace)"
            )
        ms = fs.get("min_score")
        if ms is not None and (
            not isinstance(ms, (int, float)) or isinstance(ms, bool)
        ):
            raise ValueError("es_dsl: min_score must be numeric")
        if ms is not None and ms_top is not None:
            raise ValueError(
                "es_dsl: min_score inside function_score and at the "
                "body top level are mutually exclusive"
            )
        ms_eff = ms if ms is not None else ms_top
        if ikind == "bool":
            # function_score over the everyday scored-bool shape —
            # the same inner routing rules as the bare scored bool
            ibq = inner["bool"]

            def _ift(c):
                return isinstance(c, dict) and next(iter(c), None) in (
                    "match", "multi_match",
                )

            im = ibq.get("must", []) if isinstance(ibq, dict) else []
            im = im if isinstance(im, list) else [im]
            ish = ibq.get("should", []) if isinstance(ibq, dict) else []
            ish = ish if isinstance(ish, list) else [ish]
            if not (
                im and all(map(_ift, im)) and all(map(_ift, ish))
                and isinstance(ibq, dict)
                and "minimum_should_match" not in ibq
            ):
                raise ValueError(
                    "es_dsl: function_score over bool needs full-text "
                    "musts (put membership clauses under filter)"
                )
            return _compile_scored_bool(
                index, {**body, "query": inner}, dialect, id_field,
                factor=factor, fs_mode=mode, min_score=ms_eff,
            )
        return _compile_scored(
            index, {**body, "query": inner}, dialect, id_field,
            factor=factor, fs_mode=mode, min_score=ms_eff,
        )
    if qkind in ("rank_feature", "distance_feature"):
        if field_sorts:
            raise ValueError(
                f"es_dsl: {qkind} is scored context only (no field sorts)"
            )
        return _compile_feature_query(index, body, qkind, dialect, id_field)
    if qkind == "combined_fields":
        if field_sorts:
            raise ValueError(
                "es_dsl: combined_fields is scored context only "
                "(no field sorts)"
            )
        return _compile_combined_fields(index, body, dialect, id_field)
    if qkind == "more_like_this":
        if field_sorts:
            raise ValueError(
                "es_dsl: more_like_this is scored context only "
                "(no field sorts)"
            )
        return _compile_mlt(index, body, dialect, id_field)
    if qkind == "pinned":
        if field_sorts:
            raise ValueError(
                "es_dsl: pinned is scored context only (no field sorts)"
            )
        return _compile_pinned(index, body, dialect, id_field)
    if qkind in ("match", "multi_match") and not field_sorts:
        # ES query context: bare full-text query, no field sort ->
        # BM25-scored, _score-ordered hits (the ES default experience)
        return _compile_scored(
            index, body, dialect, id_field, min_score=ms_top
        )
    if score_sorted and qkind in ("match", "multi_match"):
        raise ValueError(
            "es_dsl: mixing _score with field sorts on a scored query "
            "is unsupported (use _score alone or field sorts alone)"
        )
    # in filter context every hit scores identically, so a `_score`
    # sort entry is a no-op — dropped; the id tiebreak keeps the order
    # total (ES leaves equal-score order undefined)
    if "highlight" in body:
        raise ValueError(
            "es_dsl: highlight requires a scored match/multi_match "
            "query with no explicit sort (filter-context hits carry "
            "no matched terms to snippet)"
        )
    if ms_top is not None:
        raise ValueError(
            "es_dsl: min_score needs a scored query (filter-context "
            "hits all score identically)"
        )
    where = _query_expr(q, dialect, id_field, relations)
    if "slice" in body:
        # sliced scroll: deterministic disjoint partitions of the hit
        # set by a hash of the id — the ES idiom for parallel export.
        # Rendered over the engine's md5-uniform primitive so slice
        # membership is identical in both dialects AND stable across
        # runs; the predicate sits in the WHERE, below the sort.
        sl = body["slice"]
        if not isinstance(sl, dict) or set(sl) != {"id", "max"}:
            raise ValueError("es_dsl: slice wants {id, max}")
        sid, smax = sl["id"], sl["max"]
        if (
            not isinstance(sid, int) or not isinstance(smax, int)
            or isinstance(sid, bool) or isinstance(smax, bool)
            or smax < 2 or not 0 <= sid < smax
        ):
            raise ValueError(
                "es_dsl: slice wants ints 0 <= id < max, max >= 2"
            )
        from golang_db_query_engine_elasticsearch_indexer_spark.functions import (  # noqa: PLC0415
            hash16,
        )

        cast = "string" if dialect == "spark" else "varchar"
        h = hash16(f"md5(cast({id_field} AS {cast}))")
        where = f"({where})\n  AND ({h} % {smax}) = {sid}"
    cols = _source_cols(body, "filter-context hits")
    if cols is False:
        select = id_field
    elif cols:
        select = ", ".join(_ident(c) for c in cols)
    else:
        select = "*"
    order: list[str] = []
    for s in field_sorts:
        if isinstance(s, str):
            f, d = s, "asc"
        else:
            f, spec = _one(s, "sort entry")
            d = spec if isinstance(spec, str) else spec.get("order", "asc")
        if d not in ("asc", "desc"):
            raise ValueError(f"es_dsl: bad sort order {d!r}")
        order.append(f"{_ident(f)} {d.upper()}")
    if id_field not in [o.split()[0] for o in order]:
        order.append(f"{id_field} ASC")  # total order: deterministic LIMIT
    size = int(body.get("size", 10))
    offset = int(body.get("from", 0))
    oby = ", ".join(order)
    src = _ident(index)
    if "search_after" in body:
        # ES deep hit pagination: resume strictly after the last hit's
        # sort-key tuple. One value per EFFECTIVE sort key (the
        # explicit sorts plus the auto id tiebreak). Rendered as an
        # order-aware lexicographic predicate in the WHERE — it prunes
        # at the scan, so page N of a 100 TB result costs the same as
        # page 1 (the reason ES deprecates deep from/size in favor of
        # search_after).
        if "from" in body:
            raise ValueError("es_dsl: search_after replaces from")
        if "collapse" in body:
            raise ValueError("es_dsl: search_after with collapse is unsupported")
        vals = body["search_after"]
        if not isinstance(vals, list) or len(vals) != len(order):
            raise ValueError(
                f"es_dsl: search_after wants one value per effective "
                f"sort key ({len(order)}: {', '.join(order)})"
            )
        disj = []
        for i, o in enumerate(order):
            fld, d = o.split()
            conj = [
                f"{order[j].split()[0]} = {_lit(vals[j], dialect)}"
                for j in range(i)
            ]
            conj.append(
                f"{fld} {'>' if d == 'ASC' else '<'} {_lit(vals[i], dialect)}"
            )
            disj.append("(" + " AND ".join(conj) + ")")
        where = f"({where})\n  AND (" + "\n       OR ".join(disj) + ")"
    if "collapse" in body:
        # ES field collapsing: one hit per distinct collapse-field
        # value, the hit picked by the SEARCH SORT — a ranking window
        # per group, then the outer order/limit as usual. _source is
        # required so the rank column never leaks into the output.
        cf = _ident(body["collapse"]["field"])
        if not cols:
            raise ValueError("es_dsl: collapse requires _source")
        src = (
            f"(SELECT *, row_number() OVER "
            f"(PARTITION BY {cf} ORDER BY {oby}) AS collapse_rank\n"
            f"   FROM {src} WHERE {where}) c"
        )
        where = "collapse_rank = 1"
    sql = (
        f"SELECT {select} FROM {src}\n"
        f"WHERE {where}\n"
        f"ORDER BY {oby}\n"
        f"LIMIT {size}"
    )
    if offset:
        sql += f" OFFSET {offset}"
    return sql


def compile_count(index: str, body: dict, dialect: str,
                  id_field: str = "doc_id") -> str:
    """The ES `_count` API: `GET /{index}/_count` with an optional
    query-context body returns the matching-doc count. One aggregate,
    filter pushed to the scan — the cheapest question the DSL answers
    and the one ops dashboards ask most."""
    if dialect not in ("spark", "duck"):
        raise ValueError(f"es_dsl: unknown dialect {dialect!r}")
    bad = set(body) - {"query"}
    if bad:
        raise ValueError(
            f"es_dsl: _count takes only a query clause (got {sorted(bad)})"
        )
    where = _query_expr(body.get("query", {"match_all": {}}), dialect, id_field)
    return f"SELECT count(*) AS count FROM {_ident(index)}\nWHERE {where}\n"


# --- knn search (ES 8 vector search) -----------------------------------------


def _compile_knn(index: str, body: dict, dialect: str, id_field: str) -> str:
    """ES 8 `knn` search: cosine top-k of a literal query vector over
    an `array<float>` column, optionally under a `filter` clause
    (applied BEFORE the scan, ES semantics). ES's `num_candidates` is
    an HNSW recall knob — accepted and ignored, because this scan is
    EXACT (recall 1.0 supersedes any candidate pool; for approximate
    serving at scale, the IVF/PQ operators in operators/similarity.py
    are the swap-in). Scores round to 6 dp with an id tiebreak (the
    ann_brute_force discipline) so the rank permutation is total and
    cross-engine stable."""
    if set(body) - {"knn", "_source", "size"}:
        raise ValueError("es_dsl: knn combines only with _source/size")
    spec = dict(body["knn"])
    known = {"field", "query_vector", "k", "num_candidates", "filter"}
    bad = set(spec) - known
    if bad:
        raise ValueError(f"es_dsl: unsupported knn keys {sorted(bad)}")
    missing = {"field", "query_vector", "k"} - set(spec)
    if missing:
        raise ValueError(f"es_dsl: knn requires {sorted(missing)}")
    f = _ident(spec["field"])
    qv = spec["query_vector"]
    if not isinstance(qv, list) or not qv or not all(
        isinstance(x, (int, float)) and not isinstance(x, bool) for x in qv
    ):
        raise ValueError("es_dsl: knn query_vector must be a number list")
    k = int(spec["k"])
    where = (
        _query_expr(spec["filter"], dialect, id_field)
        if "filter" in spec
        else "TRUE"
    )
    if dialect == "spark":
        lits = ", ".join(f"cast({repr(float(x))} AS DOUBLE)" for x in qv)
        cos = f"""
          aggregate(zip_with({f}, array({lits}),
              (x, y) -> cast(x AS double) * y),
              cast(0 AS double), (acc, v) -> acc + v)
          / (sqrt(aggregate(transform({f},
                 x -> cast(x AS double) * cast(x AS double)),
                 cast(0 AS double), (acc, v) -> acc + v))
             * sqrt(aggregate(transform(array({lits}), x -> x * x),
                 cast(0 AS double), (acc, v) -> acc + v)))"""
    else:
        lits = ", ".join(repr(float(x)) for x in qv)
        cos = f"list_cosine_similarity({f}::DOUBLE[], [{lits}]::DOUBLE[])"
    # _source/size are HONORED, not ignored (ADVICE r08 finding #3):
    # _source picks the hit columns (score always appended), size caps
    # the returned hits at min(k, size) — ES returns k candidates
    # through the standard size window.
    cols = body.get("_source")
    select = (
        ", ".join(_ident(c) for c in cols) if cols
        else f"{id_field} AS match_id"
    )
    tiebreak = id_field if cols else "match_id"
    limit = min(k, int(body["size"])) if "size" in body else k
    return f"""
SELECT {select}, round({cos}, 6) AS score
FROM {_ident(index)}
WHERE {where}
ORDER BY score DESC, {tiebreak} ASC
LIMIT {limit}
"""


# --- aggregation context -----------------------------------------------------

_METRICS = {"avg", "sum", "min", "max", "value_count", "cardinality",
            "stats", "extended_stats", "percentiles", "percentile_ranks",
            "weighted_avg", "string_stats", "boxplot"}

# Metric kinds that render as MULTIPLE columns (stats_<name>_count/…,
# <name>_p50/…) or otherwise not under the sub-agg's own name
# (top_metrics emits <name>_<field>): never valid as a terms `order`
# target or a pipeline `buckets_path` — there is no column named by
# the sub-agg to order by / read from. Rejecting them here keeps the
# failure a compile-time ValueError instead of a downstream binder
# error on a nonexistent column (ADVICE r09 finding #1).
_MULTI_COLUMN_METRICS = frozenset(
    {"stats", "extended_stats", "percentiles", "percentile_ranks",
     "top_metrics", "string_stats", "boxplot", "geo_centroid",
     "geo_bounds"}
)


# Float discipline for sum/avg: double summation is ORDER-dependent,
# and a round() on top flips at half boundaries when Spark's partial
# aggregation order differs from DuckDB's single-threaded scan (bit us
# live: avg(value) on one fixture day is exactly 46.49875, rounding to
# .4987 or .4988 by partition count). So measures quantize to 6 dp
# into DECIMAL (exact for the fixture's 2-dp values), the DECIMAL sum
# is exact and order-independent, and the emitted double is the raw
# IEEE result of identical operations on identical operands — no final
# round, nothing for partitioning to flip.
_DEC = "DECIMAL(28, 6)"


def _metric_cols(name: str, kind: str, m: dict, dialect: str) -> list[str]:
    # weighted_avg nests its fields under value/weight; every other
    # metric names a top-level field
    if kind != "weighted_avg" and "field" not in m:
        raise ValueError(f"es_dsl: {kind} requires a field")
    f = _ident(m["field"]) if "field" in m else None
    if f is not None and "missing" in m:
        # ES metric `missing`: docs lacking the field contribute the
        # stand-in value instead of being skipped — one coalesce
        mv = m["missing"]
        if not isinstance(mv, (int, float)) or isinstance(mv, bool):
            raise ValueError(
                f"es_dsl: {kind} missing must be numeric"
            )
        f = f"coalesce({f}, {_lit(mv, dialect)})"
    exact_sum = f"cast(sum(cast({f} AS {_DEC})) AS DOUBLE)"
    if kind == "value_count":
        return [f"count({f}) AS {name}"]
    if kind == "cardinality":
        # ES's is approximate (HLL); exact here for the differential —
        # the engine's sketch lives in sketch_hll_distinct_users. A
        # `precision_threshold` knob is accepted and ignored (the knn
        # num_candidates precedent: the exact computation supersedes
        # an approximation-accuracy knob)
        return [f"count(DISTINCT {f}) AS {name}"]
    if kind == "sum":
        return [f"{exact_sum} AS {name}"]
    if kind == "avg":
        return [f"{exact_sum} / count({f}) AS {name}"]
    if kind == "stats":
        return [
            f"count({f}) AS {name}_count",
            f"round(min({f}), 4) AS {name}_min",
            f"round(max({f}), 4) AS {name}_max",
            f"{exact_sum} / count({f}) AS {name}_avg",
            f"{exact_sum} AS {name}_sum",
        ]
    if kind == "extended_stats":
        # ES extended_stats: stats + sum_of_squares + POPULATION
        # variance/std. The squares quantize to DECIMAL first (exact,
        # order-independent), then variance/std are the raw IEEE
        # doubles of identical arithmetic on identical operands in
        # both engines — same discipline as sum/avg. The square
        # operands are DECIMAL(18,6), NOT the module _DEC(28,6):
        # multiplying two (28,6) needs precision 57, which overflows
        # DuckDB's 38-digit cap and silently degrades to a DOUBLE
        # product (order-dependent sum — caught live at sf0.1);
        # (18,6)x(18,6) -> (37,12) stays exact in both engines. The
        # exact DECIMAL(38,12) sums agree bit-for-bit, but DuckDB's
        # int128 -> DOUBLE cast is off by one ulp when the scaled
        # integer exceeds 2^53 (caught live at sf0.1); rounding the
        # exact sum to 4 dp first (lossless: 2-dp inputs square to
        # exactly 4 dp) keeps the scaled integer in the exact range,
        # where both engines' casts round correctly.
        sq = (
            f"cast(round(sum(cast({f} AS DECIMAL(18, 6))"
            f" * cast({f} AS DECIMAL(18, 6))), 4) AS DOUBLE)"
        )
        var = f"({sq} - ({exact_sum} * {exact_sum}) / count({f})) / count({f})"
        return [
            f"count({f}) AS {name}_count",
            f"round(min({f}), 4) AS {name}_min",
            f"round(max({f}), 4) AS {name}_max",
            f"{exact_sum} / count({f}) AS {name}_avg",
            f"{exact_sum} AS {name}_sum",
            f"{sq} AS {name}_sum_of_squares",
            f"{var} AS {name}_variance",
            f"sqrt({var}) AS {name}_std_deviation",
        ]
    if kind == "percentile_ranks":
        # ES percentile_ranks: for each given value, the percentage of
        # observations <= it. The exact count-ratio form (ES's own is
        # TDigest-approximate): integer counts and one multiply/divide
        # on exact doubles — identical in both engines, no rounding
        # discipline needed.
        values = m.get("values")
        if not isinstance(values, list) or not values or not all(
            isinstance(x, (int, float)) and not isinstance(x, bool)
            for x in values
        ):
            raise ValueError("es_dsl: percentile_ranks wants a values list")
        cols = []
        for v in values:
            label = (f"{v:g}").replace(".", "_").replace("-", "m")
            hits = (
                f"sum(CASE WHEN {f} <= {_lit(v, dialect)} THEN 1 ELSE 0 END)"
            )
            cols.append(
                f"cast(100 AS DOUBLE) * {hits} / count({f})"
                f" AS {name}_rank_{label}"
            )
        return cols
    if kind == "weighted_avg":
        # ES weighted_avg: sum(value*weight)/sum(weight). Products and
        # sums quantize to DECIMAL (the (18,6)x(18,6) product stays in
        # range; the product sum rounds to 4 dp in the decimal domain
        # before the DOUBLE cast — the same two DuckDB traps
        # extended_stats hit, pre-empted), then one raw-double divide.
        vf = _ident(m["value"]["field"])
        wf = _ident(m["weight"]["field"])
        num = (
            f"cast(round(sum(cast({vf} AS DECIMAL(18, 6))"
            f" * cast({wf} AS DECIMAL(18, 6))), 4) AS DOUBLE)"
        )
        den = f"cast(sum(cast({wf} AS {_DEC})) AS DOUBLE)"
        return [f"{num} / {den} AS {name}"]
    if kind == "percentiles":
        # ES percentiles (default percents as in ES). ES's is
        # approximate (TDigest); EXACT interpolated quantiles here for
        # the differential — both engines share the (1-g)*a + g*b
        # interpolation on the sorted values, so the raw doubles agree
        # with no summation-order hazard. Column per percent:
        # {name}_p50, {name}_p99_9 (dots -> underscores).
        percents = m.get("percents", [1, 5, 25, 50, 75, 95, 99])
        if not isinstance(percents, list) or not percents or not all(
            isinstance(x, (int, float)) and not isinstance(x, bool)
            and 0 <= x <= 100 for x in percents
        ):
            raise ValueError("es_dsl: percents must be numbers in [0, 100]")
        cols = []
        for pc in percents:
            q = repr(pc / 100.0)
            label = (f"{pc:g}").replace(".", "_").replace("-", "m")
            fn = (
                f"percentile({f}, {q})" if dialect == "spark"
                else f"quantile_cont({f}, {q})"
            )
            # the engines' internal interpolation paths drift at
            # ~1e-12 (caught live at p99.9), so outputs quantize
            # through DECIMAL(18,6): with k-dp data and 3-digit
            # percents the true value is an exact <=(k+3)-dp decimal,
            # leaving >=5 orders of magnitude between the drift and
            # the 6-dp half boundary — lossless AND flip-proof
            cols.append(
                f"cast(cast({fn} AS DECIMAL(18, 6)) AS DOUBLE)"
                f" AS {name}_p{label}"
            )
        return cols
    if kind == "string_stats":
        # ES string_stats: count / min_length / max_length / avg_length
        # over the field's character lengths. `entropy` (and
        # show_distribution) need a character-frequency relation — a
        # different aggregation shape — so the column is OMITTED from
        # the schema (visible, not a silent wrong value) and the knob
        # raises. avg follows the exact-DECIMAL sum discipline
        # (integer lengths, so (28,6) is lossless).
        if m.get("show_distribution"):
            raise ValueError(
                "es_dsl: string_stats show_distribution is unsupported "
                "(the entropy/distribution columns need a character-"
                "frequency aggregation this compiler does not emit)"
            )
        ln = f"length({f})"
        lsum = f"cast(sum(cast({ln} AS {_DEC})) AS DOUBLE)"
        return [
            f"count({f}) AS {name}_count",
            f"min({ln}) AS {name}_min_length",
            f"max({ln}) AS {name}_max_length",
            f"{lsum} / count({f}) AS {name}_avg_length",
        ]
    if kind == "boxplot":
        # ES boxplot: the five-number summary via the same exact
        # interpolated quantiles as `percentiles` (ES's own is
        # TDigest-approximate). The IQR whisker columns (lower/upper)
        # need a second conditional pass against the bucket's own
        # q1/q3 — omitted from the schema, documented; a
        # `compression` knob is accepted and ignored (the exactness-
        # supersedes-approximation-knob precedent).
        bad = set(m) - {"field", "compression"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported boxplot keys {sorted(bad)}"
            )
        # explicit DOUBLE on min/max: over an integer column Spark's
        # round(min) stays integral while DuckDB's quantile family is
        # float — the boundary columns must agree for the driver hash
        cols = [f"cast(round(min({f}), 4) AS DOUBLE) AS {name}_min"]
        for pc, lab in ((25, "q1"), (50, "q2"), (75, "q3")):
            fn = (
                f"percentile({f}, {pc / 100.0!r})" if dialect == "spark"
                else f"quantile_cont({f}, {pc / 100.0!r})"
            )
            cols.append(
                f"cast(cast({fn} AS DECIMAL(18, 6)) AS DOUBLE)"
                f" AS {name}_{lab}"
            )
        cols.append(f"cast(round(max({f}), 4) AS DOUBLE) AS {name}_max")
        return cols
    return [f"round({kind}({f}), 4) AS {name}"]


_BUCKETS = {"terms", "date_histogram", "histogram", "range"}
_PIPELINE = {"cumulative_sum", "derivative", "serial_diff", "moving_fn",
             "moving_percentiles"}
_SIBLING_PIPELINE = {"avg_bucket", "sum_bucket", "min_bucket", "max_bucket",
                     "stats_bucket", "percentiles_bucket"}
# sibling pipelines that render as MULTIPLE columns — not addressable
# as a buckets_path / selector target (the _MULTI_COLUMN_METRICS rule)
_MULTI_COLUMN_SIBLINGS = {"stats_bucket", "percentiles_bucket"}
# order-free parent pipelines: normalize (whole-relation rescale) and
# bucket_sort (re-sort/truncate the returned buckets) need no bucket
# ordering, so unlike _PIPELINE they also compose with terms parents
_UNORDERED_PIPELINE = {"normalize", "bucket_sort"}
# row-local parent pipelines: no bucket ordering needed — bucket_script
# computes a derived metric per bucket, bucket_selector filters buckets
# (the HAVING / derived-metric idiom of Kibana dashboard bodies)
_ROWLOCAL_PIPELINE = {"bucket_script", "bucket_selector"}


def _metric_list(
    sub_aggs: list[tuple[str, dict]], dialect: str, id_field: str = "doc_id"
) -> list[str]:
    """SQL select-list fragments for metric sub-aggs, validated loudly."""
    out: list[str] = []
    for sub_name, sub_spec in sub_aggs:
        mkind, m = _one(sub_spec, f"sub-agg {sub_name}")
        if mkind == "top_metrics":
            out += _top_metrics_cols(_ident(sub_name), m, dialect, id_field)
            continue
        if mkind == "t_test":
            out += _t_test_cols(_ident(sub_name), m, dialect, id_field)
            continue
        if mkind in ("geo_centroid", "geo_bounds"):
            # geo metrics over the f_lat/f_lon column convention.
            # centroid = arithmetic mean of coords (the ES formula),
            # through the DECIMAL quantize discipline so double
            # summation order can't flip the 6-dp display round;
            # bounds = the min/max envelope (exact, no float hazard)
            if set(m) != {"field"}:
                raise ValueError(f"es_dsl: {mkind} wants {{field}} only")
            lat, lon = _geo_cols(m["field"])
            name = _ident(sub_name)
            if mkind == "geo_centroid":
                out += [
                    f"cast(round(avg(cast({lat} AS {_DEC})), 6)"
                    f" AS DOUBLE) AS {name}_lat",
                    f"cast(round(avg(cast({lon} AS {_DEC})), 6)"
                    f" AS DOUBLE) AS {name}_lon",
                ]
            else:
                out += [
                    f"max({lat}) AS {name}_top",
                    f"min({lat}) AS {name}_bottom",
                    f"min({lon}) AS {name}_left",
                    f"max({lon}) AS {name}_right",
                ]
            continue
        if mkind not in _METRICS:
            raise ValueError(f"es_dsl: unsupported sub-agg {mkind!r}")
        out += _metric_cols(_ident(sub_name), mkind, m, dialect)
    return out


def _t_test_cols(name: str, m: dict, dialect: str,
                 id_field: str) -> list[str]:
    """ES `t_test` (the A/B-comparison metric), Welch heteroscedastic
    form: each population is a filtered side of ONE scan (conditional
    aggregates — no second pass), sample variances via the
    extended_stats DECIMAL discipline. Emits `{name}_t_statistic` —
    the p-value ES reports needs the t-distribution CDF, which neither
    SQL dialect has; the STATISTIC column is the honest relational
    equivalent, and the schema makes the difference visible (the
    string_stats-entropy precedent). Paired and homoscedastic types
    raise."""
    bad = set(m) - {"a", "b", "type"}
    if bad:
        raise ValueError(f"es_dsl: unsupported t_test keys {sorted(bad)}")
    if m.get("type", "heteroscedastic") != "heteroscedastic":
        raise ValueError(
            "es_dsl: t_test supports type heteroscedastic (Welch) only"
        )
    sides = []
    for side in ("a", "b"):
        spec = m.get(side)
        if not isinstance(spec, dict) or "field" not in spec or (
            set(spec) - {"field", "filter"}
        ):
            raise ValueError(
                f"es_dsl: t_test {side} wants {{field, filter?}}"
            )
        f = _ident(spec["field"])
        cond = (
            f"coalesce({_query_expr(spec['filter'], dialect, id_field)}"
            ", FALSE)"
            if "filter" in spec else "TRUE"
        )
        n = f"sum(CASE WHEN {cond} AND {f} IS NOT NULL THEN 1 ELSE 0 END)"
        s = (
            f"cast(sum(CASE WHEN {cond} THEN cast({f} AS {_DEC}) END)"
            " AS DOUBLE)"
        )
        sq = (
            f"cast(round(sum(CASE WHEN {cond} THEN"
            f" cast({f} AS DECIMAL(18, 6))"
            f" * cast({f} AS DECIMAL(18, 6)) END), 4) AS DOUBLE)"
        )
        mean = f"({s} / {n})"
        var = f"(({sq} - {s} * {s} / {n}) / ({n} - 1))"
        sides.append((n, mean, var))
    (na, ma, va), (nb, mb, vb) = sides
    t = f"({ma} - {mb}) / sqrt({va} / {na} + {vb} / {nb})"
    return [f"round({t}, 4) AS {name}_t_statistic"]


def _top_metrics_cols(
    name: str, m: dict, dialect: str, id_field: str
) -> list[str]:
    """ES `top_metrics`: the metric field's value on the bucket's
    sort-extremum row ("the latest reading per host") — one max_by/
    min_by per requested metric, fully composable with other metric
    sub-aggs (unlike top_hits, which changes the relation shape).
    Sort-key comparison is at one-second granularity with id ties
    (sub-second ordering resolves by id — integer epoch truncation is
    what keeps both engines' arithmetic identical; ES leaves ties
    undefined anyway); the composite (sort, id) key is exact
    DECIMAL(38,0) — no double-precision loss past 2^53 — because
    neither engine's max_by accepts a struct key. size > 1 raises
    (multi-row output is top_hits' shape)."""
    bad = set(m) - {"metrics", "sort", "size"}
    if bad:
        raise ValueError(f"es_dsl: unsupported top_metrics keys {sorted(bad)}")
    if int(m.get("size", 1)) != 1:
        raise ValueError(
            "es_dsl: top_metrics size > 1 is unsupported (use top_hits)"
        )
    sf, d = _one(m.get("sort") or {}, "top_metrics sort")
    d = d if isinstance(d, str) else d.get("order", "asc")
    if d not in ("asc", "desc"):
        raise ValueError(f"es_dsl: bad top_metrics sort order {d!r}")
    mets = m.get("metrics")
    if isinstance(mets, dict):
        mets = [mets]
    if not isinstance(mets, list) or not mets or not all(
        isinstance(x, dict) and set(x) == {"field"} for x in mets
    ):
        raise ValueError(
            "es_dsl: top_metrics metrics wants {field} or a list of them"
        )
    sfi = _ident(sf)
    # the sort field must be TEMPORAL ("the latest reading" idiom —
    # a non-timestamp sort field fails loudly at bind time): integer
    # epoch seconds (the fixed_interval discipline) shifted left 18
    # digits + the id — exact DECIMAL(38,0), engine-identical, room
    # for 10^18 ids per second
    ep = "unix_timestamp" if dialect == "spark" else "epoch"
    composite = (
        f"cast(floor({ep}({sfi})) AS DECIMAL(38, 0))"
        f" * 1000000000000000000 + {id_field}"
    )
    fn = "max_by" if d == "desc" else "min_by"
    return [
        f"{fn}({_ident(x['field'])}, {composite}) AS "
        f"{name}_{_ident(x['field'])}"
        for x in mets
    ]


_UNIT_SECS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400,
              "week": 604800}


def _date_histo_secs(b: dict) -> int:
    """Bucket width in seconds for a date_histogram spec — defined for
    fixed_interval and the constant-width calendar units; month/year
    raise (variable length, a per-bucket divisor this compiler does
    not emit)."""
    if "fixed_interval" in b:
        mi = re.fullmatch(r"(\d+)([smhd])", str(b["fixed_interval"]))
        if not mi:
            raise ValueError(
                f"es_dsl: bad fixed_interval {b['fixed_interval']!r}"
            )
        return int(mi.group(1)) * {"s": 1, "m": 60, "h": 3600,
                                   "d": 86400}[mi.group(2)]
    unit = b.get("calendar_interval", "day")
    if unit in ("day", "week"):
        return _UNIT_SECS[unit]
    raise ValueError(
        f"es_dsl: rate under a {unit!r} calendar_interval is "
        "unsupported (variable bucket length; use fixed_interval or "
        "day/week)"
    )


def _rate_cols(rates: list[tuple[str, dict]], kind: str, b: dict,
               dialect: str) -> list[str]:
    """ES `rate` metric: per-bucket sum (or doc count) rescaled from
    the bucket interval to the requested unit — "events per hour" on a
    6-hour axis. Row-local arithmetic on the aggregated bucket: the
    divisor bucket_secs/unit_secs is one compile-time literal, exact
    in both engines."""
    if kind != "date_histogram":
        raise ValueError(
            "es_dsl: rate requires a date_histogram parent"
        )
    secs = _date_histo_secs(b)
    cols: list[str] = []
    for name, spec in rates:
        r = spec["rate"]
        bad = set(r) - {"field", "unit"}
        if bad:
            raise ValueError(f"es_dsl: unsupported rate keys {sorted(bad)}")
        unit = r.get("unit", "second")
        if unit not in _UNIT_SECS:
            raise ValueError(
                f"es_dsl: bad rate unit {unit!r} "
                f"({'/'.join(_UNIT_SECS)})"
            )
        div = secs / _UNIT_SECS[unit]
        if "field" in r:
            f = _ident(r["field"])
            num = f"cast(sum(cast({f} AS {_DEC})) AS DOUBLE)"
        else:
            num = "cast(count(*) AS DOUBLE)"
        cols.append(f"{num} / {div!r} AS {_ident(name)}")
    return cols


def _compile_mad(index: str, b: dict, mad: tuple[str, dict], where: str,
                 key: str, dialect: str) -> str:
    """ES `median_absolute_deviation`: median(|x - median(x)|) per
    bucket — EXACT here (ES's is TDigest-approximate), as two
    aggregations over one scan: bucket medians first (bucket-
    cardinality relation, broadcast by AQE), joined back for the
    deviation median. Quantiles share the percentiles discipline
    (interpolated, DECIMAL(18,6)-quantized)."""
    name, spec = mad
    m = spec["median_absolute_deviation"]
    if set(spec) != {"median_absolute_deviation"}:
        raise ValueError(
            "es_dsl: median_absolute_deviation takes no sibling keys"
        )
    bad = set(m) - {"field", "compression"}
    if bad:
        raise ValueError(
            f"es_dsl: unsupported median_absolute_deviation keys "
            f"{sorted(bad)}"
        )
    f = _ident(m["field"])
    tbad = set(b) - {"field", "size"}
    if tbad:
        raise ValueError(
            f"es_dsl: median_absolute_deviation terms parent supports "
            f"field/size only (got {sorted(tbad)})"
        )
    key_expr, _ = _bucket_key("terms", b, dialect)
    size = int(b.get("size", 10))
    pct = "percentile" if dialect == "spark" else "quantile_cont"
    n = _ident(name)
    return f"""
WITH raw AS (
  SELECT {key_expr} AS k, {f} AS v
  FROM {_ident(index)}
  WHERE ({where}) AND ({key_expr}) IS NOT NULL
),
med AS (
  SELECT k, {pct}(v, 0.5) AS m FROM raw GROUP BY k
)
SELECT r.k AS {key}, count(*) AS doc_count,
       cast(cast({pct}(abs(r.v - med.m), 0.5) AS DECIMAL(18, 6))
            AS DOUBLE) AS {n}
FROM raw r JOIN med ON r.k = med.k
GROUP BY r.k
ORDER BY doc_count DESC, {key} ASC
LIMIT {size}
"""


def _bucket_key(kind: str, b: dict, dialect: str) -> tuple[str, str]:
    """(key_expr, order_expr) for one bucket agg — the shared piece the
    nested path composes. ``order_expr`` orders buckets of this kind
    deterministically (range buckets by declaration order, everything
    else by key)."""
    f = _ident(b["field"])
    if kind == "terms":
        if "missing" in b:
            # ES terms `missing`: docs lacking the field bucket under
            # the given stand-in key instead of being dropped
            e = f"coalesce({f}, {_lit(b['missing'], dialect)})"
            return e, e
        return f, f
    if kind == "date_histogram":
        if "fixed_interval" in b:
            # ES fixed_interval ("30m", "6h", ...): bucket key is the
            # ES epoch-millis key, via integer epoch arithmetic that is
            # engine-identical by construction
            if "calendar_interval" in b:
                raise ValueError(
                    "es_dsl: fixed_interval and calendar_interval "
                    "are mutually exclusive"
                )
            mi = re.fullmatch(r"(\d+)([smhd])", str(b["fixed_interval"]))
            if not mi:
                raise ValueError(
                    f"es_dsl: bad fixed_interval {b['fixed_interval']!r}"
                )
            secs = int(mi.group(1)) * {
                "s": 1, "m": 60, "h": 3600, "d": 86400,
            }[mi.group(2)]
            if secs <= 0:
                raise ValueError("es_dsl: fixed_interval must be > 0")
            ep = "unix_timestamp" if dialect == "spark" else "epoch"
            e = (
                f"cast(floor({ep}({f}) / {secs}) * {secs} AS BIGINT)"
                " * 1000"
            )
            return e, e
        unit = b.get("calendar_interval", "day")
        if unit not in ("day", "week", "month", "year"):
            raise ValueError(f"es_dsl: unsupported calendar_interval {unit!r}")
        e = f"cast(date_trunc('{unit}', {f}) AS DATE)"
        return e, e
    if kind == "histogram":
        step = b["interval"]
        if not isinstance(step, (int, float)) or step <= 0:
            raise ValueError("es_dsl: histogram interval must be > 0")
        off = b.get("offset", 0)
        if not isinstance(off, (int, float)) or not 0 <= off < step:
            raise ValueError(
                "es_dsl: histogram offset must satisfy 0 <= offset < "
                "interval (ES contract)"
            )
        # cast: Spark floor(double) is BIGINT, DuckDB's is DOUBLE — the
        # key type must agree for the driver's hash compare
        if off:
            e = (
                f"cast(round(floor(({f} - {off}) / {step}) * {step}"
                f" + {off}, 4) AS DOUBLE)"
            )
        else:
            e = f"cast(round(floor({f} / {step}) * {step}, 4) AS DOUBLE)"
        return e, e
    if kind in ("range", "date_range"):
        # date_range = range with string (ISO date) bounds: from
        # inclusive / to exclusive, same CASE rendering — a date-shaped
        # string literal coerces identically against temporal columns
        # in both dialects (the r09 _lit rule, pushdown-verified)
        case, ordinal = _range_case(f, b["ranges"], dialect)
        return case, ordinal
    if kind == "geo_distance":
        # distance-ring buckets around an origin: the SAME from-
        # inclusive / to-exclusive CASE rendering as `range`, over the
        # haversine expression instead of a column — rings evaluate
        # inside the scan, one GROUP BY
        bad = set(b) - {"field", "origin", "ranges", "unit"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported geo_distance agg keys {sorted(bad)}"
            )
        lat0, lon0 = _geo_point(b.get("origin"), "geo_distance origin")
        unit = b.get("unit", "m")
        if unit not in ("m", "km", "mi"):
            raise ValueError(
                f"es_dsl: bad geo_distance unit {unit!r} (m/km/mi)"
            )
        scale = {"m": 1.0, "km": 1000.0, "mi": 1609.344}[unit]
        lat, lon = _geo_cols(b["field"])
        dist = f"({_haversine(lat, lon, lat0, lon0)} / {scale!r})"
        case, ordinal = _range_case(dist, b["ranges"], dialect)
        return case, ordinal
    raise ValueError(f"es_dsl: unsupported bucket agg {kind!r}")


def _range_case(f: str, ranges: list, dialect: str) -> tuple[str, str]:
    """CASE label + CASE ordinal for disjoint range buckets (ES
    evaluates overlapping ranges independently — one GROUP BY can't,
    so overlap raises)."""
    edges = []
    for r in ranges:
        lo, hi = r.get("from"), r.get("to")
        if lo is None and hi is None:
            raise ValueError("es_dsl: range bucket needs from and/or to")
        edges.append((lo, hi))
    bounds = [x for lo, hi in edges for x in (lo, hi) if x is not None]
    has_str = any(isinstance(x, str) for x in bounds)
    if has_str and not all(isinstance(x, str) for x in bounds):
        raise ValueError(
            "es_dsl: range bounds must be all-numeric or all-string "
            "(date_range); do not mix"
        )
    # overlap sentinels: ISO date strings order lexicographically, so
    # string (date_range) bounds compare directly with string sentinels
    neg = "" if has_str else float("-inf")
    pos = "\U0010ffff" if has_str else float("inf")
    for i, (lo1, hi1) in enumerate(edges):
        for lo2, hi2 in edges[i + 1 :]:
            a1, b1 = (lo1 if lo1 is not None else neg,
                      hi1 if hi1 is not None else pos)
            a2, b2 = (lo2 if lo2 is not None else neg,
                      hi2 if hi2 is not None else pos)
            if max(a1, a2) < min(b1, b2):
                raise ValueError(
                    "es_dsl: overlapping range buckets are unsupported"
                )
    whens, orders = [], []
    for i, ((lo, hi), r) in enumerate(zip(edges, ranges)):
        conds = []
        if lo is not None:
            conds.append(f"{f} >= {_lit(lo, dialect)}")
        if hi is not None:
            conds.append(f"{f} < {_lit(hi, dialect)}")
        # ES keyed ranges: an explicit per-range "key" names the bucket
        label = r.get(
            "key", f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
        )
        label = str(label).replace("'", "''")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{label}'")
        orders.append(f"WHEN {' AND '.join(conds)} THEN {i}")
    case = "CASE " + " ".join(whens) + " END"
    ordinal = "CASE " + " ".join(orders) + " ELSE 999 END"
    return case, ordinal


def compile_aggs(
    index: str, body: dict, dialect: str, id_field: str = "doc_id",
    relations: dict | None = None,
) -> str:
    """Compile an aggregation body: one top-level bucket agg (terms /
    date_histogram / histogram / disjoint range / significant_terms)
    with metric sub-aggs, one optional nested BUCKET sub-level
    (metrics then sit on the inner buckets), all under an optional
    query-context filter."""
    if dialect not in ("spark", "duck"):
        raise ValueError(f"es_dsl: unknown dialect {dialect!r}")
    where = _query_expr(
        body.get("query", {"match_all": {}}), dialect, id_field, relations
    )
    # sibling pipeline aggs (avg_bucket & co) sit BESIDE the bucket agg
    # at the top level and consume its buckets via "parent>path"
    siblings = {n: sp for n, sp in body["aggs"].items()
                if set(sp) & _SIBLING_PIPELINE}
    parents = {n: sp for n, sp in body["aggs"].items() if n not in siblings}
    agg_name, spec = _one(parents, "aggs")
    sub = spec.get("aggs", {})
    bucket_kinds = [k for k in spec if k != "aggs"]
    if len(bucket_kinds) != 1:
        raise ValueError("es_dsl: exactly one bucket agg per level")
    kind = bucket_kinds[0]
    b = spec[kind]
    key = f"{agg_name}_key"

    if siblings and kind not in ("date_histogram", "histogram"):
        # ES allows siblings of any bucket agg; here the enumerable
        # histogram-family relation is the supported consumer — reject
        # the rest rather than silently mis-scope the statistic
        raise ValueError(
            "es_dsl: sibling pipeline aggs need a histogram-family parent"
        )
    if kind in ("significant_terms", "significant_text"):
        # significant_text IS significant_terms here: the engine's one
        # analysis model already tokenizes the field inside
        # _compile_significant_terms, which is exactly what ES's
        # text-typed variant does (ES splits the two kinds by field
        # mapping, a distinction this schema-driven engine lacks)
        if sub:
            raise ValueError(f"es_dsl: {kind} takes no sub-aggs")
        bad = set(b) - {"field", "size", "min_doc_count"}
        if kind == "significant_text":
            if b.get("filter_duplicate_text"):
                raise ValueError(
                    "es_dsl: significant_text filter_duplicate_text is "
                    "unsupported (near-dup suppression lives in "
                    "operators/dedup.py)"
                )
            bad -= {"filter_duplicate_text"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported {kind} keys {sorted(bad)}"
            )
        return _compile_significant_terms(
            index, b, where, key, dialect
        )
    if kind == "adjacency_matrix":
        if sub:
            raise ValueError(
                "es_dsl: adjacency_matrix sub-aggs are unsupported "
                "(doc_count per filter/intersection only)"
            )
        return _compile_adjacency_matrix(index, b, where, key, dialect,
                                         id_field)
    if kind == "composite":
        return _compile_composite(index, b, sub, where, dialect)
    if kind == "filters":
        return _compile_filters(index, b, sub, where, key, dialect, id_field)

    # split sub-aggs: at most one nested bucket; top_hits is its own
    # shape; pipeline aggs wrap the bucket result; the rest are metrics
    inner = [(n, sp) for n, sp in sub.items()
             if set(sp) & _BUCKETS or "aggs" in sp]
    top_hits = [(n, sp) for n, sp in sub.items() if "top_hits" in sp]
    pipelines = [(n, sp) for n, sp in sub.items()
                 if (n, sp) not in inner and set(sp) & _PIPELINE]
    rowlocal = [(n, sp) for n, sp in sub.items()
                if (n, sp) not in inner and set(sp) & _ROWLOCAL_PIPELINE]
    mads = [(n, sp) for n, sp in sub.items()
            if (n, sp) not in inner and "median_absolute_deviation" in sp]
    rates = [(n, sp) for n, sp in sub.items()
             if (n, sp) not in inner and "rate" in sp]
    normalizes = [(n, sp) for n, sp in sub.items()
                  if (n, sp) not in inner and "normalize" in sp]
    bsorts = [(n, sp) for n, sp in sub.items()
              if (n, sp) not in inner and "bucket_sort" in sp]
    cumcards = [(n, sp) for n, sp in sub.items()
                if (n, sp) not in inner and "cumulative_cardinality" in sp]
    metric_specs = [
        (n, sp) for n, sp in sub.items()
        if (n, sp) not in inner and (n, sp) not in top_hits
        and (n, sp) not in pipelines and (n, sp) not in rowlocal
        and (n, sp) not in mads and (n, sp) not in rates
        and (n, sp) not in normalizes and (n, sp) not in bsorts
        and (n, sp) not in cumcards
    ]
    if (normalizes or bsorts) and kind not in (
        "terms", "date_histogram", "histogram"
    ):
        raise ValueError(
            "es_dsl: normalize/bucket_sort need a terms or "
            "histogram-family parent"
        )
    if len(bsorts) > 1:
        raise ValueError("es_dsl: at most one bucket_sort per level")
    if cumcards:
        # the running count of DISTINCT values needs the raw rows
        # (which bucket saw each value FIRST) — a dedicated two-
        # aggregation path, like MAD
        if (kind not in ("date_histogram", "histogram") or pipelines
                or rowlocal or normalizes or bsorts or len(cumcards) > 1):
            raise ValueError(
                "es_dsl: cumulative_cardinality needs a histogram-"
                "family parent and composes with plain metric "
                "sub-aggs only"
            )
        metric_sql2 = _metric_list(metric_specs, dialect, id_field)
        if rates:
            metric_sql2 += _rate_cols(rates, kind, b, dialect)
        return _compile_cumulative_cardinality(
            index, b, kind, cumcards[0], metric_sql2, sub, where, key,
            dialect,
        )
    if mads:
        # median-of-|x - bucket median| needs the bucket's own median
        # as an input — a second aggregation pass over the same scan,
        # its own compile path (like top_hits, it owns the relation)
        if kind != "terms" or len(mads) > 1 or len(sub) != 1:
            raise ValueError(
                "es_dsl: median_absolute_deviation must be the only "
                "sub-agg of a terms bucket (it joins the bucket median "
                "back against the rows)"
            )
        return _compile_mad(index, b, mads[0], where, key, dialect)
    if rowlocal and kind not in (
        "terms", "multi_terms", "date_histogram", "histogram"
    ):
        raise ValueError(
            "es_dsl: bucket_script/bucket_selector need a terms, "
            "multi_terms, or histogram-family parent"
        )
    if top_hits:
        if kind != "terms":
            raise ValueError("es_dsl: top_hits only under terms")
        if len(top_hits) > 1 or inner or pipelines or metric_specs:
            raise ValueError(
                "es_dsl: top_hits must be the only sub-agg of its bucket"
            )
        return _compile_top_hits(
            index, b, top_hits[0], where, key, dialect, id_field
        )
    metric_sql = _metric_list(metric_specs, dialect, id_field)
    if rates:
        metric_sql += _rate_cols(rates, kind, b, dialect)
    metrics = (
        "" if not metric_sql else ",\n       " + ",\n       ".join(metric_sql)
    )

    if inner:
        if pipelines:
            raise ValueError(
                "es_dsl: pipeline aggs cannot combine with nested buckets"
            )
        if len(inner) > 1:
            raise ValueError("es_dsl: at most one nested bucket per level")
        if kind != "terms":
            raise ValueError("es_dsl: nested buckets only under terms")
        return _compile_nested(
            index, b, inner[0], metrics, where, key, dialect
        )

    if kind in ("sampler", "diversified_sampler"):
        # ES sampler: sub-aggs run over a BOUNDED sample of matching
        # docs instead of all of them. ES samples the top shard_size
        # by relevance; this filter-context engine has no score, so
        # the sample is the first shard_size docs by id — the
        # documented deterministic choice (same discipline as every
        # LIMIT in the module). diversified_sampler additionally caps
        # docs per distinct field value BEFORE the size cap
        # (de-duplication bias control); docs missing the diversity
        # field are excluded, the bucket NULL rule. Scale shape: the
        # id order is a TakeOrdered over the filtered scan, the
        # diversity rank one window partitioned by the field — then
        # every sub-agg runs on <= shard_size rows.
        known = {"shard_size"} if kind == "sampler" else {
            "shard_size", "field", "max_docs_per_value"}
        bad = set(b) - known
        if bad:
            raise ValueError(
                f"es_dsl: unsupported {kind} keys {sorted(bad)}"
            )
        shard_size = int(b.get("shard_size", 100))
        if shard_size < 1:
            raise ValueError("es_dsl: shard_size must be >= 1")
        if kind == "sampler":
            sample = f"""sample AS (
  SELECT * FROM {_ident(index)}
  WHERE {where}
  ORDER BY {id_field} ASC
  LIMIT {shard_size}
)"""
        else:
            f = _ident(b["field"])
            per = int(b.get("max_docs_per_value", 1))
            if per < 1:
                raise ValueError(
                    "es_dsl: max_docs_per_value must be >= 1"
                )
            sample = f"""ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY {f} ORDER BY {id_field} ASC) AS _divrank
  FROM {_ident(index)}
  WHERE ({where}) AND {f} IS NOT NULL
),
sample AS (
  SELECT * FROM ranked WHERE _divrank <= {per}
  ORDER BY {id_field} ASC
  LIMIT {shard_size}
)"""
        return f"""
WITH {sample}
SELECT count(*) AS doc_count{metrics}
FROM sample
"""
    if kind == "missing":
        # ES missing agg: ONE bucket of docs lacking the field
        if set(b) != {"field"}:
            raise ValueError("es_dsl: missing takes only a field")
        return f"""
SELECT count(*) AS doc_count{metrics}
FROM {_ident(index)}
WHERE ({where}) AND {_ident(b["field"])} IS NULL
"""
    if kind == "filter":
        # ES filter agg: ONE bucket under an extra filter clause —
        # the body of the agg IS the query clause
        sub_where = _query_expr(b, dialect, id_field)
        return f"""
SELECT count(*) AS doc_count{metrics}
FROM {_ident(index)}
WHERE ({where}) AND coalesce({sub_where}, FALSE)
"""
    if kind == "global":
        # ES global agg: ONE bucket over the WHOLE index, ignoring the
        # search query — the "compare against everything" idiom
        if b != {}:
            raise ValueError("es_dsl: global takes an empty body")
        return f"""
SELECT count(*) AS doc_count{metrics}
FROM {_ident(index)}
"""
    if kind == "terms":
        if pipelines:
            # ES requires a histogram-family parent for these — terms
            # bucket order (by count) has no "previous bucket" meaning
            raise ValueError(
                "es_dsl: pipeline aggs need a histogram-family parent"
            )
        bad = set(b) - {"field", "size", "order", "missing",
                        "min_doc_count", "include", "exclude"}
        if bad:
            raise ValueError(f"es_dsl: unsupported terms keys {sorted(bad)}")
        key_expr, _ = _bucket_key("terms", b, dialect)
        size = int(b.get("size", 10))
        having = ""
        if int(b.get("min_doc_count", 1)) > 1:
            having = f"\nHAVING count(*) >= {int(b['min_doc_count'])}"
        # ES terms include/exclude: regex (string, FULL-match as in
        # Lucene) or exact-value list filters on the bucket KEY —
        # pushed into the WHERE so excluded keys never aggregate
        key_filter = ""
        for param, keep in (("include", True), ("exclude", False)):
            if param not in b:
                continue
            v = b[param]
            if isinstance(v, str):
                if "'" in v or "\\" in v:
                    raise ValueError(
                        f"es_dsl: terms {param} regex may not contain "
                        "quotes or backslashes (escapes parse "
                        "differently across dialects)"
                    )
                # Lucene include/exclude regexes are FULL-match;
                # Spark rlike is partial -> anchor there
                cond = (
                    f"regexp_full_match({key_expr}, '{v}')"
                    if dialect == "duck"
                    else f"rlike({key_expr}, '^(?:{v})$')"
                )
            elif isinstance(v, list) and v and all(
                isinstance(x, (str, int, float)) and not isinstance(x, bool)
                for x in v
            ):
                vals = ", ".join(_lit(x, dialect) for x in v)
                cond = f"{key_expr} IN ({vals})"
            else:
                raise ValueError(
                    f"es_dsl: terms {param} wants a regex string or a "
                    "value list"
                )
            key_filter += f" AND {cond}" if keep else f" AND NOT {cond}"
        # ES terms `order`: _count (the default), _key, or a sibling
        # metric name; non-key orders carry the key tiebreak so the
        # top-N window stays total
        simple = {
            n for n, sp in metric_specs
            if next(iter(sp)) not in _MULTI_COLUMN_METRICS
        }
        oby = f"doc_count DESC, {key} ASC"
        if "order" in b:
            target, d = _one(b["order"], "terms order")
            d = d.lower() if isinstance(d, str) else d
            if d not in ("asc", "desc"):
                raise ValueError(f"es_dsl: bad terms order {d!r}")
            if target == "_key":
                oby = f"{key} {d.upper()}"
            elif target == "_count":
                oby = f"doc_count {d.upper()}, {key} ASC"
            elif target in simple:
                oby = f"{target} {d.upper()}, {key} ASC"
            else:
                raise ValueError(
                    f"es_dsl: terms order target {target!r} is neither "
                    "_key, _count, nor a sibling single-value metric"
                )
        sql = f"""
SELECT {key_expr} AS {key}, count(*) AS doc_count{metrics}
FROM {_ident(index)}
WHERE ({where}) AND ({key_expr}) IS NOT NULL{key_filter}
GROUP BY {key_expr}{having}
ORDER BY {oby}
LIMIT {size}
"""
        if rowlocal:
            # ES applies size truncation at collection, THEN pipeline
            # aggs run on the returned buckets — so the script/selector
            # wrap sits OUTSIDE the top-N limit
            sql = _wrap_rowlocal(sql, rowlocal, simple, oby)
        if normalizes or bsorts:
            avail = simple | {n for n, sp in rowlocal
                              if "bucket_script" in sp}
            sql = _apply_unordered(sql, normalizes, bsorts, avail, key)
        return sql
    if kind == "multi_terms":
        return _compile_multi_terms(
            index, b, metric_specs, metrics, rowlocal, where, dialect
        )
    if kind == "auto_date_histogram":
        if pipelines or rowlocal:
            raise ValueError(
                "es_dsl: pipeline aggs under auto_date_histogram are "
                "unsupported (the interval is data-chosen; use "
                "date_histogram with fixed_interval)"
            )
        return _compile_auto_date_histogram(
            index, b, metrics, where, key, dialect
        )
    if kind == "matrix_stats":
        # ES matrix_stats: pairwise covariance/correlation across N
        # numeric fields. Relational shape: one row per unordered
        # field pair (diagonal included — its covariance IS the
        # variance), columns field_a/field_b/n_rows/covariance/
        # correlation. Float discipline: inputs quantize to
        # DECIMAL(18,6), the sums of products are EXACT decimals, and
        # covariance/correlation form from those sums in identical
        # double arithmetic — partial-aggregation order can never flip
        # a bit. The PRODUCT operands are DECIMAL(18,6), NOT the
        # module _DEC(28,6): (28,6)x(28,6) needs precision 57, which
        # overflows the 38-digit cap — Spark silently reduces the
        # product to DECIMAL(38,6) and ROUNDS it to 6dp while DuckDB
        # clamps to DECIMAL(38,12), a cross-engine divergence for any
        # field with >3 decimal places. The exact width is per
        # dialect: Spark (18,6)x(18,6) -> (37,12) fits the cap, but
        # DuckDB MULTIPLIES DECIMAL(<=18) in int64 physical storage
        # and overflows on real magnitudes (caught live at sf0.01:
        # 82612.09^2), so it gets (19,6) operands -> int128 ->
        # DECIMAL(38,12). Same quantization (scale 6), same exact
        # product value, both engines. One scan, one aggregate row, a
        # constant-size VALUES-join fan-out.
        if sub or pipelines or rowlocal:
            raise ValueError("es_dsl: matrix_stats takes no sub-aggs")
        bad = set(b) - {"fields"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported matrix_stats keys {sorted(bad)}"
            )
        fields = b.get("fields")
        if (
            not isinstance(fields, list) or not 2 <= len(fields) <= 6
            or len(set(fields)) != len(fields)
        ):
            raise ValueError(
                "es_dsl: matrix_stats wants 2-6 distinct fields"
            )
        cols = [_ident(f) for f in fields]
        # exact sums per field and per pair over one aggregate
        # product operand width: see the float-discipline note above
        _pdec = "DECIMAL(18, 6)" if dialect == "spark" else "DECIMAL(19, 6)"
        sums, pair_rows = [], []
        for i, a in enumerate(cols):
            sums.append(f"sum(cast({a} AS {_pdec})) AS s_{a}")
            sums.append(
                f"sum(cast({a} AS {_pdec}) * cast({a} AS {_pdec}))"
                f" AS ss_{a}_{a}"
            )
            for j in range(i + 1, len(cols)):
                bcol = cols[j]
                sums.append(
                    f"sum(cast({a} AS {_pdec}) * cast({bcol} AS {_pdec}))"
                    f" AS ss_{a}_{bcol}"
                )
        def cov(x, y):
            return (
                f"(cast(ss_{x}_{y} AS DOUBLE)"
                f" - cast(s_{x} AS DOUBLE) * cast(s_{y} AS DOUBLE) / n)"
                f" / (n - 1)"
            )
        for i, a in enumerate(cols):
            for j in range(i, len(cols)):
                bcol = cols[j]
                c = cov(a, bcol)
                if i == j:
                    corr = "cast(1.0 AS DOUBLE)"
                else:
                    corr = (
                        f"round(({c}) / (sqrt({cov(a, a)})"
                        f" * sqrt({cov(bcol, bcol)})), 6)"
                    )
                pair_rows.append(
                    f"SELECT '{a}' AS field_a, '{bcol}' AS field_b,"
                    f" n AS n_rows, round({c}, 4) AS covariance,"
                    f" {corr} AS correlation FROM agg"
                )
        union = "\n  UNION ALL ".join(pair_rows)
        notnull = " AND ".join(f"{c} IS NOT NULL" for c in cols)
        return f"""
WITH agg AS (
  SELECT cast(count(*) AS DOUBLE) AS n, {', '.join(sums)}
  FROM {_ident(index)}
  WHERE ({where}) AND {notnull}
)
SELECT * FROM (
  {union}
) m
ORDER BY field_a ASC, field_b ASC
"""
    if kind == "geotile_grid":
        # ES geotile_grid: map-tile buckets keyed "z/x/y" (the slippy-
        # map scheme Kibana maps request). The tile indices are pure
        # floor arithmetic over web-mercator projection — one GROUP BY
        # on a derived string key, top-N by doc_count, metrics compose
        # as on terms. Scale shape: identical to a terms agg (partial
        # agg -> TakeOrdered); precision bounds the key cardinality at
        # 4^z regardless of row count.
        if pipelines or rowlocal:
            raise ValueError(
                "es_dsl: pipeline aggs under geotile_grid are unsupported"
            )
        bad = set(b) - {"field", "precision", "size"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported geotile_grid keys {sorted(bad)}"
            )
        z = b.get("precision", 7)
        if not isinstance(z, int) or isinstance(z, bool) or not 0 <= z <= 29:
            raise ValueError(
                "es_dsl: geotile_grid precision must be an int in [0, 29]"
            )
        lat, lon = _geo_cols(b["field"])
        n = 2 ** z
        sv = "string" if dialect == "spark" else "varchar"
        xe = (
            f"least(greatest(cast(floor(({lon} + 180.0) / 360.0 * {n})"
            f" AS BIGINT), 0), {n - 1})"
        )
        ye = (
            f"least(greatest(cast(floor((1.0 - ln(tan(radians({lat}))"
            f" + 1.0 / cos(radians({lat}))) / pi()) / 2.0 * {n})"
            f" AS BIGINT), 0), {n - 1})"
        )
        key_expr = (
            f"concat('{z}/', cast({xe} AS {sv}), '/', cast({ye} AS {sv}))"
        )
        size = int(b.get("size", 10000))
        return f"""
SELECT {key_expr} AS {key}, count(*) AS doc_count{metrics}
FROM {_ident(index)}
WHERE ({where}) AND {lat} IS NOT NULL AND {lon} IS NOT NULL
GROUP BY {key_expr}
ORDER BY doc_count DESC, {key} ASC
LIMIT {size}
"""
    if kind == "rare_terms":
        # ES rare_terms: the long tail — buckets whose doc_count is at
        # most max_doc_count, ordered rarest first. No size param (the
        # rarity cap bounds the result); one GROUP BY + HAVING
        if pipelines:
            raise ValueError(
                "es_dsl: pipeline aggs need a histogram-family parent"
            )
        bad = set(b) - {"field", "max_doc_count"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported rare_terms keys {sorted(bad)}"
            )
        mdc = int(b.get("max_doc_count", 1))
        if not 1 <= mdc <= 100:
            raise ValueError(
                "es_dsl: rare_terms max_doc_count must be in [1, 100]"
            )
        f = _ident(b["field"])
        return f"""
SELECT {f} AS {key}, count(*) AS doc_count{metrics}
FROM {_ident(index)}
WHERE ({where}) AND {f} IS NOT NULL
GROUP BY {f}
HAVING count(*) <= {mdc}
ORDER BY doc_count ASC, {key} ASC
"""
    key_expr, order_expr = _bucket_key(kind, b, dialect)
    if kind in ("range", "date_range", "geo_distance"):
        if pipelines:
            raise ValueError(
                "es_dsl: pipeline aggs need a histogram-family parent"
            )
        return f"""
SELECT {key_expr} AS {key}, count(*) AS doc_count{metrics}
FROM {_ident(index)}
WHERE ({where}) AND ({key_expr}) IS NOT NULL
GROUP BY {key_expr}, {order_expr}
ORDER BY {order_expr} ASC
"""
    mdc = int(b.get("min_doc_count", 1))
    having = f"\nHAVING count(*) >= {mdc}" if mdc > 1 else ""
    if "min_doc_count" in b and mdc == 0:
        # the EXPLICIT Kibana default: a zero-filled bucket axis
        if kind == "histogram":
            base = _zero_fill_histogram(
                index, b, metric_specs, metrics, where, key, key_expr,
                dialect,
            )
        elif kind != "date_histogram":
            raise ValueError(
                "es_dsl: min_doc_count 0 (zero-filled axis) is "
                "supported for date_histogram and histogram only"
            )
        else:
            base = _zero_fill_date_histogram(
                index, b, metric_specs, metrics, where, key, key_expr,
                dialect,
            )
    else:
        base = f"""SELECT {key_expr} AS {key}, count(*) AS doc_count{metrics}
FROM {_ident(index)}
WHERE ({where}) AND ({key_expr}) IS NOT NULL
GROUP BY {key_expr}{having}"""
    simple = {n for n, sp in metric_specs
              if next(iter(sp)) not in _MULTI_COLUMN_METRICS}
    # selector/script/normalize/sort paths may also name a
    # window-pipeline output (ES: buckets_path can target any sibling
    # agg); multi-column siblings are not addressable
    avail = (
        simple
        | {n for n, sp in pipelines
           if next(iter(sp)) != "moving_percentiles"}  # multi-column
        | {n for n, sp in siblings.items()
           if next(iter(sp)) not in _MULTI_COLUMN_SIBLINGS}
    )
    if pipelines or siblings:
        sql = _wrap_pipelines(base, pipelines, siblings, key, simple,
                              agg_name, dialect)
        if rowlocal:
            sql = _wrap_rowlocal(sql, rowlocal, avail, f"{key} ASC")
    elif rowlocal:
        sql = _wrap_rowlocal(f"\n{base}\n", rowlocal, simple, f"{key} ASC")
    else:
        sql = f"\n{base}\nORDER BY {key} ASC\n"
    if normalizes or bsorts:
        avail = avail | {n for n, sp in rowlocal if "bucket_script" in sp}
        sql = _apply_unordered(sql, normalizes, bsorts, avail, key)
    return sql


def _resolve_bucket_col(path, avail: set[str], key: str, what: str,
                        allow_key: bool = False) -> str:
    """Resolve a buckets_path/sort target on an aggregated bucket
    relation: `_count` = doc_count, optionally `_key`, else a
    single-column sibling name."""
    if path == "_count":
        return "doc_count"
    if allow_key and path == "_key":
        return key
    if not isinstance(path, str) or path not in avail:
        raise ValueError(
            f"es_dsl: {what} target {path!r} names no single-value "
            "sibling (multi-column metrics/siblings cannot be a target)"
        )
    return _ident(path)


def _apply_unordered(
    sql: str, normalizes: list[tuple[str, dict]],
    bsorts: list[tuple[str, dict]], avail: set[str], key: str,
) -> str:
    """ES `normalize` and `bucket_sort` pipelines: both run on the
    RETURNED buckets (post top-N, like every pipeline), need no bucket
    ordering, and compose with terms parents — normalize adds
    whole-relation rescale columns, bucket_sort re-sorts/truncates the
    bucket list and runs OUTERMOST (it sees normalize outputs, as in
    ES's dependency-ordered pipeline execution). Scale shape: both
    wrap the aggregated bucket relation — bucket-cardinality rows,
    never the corpus."""
    if normalizes:
        cols = []
        for name, spec in normalizes:
            if set(spec) != {"normalize"}:
                raise ValueError("es_dsl: normalize takes no sibling keys")
            p = spec["normalize"]
            bad = set(p) - {"buckets_path", "method"}
            if bad:
                raise ValueError(
                    f"es_dsl: unsupported normalize keys {sorted(bad)}"
                )
            path = _resolve_bucket_col(
                p.get("buckets_path"), avail, key, "normalize"
            )
            method = p.get("method")
            n = _ident(name)
            # whole-relation sums follow the DECIMAL discipline (the
            # engines frame-sum in different row orders); min/max are
            # order-independent as-is
            dsum = f"cast(sum(cast({path} AS {_DEC})) OVER () AS DOUBLE)"
            if method == "percent_of_sum":
                cols.append(f"100.0 * {path} / {dsum} AS {n}")
            elif method in ("rescale_0_1", "rescale_0_100"):
                mn = f"min({path}) OVER ()"
                mx = f"max({path}) OVER ()"
                scale = "100.0 * " if method == "rescale_0_100" else ""
                # single-bucket relation: 0/0 -> NULL (no defined range)
                cols.append(
                    f"{scale}({path} - {mn})"
                    f" / nullif(cast({mx} - {mn} AS DOUBLE), 0) AS {n}"
                )
            else:
                raise ValueError(
                    f"es_dsl: unsupported normalize method {method!r} "
                    "(percent_of_sum / rescale_0_1 / rescale_0_100; "
                    "mean/z-score/softmax are not compiled)"
                )
            avail = avail | {name}
        ncols = ",\n       ".join(cols)
        sql = f"""
SELECT b.*,
       {ncols}
FROM (
{sql}
) b
ORDER BY {key} ASC
"""
    if bsorts:
        name, spec = bsorts[0]
        if set(spec) != {"bucket_sort"}:
            raise ValueError("es_dsl: bucket_sort takes no sibling keys")
        p = spec["bucket_sort"]
        bad = set(p) - {"sort", "from", "size", "gap_policy"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported bucket_sort keys {sorted(bad)}"
            )
        if p.get("gap_policy", "skip") != "skip":
            raise ValueError(
                "es_dsl: bucket_sort supports gap_policy skip only"
            )
        sorts = p.get("sort", [])
        if isinstance(sorts, (str, dict)):
            sorts = [sorts]
        order: list[str] = []
        for s_ in sorts:
            if isinstance(s_, str):
                f_, d_ = s_, "asc"
            else:
                f_, dspec = _one(s_, "bucket_sort sort entry")
                d_ = (dspec if isinstance(dspec, str)
                      else dspec.get("order", "asc"))
            if d_ not in ("asc", "desc"):
                raise ValueError(f"es_dsl: bad bucket_sort order {d_!r}")
            col = _resolve_bucket_col(f_, avail, key, "bucket_sort",
                                      allow_key=True)
            # explicit NULLS LAST: the engines' defaults differ (Spark
            # ASC puts NULLs first, DuckDB last)
            order.append(f"{col} {d_.upper()} NULLS LAST")
        order.append(f"{key} ASC")  # total order under LIMIT
        offset = int(p.get("from", 0))
        if "size" not in p and offset:
            raise ValueError(
                "es_dsl: bucket_sort from without size is unsupported"
            )
        limit = f"\nLIMIT {int(p['size'])}" if "size" in p else ""
        off = f" OFFSET {offset}" if offset else ""
        sql = f"""
SELECT * FROM (
{sql}
) bsorted
ORDER BY {', '.join(order)}{limit}{off}
"""
    return sql


def _wrap_pipelines(
    base: str, pipelines: list[tuple[str, dict]],
    siblings: dict[str, dict], key: str,
    metric_names: set[str], parent_name: str, dialect: str = "spark",
) -> str:
    """ES pipeline aggregations over a histogram-family parent:
    PARENT pipelines (cumulative_sum / derivative of a sibling metric,
    ``buckets_path``, ``_count`` = doc_count) as ordered window
    functions, and SIBLING pipelines (avg/sum/min/max_bucket with the
    ES ``parent>path`` buckets_path) as whole-relation windows — ES
    reports a sibling as one scalar beside the buckets; the relational
    rendering is that scalar as a constant column on every bucket row.

    Determinism: the running sum accumulates in the window's total
    ORDER BY (bucket key, unique per bucket) — a sequential
    prefix-scan, the same additions in the same order in both engines,
    so no rounding is needed on top of the parent metric's own
    discipline. Scale shape: every window runs on the AGGREGATED
    bucket relation (bucket-cardinality rows), never the raw corpus;
    the single-partition window is bounded by bucket count, not data
    size."""

    def resolve(path: str | None, what: str) -> str:
        if path == "_count":
            return "doc_count"
        if path not in metric_names:
            raise ValueError(
                f"es_dsl: {what} buckets_path {path!r} names no "
                "single-value sibling metric (multi-column metrics — "
                "stats/extended_stats/percentiles/percentile_ranks — "
                "cannot be a buckets_path)"
            )
        return path

    cols: list[str] = []
    for name, spec in pipelines:
        pkind, p = _one(spec, f"pipeline agg {name}")
        path = resolve(p.get("buckets_path"), pkind)
        n = _ident(name)
        # cast: DuckDB widens sum(BIGINT) to HUGEINT; metric paths are
        # already DOUBLE (a no-op cast) — the types must agree
        ctype = "BIGINT" if path == "doc_count" else "DOUBLE"
        if pkind == "cumulative_sum":
            cols.append(
                f"cast(sum({path}) OVER (ORDER BY {key} ASC"
                f" ROWS UNBOUNDED PRECEDING) AS {ctype}) AS {n}"
            )
        elif pkind == "derivative":
            # NULL for the first bucket, as in ES
            cols.append(
                f"{path} - lag({path}) OVER (ORDER BY {key} ASC) AS {n}"
            )
        elif pkind == "serial_diff":
            lag = int(p.get("lag", 1))
            if lag < 1:
                raise ValueError("es_dsl: serial_diff lag must be >= 1")
            cols.append(
                f"{path} - lag({path}, {lag}) OVER (ORDER BY {key} ASC)"
                f" AS {n}"
            )
        elif pkind == "moving_percentiles":
            # exact interpolated quantiles over a sliding bucket frame
            # (ES's is TDigest-approximate) — the moving_fn frame
            # semantics, the percentiles naming/DECIMAL discipline
            bad = set(p) - {"buckets_path", "window", "shift", "percents"}
            if bad:
                raise ValueError(
                    f"es_dsl: unsupported moving_percentiles keys "
                    f"{sorted(bad)}"
                )
            w = int(p.get("window", 0))
            if w < 1:
                raise ValueError(
                    "es_dsl: moving_percentiles window must be >= 1"
                )
            shift = int(p.get("shift", 0))
            if shift == 0:
                frame = f"ROWS BETWEEN {w} PRECEDING AND 1 PRECEDING"
            elif shift == 1:
                frame = f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW"
            else:
                raise ValueError(
                    f"es_dsl: unsupported moving_percentiles shift "
                    f"{shift} (0 = exclude current bucket, 1 = include)"
                )
            percents = p.get("percents", [1, 5, 25, 50, 75, 95, 99])
            if not isinstance(percents, list) or not percents or not all(
                isinstance(x, (int, float)) and not isinstance(x, bool)
                and 0 <= x <= 100 for x in percents
            ):
                raise ValueError(
                    "es_dsl: percents must be numbers in [0, 100]"
                )
            over = f"OVER (ORDER BY {key} ASC {frame})"
            pfn = "percentile" if dialect == "spark" else "quantile_cont"
            for pc in percents:
                q = repr(pc / 100.0)
                label = (f"{pc:g}").replace(".", "_").replace("-", "m")
                cols.append(
                    f"cast(cast({pfn}({path}, {q}) {over}"
                    f" AS DECIMAL(18, 6)) AS DOUBLE) AS {n}_p{label}"
                )
        else:  # moving_fn
            bad = set(p) - {"buckets_path", "window", "script", "shift"}
            if bad:
                raise ValueError(
                    f"es_dsl: unsupported moving_fn keys {sorted(bad)}"
                )
            w = int(p.get("window", 0))
            if w < 1:
                raise ValueError("es_dsl: moving_fn window must be >= 1")
            m = re.fullmatch(
                r"MovingFunctions\.(unweightedAvg|sum|min|max)\(values\)",
                str(p.get("script", "")).strip(),
            )
            if not m:
                raise ValueError(
                    "es_dsl: moving_fn supports exactly the stock "
                    "MovingFunctions.{unweightedAvg|sum|min|max}(values) "
                    f"scripts (got {p.get('script')!r})"
                )
            shift = int(p.get("shift", 0))
            # ES shift semantics: 0 (default) = window is the w buckets
            # BEFORE the current one; 1 = slide right to include it
            if shift == 0:
                frame = f"ROWS BETWEEN {w} PRECEDING AND 1 PRECEDING"
            elif shift == 1:
                frame = f"ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW"
            else:
                raise ValueError(
                    f"es_dsl: unsupported moving_fn shift {shift} "
                    "(0 = exclude current bucket, 1 = include)"
                )
            over = f"OVER (ORDER BY {key} ASC {frame})"
            mfn = m.group(1)
            # sliding-frame sums are order-INDEPENDENT only in the
            # exact-decimal domain (DuckDB evaluates frames via segment
            # trees — a different addition order than a sequential
            # scan), so sum/avg follow the module's DECIMAL discipline
            dsum = f"cast(sum(cast({path} AS {_DEC})) {over} AS DOUBLE)"
            if mfn == "sum":
                # MovingFunctions.sum of an EMPTY window is 0.0 in ES
                # (avg of empty is NaN -> null, min/max +-Inf -> null,
                # all matching SQL NULL)
                cols.append(f"coalesce({dsum}, 0.0) AS {n}")
            elif mfn == "unweightedAvg":
                cols.append(f"{dsum} / count({path}) {over} AS {n}")
            else:
                cols.append(f"cast({mfn}({path}) {over} AS DOUBLE) AS {n}")
    for name, spec in siblings.items():
        pkind, p = _one(spec, f"sibling pipeline agg {name}")
        bp = p.get("buckets_path")
        if not isinstance(bp, str) or ">" not in bp:
            raise ValueError(
                f"es_dsl: sibling buckets_path must be 'parent>path', "
                f"got {bp!r}"
            )
        pname, _, leaf = bp.partition(">")
        if pname != parent_name:
            raise ValueError(
                f"es_dsl: sibling buckets_path parent {pname!r} is not "
                f"the bucket agg {parent_name!r}"
            )
        path = resolve(leaf, pkind)
        n = _ident(name)
        if pkind == "stats_bucket":
            # ES stats_bucket: count/min/max/avg/sum over the parent's
            # buckets, one column each ({n}_count BIGINT, rest per the
            # sibling discipline below)
            if path == "doc_count":
                dsum = "cast(sum(doc_count) OVER () AS DOUBLE)"
                mm = "cast({f}(doc_count) OVER () AS BIGINT)"
                ssum = "cast(sum(doc_count) OVER () AS BIGINT)"
            else:
                dsum = f"cast(sum(cast({path} AS {_DEC})) OVER () AS DOUBLE)"
                mm = f"cast({{f}}({path}) OVER () AS DOUBLE)"
                ssum = dsum
            cols += [
                f"count({path}) OVER () AS {n}_count",
                f"{mm.format(f='min')} AS {n}_min",
                f"{mm.format(f='max')} AS {n}_max",
                f"{dsum} / count({path}) OVER () AS {n}_avg",
                f"{ssum} AS {n}_sum",
            ]
            continue
        if pkind == "percentiles_bucket":
            # ES percentiles_bucket: exact interpolated quantiles of a
            # parent metric ACROSS the buckets (ES default percents),
            # one {n}_p{label} column per percent — the percentiles
            # metric's naming and DECIMAL(18,6) discipline, evaluated
            # as whole-relation windows over the bucket relation
            percents = p.get("percents", [1, 5, 25, 50, 75, 95, 99])
            if not isinstance(percents, list) or not percents or not all(
                isinstance(x, (int, float)) and not isinstance(x, bool)
                and 0 <= x <= 100 for x in percents
            ):
                raise ValueError(
                    "es_dsl: percents must be numbers in [0, 100]"
                )
            pbad = set(p) - {"buckets_path", "percents"}
            if pbad:
                raise ValueError(
                    f"es_dsl: unsupported percentiles_bucket keys "
                    f"{sorted(pbad)}"
                )
            for pc in percents:
                q = repr(pc / 100.0)
                label = (f"{pc:g}").replace(".", "_").replace("-", "m")
                fnq = (
                    f"percentile({path}, {q})" if dialect == "spark"
                    else f"quantile_cont({path}, {q})"
                )
                cols.append(
                    f"cast(cast({fnq} OVER () AS DECIMAL(18, 6))"
                    f" AS DOUBLE) AS {n}_p{label}"
                )
            continue
        fn = pkind.split("_")[0]  # avg | sum | min | max
        # avg/sum over the UNORDERED whole-relation frame are
        # order-dependent on doubles (engines sum the frame in
        # different row orders — a last-ulp flip was caught live), so
        # they follow the module's DECIMAL discipline: exact-decimal
        # window sum, divide/emit as the raw IEEE double. min/max and
        # integer paths are order-independent as-is.
        if path == "doc_count":
            dsum = "cast(sum(doc_count) OVER () AS DOUBLE)"
            if fn == "sum":
                cols.append(
                    f"cast(sum(doc_count) OVER () AS BIGINT) AS {n}"
                )
            elif fn == "avg":
                cols.append(f"{dsum} / count(*) OVER () AS {n}")
            else:
                cols.append(
                    f"cast({fn}(doc_count) OVER () AS BIGINT) AS {n}"
                )
        else:
            dsum = f"cast(sum(cast({path} AS {_DEC})) OVER () AS DOUBLE)"
            if fn == "sum":
                cols.append(f"{dsum} AS {n}")
            elif fn == "avg":
                cols.append(f"{dsum} / count({path}) OVER () AS {n}")
            else:
                cols.append(f"cast({fn}({path}) OVER () AS DOUBLE) AS {n}")
    pipe = ",\n       ".join(cols)
    return f"""
SELECT b.*,
       {pipe}
FROM (
{base}
) b
ORDER BY {key} ASC
"""


# --- row-local pipeline aggs: bucket_script / bucket_selector ----------------

_SCRIPT_TOKEN = re.compile(
    r"\s*(doc\['[A-Za-z_][A-Za-z0-9_]*'\]\.value"
    r"|params\.[A-Za-z_][A-Za-z0-9_]*|\d+\.\d+|\d+"
    r"|&&|\|\||==|!=|>=|<=|[-+*/()><!%])"
)


def _compile_script(script, params: dict[str, str], what: str,
                    allow_doc_fields: bool = False) -> str:
    """Translate the Painless-lite expression grammar real
    bucket_script/bucket_selector bodies use — `params.x` refs, numeric
    literals, + - * / arithmetic, comparisons, && || !, parentheses —
    to one SQL expression with each param resolved to its bucket
    column. Anything beyond that grammar (method calls, strings,
    ternaries) raises at compile time: a silent mistranslation of a
    dashboard metric is the one failure mode this compiler never
    allows. Division follows Painless doubles (SQL `/` is float
    division on these operand types in both target dialects)."""
    if not isinstance(script, str) or not script.strip():
        raise ValueError(f"es_dsl: {what} needs a non-empty script string")
    toks: list[str] = []
    i, s = 0, script.strip()
    while i < len(s):
        m = _SCRIPT_TOKEN.match(s, i)
        if not m:
            raise ValueError(
                f"es_dsl: {what} script has unsupported syntax at {s[i:]!r}"
            )
        toks.append(m.group(1))
        i = m.end()
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def atom() -> str:
        t = peek()
        if t is None:
            raise ValueError(f"es_dsl: {what} script ends unexpectedly")
        if t == "(":
            take()
            e = orexpr()
            if peek() != ")":
                raise ValueError(f"es_dsl: {what} script: unbalanced parens")
            take()
            return f"({e})"
        if t == "-":
            take()
            return f"(- {atom()})"
        if t == "!":
            take()
            return f"(NOT {atom()})"
        take()
        if t.startswith("doc['"):
            if not allow_doc_fields:
                raise ValueError(
                    f"es_dsl: {what} script: doc[...] refs are for "
                    "runtime fields (bucket scripts read params.*)"
                )
            return _ident(t[len("doc['"):-len("'].value")])
        if t.startswith("params."):
            name = t[len("params."):]
            if name not in params:
                raise ValueError(
                    f"es_dsl: {what} script references params.{name} "
                    "which is not a buckets_path key"
                )
            return params[name]
        if re.fullmatch(r"\d+(\.\d+)?", t):
            return t
        raise ValueError(f"es_dsl: {what} script: unexpected token {t!r}")

    def mul() -> str:
        e = atom()
        # % is Painless (and SQL) modulo — dividend-sign semantics in
        # both target dialects, so the translation is literal
        while peek() in ("*", "/", "%"):
            e = f"{e} {take()} {atom()}"
        return e

    def add() -> str:
        e = mul()
        while peek() in ("+", "-"):
            e = f"{e} {take()} {mul()}"
        return e

    def cmp() -> str:
        e = add()
        if peek() in (">", "<", ">=", "<=", "==", "!="):
            op = {"==": "=", "!=": "<>"}.get(t := take(), t)
            e = f"{e} {op} {add()}"
        return e

    def andexpr() -> str:
        e = cmp()
        while peek() == "&&":
            take()
            e = f"({e}) AND ({cmp()})"
        return e

    def orexpr() -> str:
        e = andexpr()
        while peek() == "||":
            take()
            e = f"({e}) OR ({andexpr()})"
        return e

    out = orexpr()
    if pos != len(toks):
        raise ValueError(
            f"es_dsl: {what} script: trailing tokens {toks[pos:]!r}"
        )
    return out


def _wrap_rowlocal(
    inner_sql: str,
    rowlocal: list[tuple[str, dict]],
    metric_names: set[str],
    oby: str,
) -> str:
    """bucket_script derived-metric columns and bucket_selector
    predicates over an already-aggregated bucket relation (the HAVING /
    computed-column idioms of real Kibana dashboard bodies). Two
    layers so a selector may reference a script output, as ES allows:
    scripts compute in the inner select, selectors filter outside, the
    parent's bucket order re-asserted on top. Scale shape: both run on
    the AGGREGATED relation (bucket-cardinality rows, post top-N),
    never the raw corpus — zero extra shuffles.

    gap_policy: only the ES default "skip" — a NULL metric makes a
    script column NULL and a selector predicate false (the bucket is
    dropped), exactly ES's skip; "insert_zeros"/"keep_values" raise."""
    script_cols: list[str] = []
    script_names: set[str] = set()
    selectors: list[str] = []

    def resolve(path, what: str, extra: set[str]) -> str:
        if path == "_count":
            return "doc_count"
        if path not in metric_names | extra:
            raise ValueError(
                f"es_dsl: {what} buckets_path {path!r} names no "
                "single-value sibling metric (multi-column metrics — "
                "stats/extended_stats/percentiles/percentile_ranks — "
                "cannot be a buckets_path)"
            )
        return _ident(path)

    for name, spec in rowlocal:
        pkind, p = _one(spec, f"pipeline agg {name}")
        bad = set(p) - {"buckets_path", "script", "gap_policy"}
        if bad:
            raise ValueError(
                f"es_dsl: unsupported {pkind} keys {sorted(bad)}"
            )
        if p.get("gap_policy", "skip") != "skip":
            raise ValueError(
                f"es_dsl: unsupported gap_policy "
                f"{p.get('gap_policy')!r} (only the ES default 'skip')"
            )
        bp = p.get("buckets_path")
        if not isinstance(bp, dict) or not bp:
            raise ValueError(
                f"es_dsl: {pkind} buckets_path must be a non-empty "
                "map of script param -> sibling metric"
            )
        # selectors resolve AFTER scripts, so they may name one
        extra = script_names if pkind == "bucket_selector" else set()
        params = {k: resolve(v, pkind, extra) for k, v in bp.items()}
        expr = _compile_script(p.get("script"), params, pkind)
        if pkind == "bucket_script":
            script_cols.append(f"cast({expr} AS DOUBLE) AS {_ident(name)}")
            script_names.add(name)
        else:
            selectors.append(f"coalesce({expr}, FALSE)")
    inner = f"SELECT * FROM (\n{inner_sql}\n) b0"
    if script_cols:
        inner = (
            "SELECT b0.*,\n       "
            + ",\n       ".join(script_cols)
            + f"\nFROM (\n{inner_sql}\n) b0"
        )
    if not selectors:
        return f"\nSELECT * FROM (\n{inner}\n) b1\nORDER BY {oby}\n"
    pred = "\n  AND ".join(selectors)
    return (
        f"\nSELECT * FROM (\n{inner}\n) b1\n"
        f"WHERE {pred}\nORDER BY {oby}\n"
    )


# --- multi_terms / auto_date_histogram bucket kinds ---------------------------


def _compile_multi_terms(
    index: str,
    b: dict,
    metric_specs: list[tuple[str, dict]],
    metrics: str,
    rowlocal: list[tuple[str, dict]],
    where: str,
    dialect: str,
) -> str:
    """ES `multi_terms`: terms over a compound key (>= 2 fields), one
    GROUP BY over all key fields. ES semantics kept: a doc missing ANY
    key field is excluded; default order is doc_count DESC with the
    full key tuple as tiebreak; `order` accepts _count, _key (the key
    tuple lexicographically), or a single-value sibling metric. The
    relational rendering emits one column per key field (named by the
    field) instead of ES's key array + '|'-joined key_as_string."""
    bad = set(b) - {"terms", "size", "order", "min_doc_count"}
    if bad:
        raise ValueError(f"es_dsl: unsupported multi_terms keys {sorted(bad)}")
    specs = b.get("terms")
    if not isinstance(specs, list) or len(specs) < 2:
        raise ValueError("es_dsl: multi_terms wants >= 2 term sources")
    fields = []
    for t in specs:
        if set(t) != {"field"}:
            raise ValueError(
                "es_dsl: multi_terms sources take only a field "
                f"(got {sorted(t)})"
            )
        fields.append(_ident(t["field"]))
    size = int(b.get("size", 10))
    having = ""
    if int(b.get("min_doc_count", 1)) > 1:
        having = f"\nHAVING count(*) >= {int(b['min_doc_count'])}"
    keys_asc = ", ".join(f"{f} ASC" for f in fields)
    simple = {n for n, sp in metric_specs
              if next(iter(sp)) not in _MULTI_COLUMN_METRICS}
    oby = f"doc_count DESC, {keys_asc}"
    if "order" in b:
        target, d = _one(b["order"], "multi_terms order")
        d = d.lower() if isinstance(d, str) else d
        if d not in ("asc", "desc"):
            raise ValueError(f"es_dsl: bad multi_terms order {d!r}")
        if target == "_key":
            oby = ", ".join(f"{f} {d.upper()}" for f in fields)
        elif target == "_count":
            oby = f"doc_count {d.upper()}, {keys_asc}"
        elif target in simple:
            oby = f"{target} {d.upper()}, {keys_asc}"
        else:
            raise ValueError(
                f"es_dsl: multi_terms order target {target!r} is neither "
                "_key, _count, nor a sibling single-value metric"
            )
    not_null = " AND ".join(f"{f} IS NOT NULL" for f in fields)
    sql = f"""
SELECT {", ".join(fields)}, count(*) AS doc_count{metrics}
FROM {_ident(index)}
WHERE ({where}) AND {not_null}
GROUP BY {", ".join(fields)}{having}
ORDER BY {oby}
LIMIT {size}
"""
    if rowlocal:
        return _wrap_rowlocal(sql, rowlocal, simple, oby)
    return sql


# the ES auto_date_histogram interval ladder, rendered as FIXED second
# widths so both engines pick the identical interval from the identical
# integer-second span (ES uses calendar-aware intervals above hours;
# this deterministic rendering approximates month/quarter/year as
# 30/90/365 days — documented deviation, pinned by unit test)
_AUTO_DH_LADDER = [
    1, 5, 10, 30,                      # seconds
    60, 300, 600, 1800,                # minutes
    3600, 10800, 43200,                # hours
    86400, 604800,                     # day, week
    2592000, 7776000, 31536000,        # ~month, ~quarter, ~year
]


def _zero_fill_fills(metric_specs: list[tuple[str, dict]]) -> str:
    """ES empty-bucket metric values for a zero-filled axis:
    sum/value_count/cardinality 0, avg/min/max NULL; anything else
    raises (multi-column metrics have no defined empty shape here)."""
    fills = []
    for n, sp in metric_specs:
        mk = next(iter(sp))
        if mk in ("value_count", "cardinality"):
            fills.append(f"coalesce(b.{_ident(n)}, 0) AS {_ident(n)}")
        elif mk == "sum":
            fills.append(
                f"coalesce(b.{_ident(n)}, cast(0 AS DOUBLE)) AS {_ident(n)}"
            )
        elif mk in ("avg", "min", "max"):
            fills.append(f"b.{_ident(n)} AS {_ident(n)}")
        else:
            raise ValueError(
                f"es_dsl: min_doc_count 0 with {mk} metrics is "
                "unsupported (single-value metrics only)"
            )
    return "".join(",\n       " + c for c in fills)


def _zero_fill_histogram(
    index: str, b: dict, metric_specs: list[tuple[str, dict]],
    metrics: str, where: str, key: str, key_expr: str, dialect: str,
) -> str:
    """``min_doc_count: 0`` for NUMERIC histograms — the date axis's
    sibling: the contiguous bucket grid generated in-plan from the
    data's bucket ordinals (integer sequence, so a fractional
    `interval` still yields an exact axis), optionally widened by
    numeric ``extended_bounds``. Same scale shape as the date variant:
    axis rows = value span / interval, bounds is one aggregate row,
    the bucket relation broadcasts into the left join."""
    fill_cols = _zero_fill_fills(metric_specs)
    f = _ident(b["field"])
    step = b["interval"]
    off = b.get("offset", 0)
    eb = b.get("extended_bounds")
    lo = f"cast(floor((min({f}) - {off}) / {step}) AS BIGINT)"
    hi = f"cast(floor((max({f}) - {off}) / {step}) AS BIGINT)"
    if eb is not None:
        if (not isinstance(eb, dict) or set(eb) != {"min", "max"}
                or not all(isinstance(v, (int, float))
                           and not isinstance(v, bool)
                           for v in eb.values())):
            raise ValueError(
                "es_dsl: histogram extended_bounds wants numeric "
                "{min, max}"
            )
        elo = f"cast(floor(({eb['min']} - {off}) / {step}) AS BIGINT)"
        ehi = f"cast(floor(({eb['max']} - {off}) / {step}) AS BIGINT)"
        lo, hi = f"least({lo}, {elo})", f"greatest({hi}, {ehi})"
    axis_key = f"cast(round(i * {step} + {off}, 4) AS DOUBLE)"
    axis = (
        f"SELECT {axis_key} AS {key}\n"
        f"  FROM (SELECT explode(sequence(lo, hi, 1)) AS i FROM zf_bounds)"
        if dialect == "spark"
        else f"SELECT {axis_key} AS {key}\n"
        f"  FROM (SELECT unnest(generate_series(lo, hi, 1)) AS i"
        f" FROM zf_bounds)"
    )
    return f"""WITH zf_bounds AS (
  SELECT {lo} AS lo, {hi} AS hi
  FROM {_ident(index)} WHERE ({where}) AND {f} IS NOT NULL
),
zf_axis AS (
  {axis}
),
zf_buckets AS (
  SELECT {key_expr} AS {key}, count(*) AS doc_count{metrics}
  FROM {_ident(index)}
  WHERE ({where}) AND ({key_expr}) IS NOT NULL
  GROUP BY {key_expr}
)
SELECT a.{key} AS {key}, coalesce(b.doc_count, 0) AS doc_count{fill_cols}
FROM zf_axis a LEFT JOIN zf_buckets b ON a.{key} = b.{key}"""


def _zero_fill_date_histogram(
    index: str, b: dict, metric_specs: list[tuple[str, dict]],
    metrics: str, where: str, key: str, key_expr: str, dialect: str,
) -> str:
    """``min_doc_count: 0`` — the EXPLICIT default of Kibana-generated
    date_histogram bodies: the bucket axis is CONTIGUOUS, empty buckets
    appear with doc_count 0 (and ES's empty-bucket metric values:
    sum/value_count/cardinality 0, avg/min/max NULL). The axis is
    generated in-plan from the data's key bounds — optionally widened
    by ``extended_bounds`` {min,max} date strings, which only ever
    EXTEND (ES semantics: data outside the bounds still buckets) — as
    a sequence/generate_series relation left-joined to the aggregated
    buckets. Scale shape: the axis is bounded by bucket count (axis
    rows = time span / interval, never data size), the bounds relation
    is one aggregate row, and the join is a broadcast of the bucket
    relation; pipeline aggs composed on top run over the FILLED axis,
    which is exactly what makes derivative/moving windows correct
    across gaps."""
    fill_cols = _zero_fill_fills(metric_specs)
    f = _ident(b["field"])
    eb = b.get("extended_bounds")
    if eb is not None and (
        not isinstance(eb, dict) or set(eb) != {"min", "max"}
        or not all(isinstance(v, str) for v in eb.values())
    ):
        raise ValueError(
            "es_dsl: extended_bounds wants {min, max} date strings"
        )
    if "fixed_interval" in b:
        if eb:
            raise ValueError(
                "es_dsl: extended_bounds with fixed_interval is "
                "unsupported (calendar intervals only)"
            )
        mi = re.fullmatch(r"(\d+)([smhd])", str(b["fixed_interval"]))
        secs = int(mi.group(1)) * {
            "s": 1, "m": 60, "h": 3600, "d": 86400,
        }[mi.group(2)]
        step = secs * 1000
        axis = (
            f"SELECT explode(sequence(lo, hi, {step})) AS {key} FROM zf_bounds"
            if dialect == "spark"
            else f"SELECT unnest(generate_series(lo, hi, {step}))"
            f" AS {key} FROM zf_bounds"
        )
        bounds = (
            f"SELECT min({key_expr}) AS lo, max({key_expr}) AS hi\n"
            f"  FROM {_ident(index)} WHERE ({where}) AND {f} IS NOT NULL"
        )
    else:
        unit = b.get("calendar_interval", "day")
        n_step, u_step = {
            "day": (1, "day"), "week": (7, "day"),
            "month": (1, "month"), "year": (1, "year"),
        }[unit]
        lo, hi = f"min({key_expr})", f"max({key_expr})"
        if eb:
            # least/greatest ignore NULLs in both dialects, so an empty
            # relation still yields the bounds-only axis (ES: empty
            # buckets are forced across extended_bounds regardless)
            emin = f"cast(date_trunc('{unit}', DATE '{eb['min']}') AS DATE)"
            emax = f"cast(date_trunc('{unit}', DATE '{eb['max']}') AS DATE)"
            lo, hi = f"least({lo}, {emin})", f"greatest({hi}, {emax})"
        bounds = (
            f"SELECT {lo} AS lo, {hi} AS hi\n"
            f"  FROM {_ident(index)} WHERE ({where}) AND {f} IS NOT NULL"
        )
        axis = (
            f"SELECT explode(sequence(lo, hi, interval {n_step} {u_step}))"
            f" AS {key} FROM zf_bounds"
            if dialect == "spark"
            else f"SELECT cast(unnest(generate_series(lo, hi,"
            f" INTERVAL {n_step} {u_step})) AS DATE) AS {key}"
            f" FROM zf_bounds"
        )
    return f"""WITH zf_bounds AS (
  {bounds}
),
zf_axis AS (
  {axis}
),
zf_buckets AS (
  SELECT {key_expr} AS {key}, count(*) AS doc_count{metrics}
  FROM {_ident(index)}
  WHERE ({where}) AND ({key_expr}) IS NOT NULL
  GROUP BY {key_expr}
)
SELECT a.{key} AS {key}, coalesce(b.doc_count, 0) AS doc_count{fill_cols}
FROM zf_axis a LEFT JOIN zf_buckets b ON a.{key} = b.{key}"""


def _compile_auto_date_histogram(
    index: str, b: dict, metrics: str, where: str, key: str, dialect: str
) -> str:
    """ES `auto_date_histogram`: the engine picks the smallest ladder
    interval such that the bucket count cannot exceed `buckets`. The
    span (integer epoch seconds, identical truncation in both
    dialects) is computed in-plan as a 1-row relation and cross-joined
    back as a broadcast constant — two scans of the fact table, the
    honest cost of a data-chosen interval, no driver round-trip. The
    guarantee floor(span/i)+2 <= buckets (worst-case bucket count over
    a half-open span) is enforced as span < (buckets-1)*i. Key is the
    ES epoch-millis bucket key (the fixed_interval discipline); the
    chosen interval is emitted as `interval_secs` on every row, parity
    with the `interval` field of the ES response."""
    bad = set(b) - {"field", "buckets"}
    if bad:
        raise ValueError(
            f"es_dsl: unsupported auto_date_histogram keys {sorted(bad)}"
        )
    f = _ident(b["field"])
    target = int(b.get("buckets", 10))
    if not 2 <= target <= 1000:
        raise ValueError(
            "es_dsl: auto_date_histogram buckets must be in [2, 1000]"
        )
    # integer epoch seconds: Spark unix_timestamp truncates sub-second
    # parts; DuckDB epoch() keeps them — floor to agree exactly
    e = (f"unix_timestamp({f})" if dialect == "spark"
         else f"cast(floor(epoch({f})) AS BIGINT)")
    whens = "\n      ".join(
        f"WHEN span < {(target - 1) * i} THEN {i}" for i in _AUTO_DH_LADDER
    )
    return f"""
WITH espan AS (
  SELECT max({e}) - min({e}) AS span
  FROM {_ident(index)}
  WHERE ({where}) AND {f} IS NOT NULL
),
ival AS (
  SELECT CASE
      {whens}
      ELSE {_AUTO_DH_LADDER[-1] * 10}
    END AS secs
  FROM espan
)
SELECT cast(floor({e} / secs) * secs AS BIGINT) * 1000 AS {key},
       cast(secs AS BIGINT) AS interval_secs,
       count(*) AS doc_count{metrics}
FROM {_ident(index)} CROSS JOIN ival
WHERE ({where}) AND {f} IS NOT NULL
GROUP BY cast(floor({e} / secs) * secs AS BIGINT) * 1000, secs
ORDER BY {key} ASC
"""


def _compile_nested(
    index: str,
    outer_b: dict,
    inner_pair: tuple,
    metrics: str,
    where: str,
    outer_key: str,
    dialect: str,
) -> str:
    """terms -> nested bucket: one two-key aggregation over the
    filtered base (cells), outer terms size applied on TOTAL bucket
    counts (window over the cells, not a second scan), inner buckets
    ordered by their own rule. ES semantics: the outer top-N is chosen
    by doc_count across the whole bucket, then each kept bucket
    reports all its inner buckets.

    Scale shape: ONE partial+final aggregation over (k1, k2) — the
    window ranking runs on the aggregated cells (bucket-cardinality
    rows), never the raw corpus."""
    inner_name, inner_spec = inner_pair
    ikinds = [k for k in inner_spec if k != "aggs"]
    if len(ikinds) != 1 or ikinds[0] not in _BUCKETS:
        raise ValueError("es_dsl: nested sub-agg must be a bucket agg")
    if "min_doc_count" in (inner_spec.get(ikinds[0]) or {}):
        raise ValueError(
            "es_dsl: min_doc_count is supported on top-level buckets only"
        )
    deeper = [
        (n, sp) for n, sp in inner_spec.get("aggs", {}).items()
        if set(sp) & _BUCKETS or "aggs" in sp
    ]
    if deeper:
        if len(deeper) > 1:
            raise ValueError("es_dsl: at most one nested bucket per level")
        if metrics:
            raise ValueError(
                "es_dsl: metrics must sit on the innermost bucket level"
            )
        if [n for n, sp in inner_spec["aggs"].items() if (n, sp) not in deeper]:
            raise ValueError(
                "es_dsl: metrics must sit on the innermost bucket level"
            )
        return _compile_nested3(
            index, outer_b, (inner_name, inner_spec), deeper[0],
            where, outer_key, dialect,
        )
    # metrics live at the LEAF: recompute them from the inner spec
    leaf_metrics: list[str] = []
    for mn, msp in inner_spec.get("aggs", {}).items():
        mk, m = _one(msp, f"sub-agg {mn}")
        if mk not in _METRICS:
            raise ValueError(f"es_dsl: unsupported sub-agg {mk!r}")
        leaf_metrics += _metric_cols(_ident(mn), mk, m, dialect)
    if metrics:
        # ES would compute these per outer bucket; supporting both
        # levels doubles the aggregation shape — reject rather than
        # silently drop
        raise ValueError(
            "es_dsl: metrics must sit on the innermost bucket level"
        )
    mtxt = "" if not leaf_metrics else ",\n         " + ",\n         ".join(
        leaf_metrics
    )
    f1 = _ident(outer_b["field"])
    size1 = int(outer_b.get("size", 10))
    ikind = ikinds[0]
    k2_expr, k2_order = _bucket_key(ikind, inner_spec[ikind], dialect)
    inner_key = f"{inner_name}_key"
    # ES bucket aggs exclude docs missing a key field at EVERY level
    # (also removes the engines' divergent NULL ordering at size cuts)
    guard = f" AND ({f1}) IS NOT NULL AND ({k2_expr}) IS NOT NULL"
    isize = ""
    if ikind == "terms" and "size" in inner_spec[ikind]:
        # joined into the existing WHERE — a second WHERE clause is a
        # parse error (ADVICE r08 finding #1)
        isize = f"  AND r.inner_rank <= {int(inner_spec[ikind]['size'])}\n"
    leaf_cols = "".join(
        ", r." + m.split(" AS ")[-1] for m in leaf_metrics
    )
    return f"""
WITH cells AS (
  SELECT {f1} AS {outer_key}, {k2_expr} AS {inner_key},
         min({k2_order}) AS inner_ord,
         count(*) AS doc_count{mtxt}
  FROM {_ident(index)}
  WHERE ({where}){guard}
  GROUP BY {f1}, {k2_expr}
),
ranked AS (
  SELECT *,
         cast(sum(doc_count) OVER (PARTITION BY {outer_key}) AS BIGINT)
           AS outer_count,
         row_number() OVER (
           PARTITION BY {outer_key}
           ORDER BY doc_count DESC, inner_ord ASC
         ) AS inner_rank
  FROM cells
),
kept AS (
  SELECT {outer_key}, outer_count,
         dense_rank() OVER (ORDER BY outer_count DESC, {outer_key} ASC)
           AS outer_rank
  FROM (SELECT DISTINCT {outer_key}, outer_count FROM ranked)
)
SELECT r.{outer_key}, k.outer_count, r.{inner_key}, r.doc_count{leaf_cols}
FROM ranked r JOIN kept k USING ({outer_key})
WHERE k.outer_rank <= {size1}
{isize}ORDER BY k.outer_count DESC, r.{outer_key} ASC, r.inner_ord ASC,
         r.{inner_key} ASC
"""


def _compile_nested3(
    index: str,
    outer_b: dict,
    mid_pair: tuple,
    leaf_pair: tuple,
    where: str,
    outer_key: str,
    dialect: str,
) -> str:
    """Three bucket levels: terms -> bucket -> bucket, metrics at the
    leaf. Same policy as the two-level shape, applied per level: a
    level's top-N (terms ``size``) is chosen by the bucket's TOTAL
    doc_count within its parent; kept buckets report all their
    children; display order is parent-count-first, then each level's
    own bucket rule (date/histogram keys ascending, range buckets by
    declaration order).

    Scale shape: ONE partial+final aggregation over (k1, k2, k3) —
    every window (per-level totals and ranks) runs on the aggregated
    cells relation (bucket-cardinality rows), never the raw corpus;
    depth adds columns to one shuffle key, not extra shuffles. Depth
    4+ raises (reject, don't guess)."""
    mid_name, mid_spec = mid_pair
    leaf_name, leaf_spec = leaf_pair
    mkinds = [k for k in mid_spec if k != "aggs"]
    lkinds = [k for k in leaf_spec if k != "aggs"]
    if len(mkinds) != 1 or mkinds[0] not in _BUCKETS:
        raise ValueError("es_dsl: nested sub-agg must be a bucket agg")
    if len(lkinds) != 1 or lkinds[0] not in _BUCKETS:
        raise ValueError("es_dsl: nested sub-agg must be a bucket agg")
    if leaf_spec.get("aggs") and any(
        set(sp) & _BUCKETS or "aggs" in sp
        for sp in leaf_spec["aggs"].values()
    ):
        raise ValueError("es_dsl: nesting depth is three bucket levels")
    leaf_metrics = _metric_list(list(leaf_spec.get("aggs", {}).items()), dialect)
    mtxt = "" if not leaf_metrics else ",\n         " + ",\n         ".join(
        leaf_metrics
    )
    leaf_cols = "".join(", " + m.split(" AS ")[-1] for m in leaf_metrics)
    f1 = _ident(outer_b["field"])
    size1 = int(outer_b.get("size", 10))
    mkind, lkind = mkinds[0], lkinds[0]
    e2, o2 = _bucket_key(mkind, mid_spec[mkind], dialect)
    e3, o3 = _bucket_key(lkind, leaf_spec[lkind], dialect)
    k2, k3 = f"{mid_name}_key", f"{leaf_name}_key"
    guards = (
        f" AND ({f1}) IS NOT NULL AND ({e2}) IS NOT NULL"
        f" AND ({e3}) IS NOT NULL"
    )
    s2 = s3 = ""
    if mkind == "terms" and "size" in mid_spec[mkind]:
        s2 = f" AND r2 <= {int(mid_spec[mkind]['size'])}"
    if lkind == "terms" and "size" in leaf_spec[lkind]:
        s3 = f" AND r3 <= {int(leaf_spec[lkind]['size'])}"
    return f"""
WITH cells AS (
  SELECT {f1} AS {outer_key}, {e2} AS {k2}, {e3} AS {k3},
         min({o2}) AS ord2, min({o3}) AS ord3,
         count(*) AS doc_count{mtxt}
  FROM {_ident(index)}
  WHERE ({where}){guards}
  GROUP BY {f1}, {e2}, {e3}
),
win AS (
  SELECT *,
         cast(sum(doc_count) OVER (PARTITION BY {outer_key}) AS BIGINT)
           AS outer_count,
         cast(sum(doc_count) OVER (PARTITION BY {outer_key}, {k2})
           AS BIGINT) AS {mid_name}_count
  FROM cells
),
ranked AS (
  SELECT *,
         dense_rank() OVER (ORDER BY outer_count DESC, {outer_key} ASC)
           AS r1,
         dense_rank() OVER (
           PARTITION BY {outer_key}
           ORDER BY {mid_name}_count DESC, ord2 ASC, {k2} ASC
         ) AS r2,
         row_number() OVER (
           PARTITION BY {outer_key}, {k2}
           ORDER BY doc_count DESC, ord3 ASC, {k3} ASC
         ) AS r3
  FROM win
)
SELECT {outer_key}, outer_count, {k2}, {mid_name}_count, {k3},
       doc_count{leaf_cols}
FROM ranked
WHERE r1 <= {size1}{s2}{s3}
ORDER BY outer_count DESC, {outer_key} ASC, ord2 ASC, {k2} ASC,
         ord3 ASC, {k3} ASC
"""


_COMPOSITE_SOURCES = {"terms", "date_histogram", "histogram"}


def _compile_composite(
    index: str, b: dict, sub: dict, where: str, dialect: str
) -> str:
    """ES `composite` aggregation: the scalable pagination idiom. All
    source-key combinations enumerate in composite sort order; `after`
    resumes strictly after the given key tuple (rendered as an
    order-aware lexicographic predicate, portable to both dialects —
    no row-value comparison needed); docs missing any source key are
    excluded (ES missing_bucket=false default). Metric sub-aggs apply
    per composite bucket.

    Scale shape: ONE partial+final aggregation over the source keys;
    the after-predicate prunes before the sort; top-size is
    TakeOrdered. This is the DSL surface you page a 100 TB bucket
    space with — no deep from/size offset scan."""
    known = {"sources", "size", "after"}
    bad = set(b) - known
    if bad:
        raise ValueError(f"es_dsl: unsupported composite keys {sorted(bad)}")
    sources = b.get("sources")
    if not isinstance(sources, list) or not sources:
        raise ValueError("es_dsl: composite wants a non-empty sources list")
    size = int(b.get("size", 10))
    keys: list[tuple[str, str, str]] = []  # (out name, key expr, asc|desc)
    for s in sources:
        name, spec2 = _one(s, "composite source")
        skind, sbody = _one(spec2, f"composite source {name}")
        if skind not in _COMPOSITE_SOURCES:
            raise ValueError(
                f"es_dsl: unsupported composite source {skind!r}"
            )
        order = sbody.get("order", "asc")
        if order not in ("asc", "desc"):
            raise ValueError(f"es_dsl: bad composite order {order!r}")
        expr, _ = _bucket_key(skind, {k: v for k, v in sbody.items()
                                      if k != "order"}, dialect)
        keys.append((_ident(name), expr, order))
    metric_sql = _metric_list(list(sub.items()), dialect)
    metrics = (
        "" if not metric_sql else ",\n       " + ",\n       ".join(metric_sql)
    )
    sel = ",\n       ".join(f"{e} AS {n}" for n, e, _ in keys)
    group = ", ".join(e for _, e, _ in keys)
    guards = " AND ".join(f"({e}) IS NOT NULL" for _, e, _ in keys)
    order_by = ", ".join(f"{n} {d.upper()}" for n, _, d in keys)
    after_pred = ""
    after = b.get("after")
    if after is not None:
        if set(after) != {n for n, _, _ in keys}:
            raise ValueError(
                "es_dsl: after must name every composite source"
            )
        # The after predicate is a function of the GROUP BY keys alone,
        # so it pushes BELOW the aggregation onto the key expressions:
        # raw rows belonging to already-paged buckets are dropped at
        # the scan, before the shuffle — paging deep into a 100 TB
        # bucket space gets cheaper, not costlier, with every page.
        disj = []
        for i, (n, e, d) in enumerate(keys):
            conj = [
                f"({keys[j][1]}) = {_lit(after[keys[j][0]], dialect)}"
                for j in range(i)
            ]
            conj.append(
                f"({e}) {'>' if d == 'asc' else '<'} "
                f"{_lit(after[n], dialect)}"
            )
            disj.append("(" + " AND ".join(conj) + ")")
        after_pred = "\n    AND (" + "\n         OR ".join(disj) + ")"
    return f"""
SELECT {sel},
       count(*) AS doc_count{metrics}
FROM {_ident(index)}
WHERE ({where}) AND {guards}{after_pred}
GROUP BY {group}
ORDER BY {order_by}
LIMIT {size}
"""


def _compile_filters(
    index: str, b: dict, sub: dict, where: str, key: str, dialect: str,
    id_field: str,
) -> str:
    """ES `filters` aggregation: each named filter is an independent
    bucket (a doc can land in several), with metric sub-aggs per
    bucket. Compiled the percolate way: ONE scan stacks per-row
    matched bucket names into an array, a row-local filter+explode
    fans out (doc, bucket) pairs, then a single GROUP BY — never one
    pass per named filter."""
    named = b.get("filters")
    if not isinstance(named, dict) or not named:
        raise ValueError("es_dsl: filters wants a non-empty name->clause map")
    cases = []
    for name in sorted(named):
        if not re.fullmatch(r"[A-Za-z0-9_\-]+", name):
            raise ValueError(f"es_dsl: bad filters bucket name {name!r}")
        expr = _query_expr(named[name], dialect, id_field)
        cases.append(f"CASE WHEN coalesce({expr}, FALSE) THEN '{name}' END")
    arr = ",\n        " .join(cases)
    if dialect == "spark":
        matched = (
            f"explode(filter(array(\n        {arr}\n      ),"
            " x -> x IS NOT NULL))"
        )
    else:
        matched = (
            f"unnest(list_filter([\n        {arr}\n      ],"
            " x -> x IS NOT NULL))"
        )
    metric_sql = _metric_list(list(sub.items()), dialect)
    metrics = (
        "" if not metric_sql else ",\n       " + ",\n       ".join(metric_sql)
    )
    return f"""
SELECT bucket AS {key}, count(*) AS doc_count{metrics}
FROM (
  SELECT {matched} AS bucket, t.*
  FROM {_ident(index)} t
  WHERE {where}
) m
GROUP BY bucket
ORDER BY {key} ASC
"""


def _compile_top_hits(
    index: str, outer_b: dict, th_pair: tuple, where: str, key: str,
    dialect: str, id_field: str,
) -> str:
    """ES `top_hits` under terms: the top buckets by doc_count, each
    reporting its best N hits by the top_hits sort. `_source` is
    required (the hit payload must be explicit for a stable schema).

    Scale shape: hit ranking is a per-bucket window over the filtered
    scan (partitioned by the bucket key — no global sort); bucket
    selection ranks the AGGREGATED per-bucket counts (tiny relation)
    and joins back, so the global window never sees raw rows."""
    th_name, th_spec = th_pair
    th = th_spec["top_hits"]
    if set(th_spec) != {"top_hits"}:
        raise ValueError("es_dsl: top_hits takes no sibling keys")
    known = {"size", "sort", "_source"}
    bad = set(th) - known
    if bad:
        raise ValueError(f"es_dsl: unsupported top_hits keys {sorted(bad)}")
    cols = th.get("_source")
    if not cols:
        raise ValueError("es_dsl: top_hits requires _source")
    f1 = _ident(outer_b["field"])
    size1 = int(outer_b.get("size", 10))
    hsize = int(th.get("size", 3))
    order: list[str] = []
    for s in th.get("sort", []):
        if isinstance(s, str):
            f, d = s, "asc"
        else:
            f, spec = _one(s, "top_hits sort entry")
            d = spec if isinstance(spec, str) else spec.get("order", "asc")
        if d not in ("asc", "desc"):
            raise ValueError(f"es_dsl: bad sort order {d!r}")
        order.append(f"{_ident(f)} {d.upper()}")
    if id_field not in [o.split()[0] for o in order]:
        order.append(f"{id_field} ASC")
    oby = ", ".join(order)
    src = ", ".join(_ident(c) for c in cols)
    hsrc = ", ".join(f"h.{_ident(c)}" for c in cols)
    return f"""
WITH base AS (
  SELECT * FROM {_ident(index)}
  WHERE ({where}) AND {f1} IS NOT NULL
),
counts AS (
  SELECT {f1} AS bucket_key, count(*) AS doc_count
  FROM base GROUP BY {f1}
),
kept AS (
  SELECT bucket_key, doc_count,
         dense_rank() OVER (ORDER BY doc_count DESC, bucket_key ASC)
           AS bucket_rank
  FROM counts
),
hits AS (
  SELECT {src}, {f1} AS hit_bucket,
         row_number() OVER (PARTITION BY {f1} ORDER BY {oby}) AS hit_rank
  FROM base
)
SELECT k.bucket_key AS {key}, k.doc_count, h.hit_rank, {hsrc}
FROM hits h JOIN kept k ON h.hit_bucket = k.bucket_key
WHERE k.bucket_rank <= {size1} AND h.hit_rank <= {hsize}
ORDER BY k.doc_count DESC, k.bucket_key ASC, h.hit_rank ASC
"""


def _compile_significant_terms(
    index: str, b: dict, where: str, key: str, dialect: str
) -> str:
    """ES significant_terms over an analyzed text field: foreground =
    docs matching the query, background = the whole index; per-token
    DOC frequencies (distinct per doc), JLH score
    ``(fg% - bg%) * (fg% / bg%)`` emitted as the raw IEEE double of
    integer-ratio arithmetic (identical integers -> identical doubles
    in both engines; no rounding to flip).

    Scale shape: two aggregations over the distinct-token stream (one
    filtered), both partial-aggregatable; the join is per-term
    (vocabulary-sized), totals broadcast."""
    f = _ident(b["field"])
    size = int(b.get("size", 10))
    min_dc = int(b.get("min_doc_count", 3))
    te = _tokens_expr(f, dialect)
    if dialect == "spark":
        distinct_w = f"explode(array_distinct({te})) AS w"
    else:
        distinct_w = f"unnest(list_distinct({te})) AS w"
    return f"""
WITH fg_stream AS (
  SELECT {distinct_w} FROM {_ident(index)} WHERE {where}
),
bg_stream AS (
  SELECT {distinct_w} FROM {_ident(index)}
),
fg_df AS (SELECT w, count(*) AS fg FROM fg_stream GROUP BY w),
bg_df AS (SELECT w, count(*) AS bg FROM bg_stream GROUP BY w),
fg_tot AS (SELECT count(*) AS n_fg FROM {_ident(index)} WHERE {where}),
bg_tot AS (SELECT count(*) AS n_bg FROM {_ident(index)})
SELECT w AS {key}, fg AS doc_count, bg AS bg_count,
       ((cast(fg AS DOUBLE) / n_fg) - (cast(bg AS DOUBLE) / n_bg))
         * ((cast(fg AS DOUBLE) / n_fg) / (cast(bg AS DOUBLE) / n_bg))
         AS score
FROM fg_df JOIN bg_df USING (w) CROSS JOIN fg_tot CROSS JOIN bg_tot
WHERE fg >= {min_dc}
  AND (cast(fg AS DOUBLE) / n_fg) > (cast(bg AS DOUBLE) / n_bg)
ORDER BY score DESC, {key} ASC
LIMIT {size}
"""


def _compile_cumulative_cardinality(
    index: str, b: dict, kind: str, cc: tuple[str, dict],
    metric_sql: list[str], sub: dict, where: str, key: str, dialect: str,
) -> str:
    """ES `cumulative_cardinality`: how many DISTINCT values have been
    seen up to each bucket — "total unique users to date". EXACT here
    (ES chains HLL sketches): each value contributes at its FIRST
    bucket (one value-keyed aggregation), first-occurrence counts sum
    cumulatively over the bucket axis. Scale shape: the firsts relation
    is distinct-value-sized and collapses to bucket-cardinality before
    the join; the window runs on bucket rows. buckets_path must name a
    sibling `cardinality` agg — that is where the field comes from,
    exactly as in ES."""
    name, spec = cc
    p = spec["cumulative_cardinality"]
    if set(spec) != {"cumulative_cardinality"}:
        raise ValueError(
            "es_dsl: cumulative_cardinality takes no sibling keys"
        )
    bad = set(p) - {"buckets_path"}
    if bad:
        raise ValueError(
            f"es_dsl: unsupported cumulative_cardinality keys "
            f"{sorted(bad)}"
        )
    path = p.get("buckets_path")
    card = sub.get(path, {})
    if not isinstance(card, dict) or "cardinality" not in card:
        raise ValueError(
            f"es_dsl: cumulative_cardinality buckets_path {path!r} "
            "must name a sibling cardinality agg"
        )
    f = _ident(card["cardinality"]["field"])
    key_expr, _ = _bucket_key(kind, b, dialect)
    mdc = int(b.get("min_doc_count", 1))
    if mdc != 1:
        raise ValueError(
            "es_dsl: cumulative_cardinality with min_doc_count != 1 "
            "is unsupported (a filtered axis would skip first-"
            "occurrence buckets)"
        )
    metrics = (
        "" if not metric_sql else ",\n       " + ",\n       ".join(metric_sql)
    )
    n = _ident(name)
    return f"""
WITH base AS (
  SELECT {key_expr} AS {key}, count(*) AS doc_count{metrics}
  FROM {_ident(index)}
  WHERE ({where}) AND ({key_expr}) IS NOT NULL
  GROUP BY {key_expr}
),
firsts AS (
  SELECT min({key_expr}) AS k
  FROM {_ident(index)}
  WHERE ({where}) AND ({key_expr}) IS NOT NULL AND {f} IS NOT NULL
  GROUP BY {f}
),
inc AS (
  SELECT k, count(*) AS new_vals FROM firsts GROUP BY k
)
SELECT b.*,
       cast(sum(coalesce(i.new_vals, 0)) OVER (
         ORDER BY b.{key} ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS {n}
FROM base b LEFT JOIN inc i ON i.k = b.{key}
ORDER BY b.{key} ASC
"""


def _compile_adjacency_matrix(
    index: str, b: dict, where: str, key: str, dialect: str,
    id_field: str,
) -> str:
    """ES adjacency_matrix: N named filters -> one bucket per filter
    plus one per pairwise intersection (key "a&b", names sorted), only
    non-empty buckets returned, ordered by key. Compiled as ONE scan:
    every bucket is a conditional count in a single aggregate row, then
    K row-local SELECTs over that 1-row relation unpivot it — bucket
    count is K = N + N(N-1)/2, never data-sized, and the fact table is
    read once regardless of N."""
    bad = set(b) - {"filters", "separator"}
    if bad:
        raise ValueError(
            f"es_dsl: unsupported adjacency_matrix keys {sorted(bad)}"
        )
    filters = b.get("filters")
    if not isinstance(filters, dict) or len(filters) < 2:
        raise ValueError(
            "es_dsl: adjacency_matrix wants >= 2 named filters"
        )
    sep = b.get("separator", "&")
    if not isinstance(sep, str) or "'" in sep or "\\" in sep:
        raise ValueError(f"es_dsl: bad adjacency_matrix separator {sep!r}")
    names = sorted(filters)
    conds = {
        n: f"coalesce({_query_expr(filters[n], dialect, id_field)}, FALSE)"
        for n in names
    }
    sums, rows = [], []
    for i, a in enumerate(names):
        label = a.replace("'", "''")
        sums.append(f"sum(CASE WHEN {conds[a]} THEN 1 ELSE 0 END) AS c{i}")
        # cast: DuckDB widens sum(CASE) to HUGEINT; the driver hash
        # needs BIGINT in both engines
        rows.append(
            f"SELECT '{label}' AS {key}, cast(c{i} AS BIGINT)"
            " AS doc_count FROM agg"
        )
        for j in range(i + 1, len(names)):
            pair = f"{a}{sep}{names[j]}".replace("'", "''")
            sums.append(
                f"sum(CASE WHEN {conds[a]} AND {conds[names[j]]} "
                f"THEN 1 ELSE 0 END) AS c{i}_{j}"
            )
            rows.append(
                f"SELECT '{pair}' AS {key}, cast(c{i}_{j} AS BIGINT)"
                " AS doc_count FROM agg"
            )
    sums_sql = ",\n         ".join(sums)
    union = "\n  UNION ALL ".join(rows)
    return f"""
WITH agg AS (
  SELECT {sums_sql}
  FROM {_ident(index)}
  WHERE {where}
)
SELECT {key}, doc_count FROM (
  {union}
) buckets
WHERE doc_count > 0
ORDER BY {key} ASC
"""


# --- percolate (reverse search: stored queries match incoming docs) ----------


def compile_rank_eval(
    index: str, body: dict, dialect: str, id_field: str = "doc_id",
) -> str:
    """ES `_rank_eval`: score a set of search requests against human
    relevance ratings — the relevance-tuning feedback loop. Each
    request's scored hits (the standard BM25 top-k) LEFT JOIN a
    VALUES ratings relation, and the chosen metric computes per
    request: precision@k (relevant = rating >= threshold),
    mean_reciprocal_rank (1/rank of the first relevant hit, 0 when
    none), or dcg ((2^rating - 1) / log2(rank + 1), the ES default
    gain). One statement, one UNION ALL arm per request; every arm is
    the ordinary scored plan plus a broadcast-sized ratings join —
    evaluating 100 queries costs 100 top-k searches, never more."""
    bad = set(body) - {"requests", "metric"}
    if bad:
        raise ValueError(f"es_dsl: unsupported rank_eval keys {sorted(bad)}")
    reqs = body.get("requests")
    if not isinstance(reqs, list) or not reqs:
        raise ValueError("es_dsl: rank_eval wants a requests list")
    mkind, m = _one(body.get("metric", {}), "rank_eval metric")
    known_m = {
        "precision": {"k", "relevant_rating_threshold"},
        "mean_reciprocal_rank": {"k", "relevant_rating_threshold"},
        "dcg": {"k"},
    }
    if mkind not in known_m:
        raise ValueError(
            f"es_dsl: unsupported rank_eval metric {mkind!r} "
            "(precision/mean_reciprocal_rank/dcg)"
        )
    if not isinstance(m, dict) or set(m) - known_m[mkind]:
        raise ValueError(
            f"es_dsl: unsupported {mkind} keys "
            f"{sorted(set(m) - known_m[mkind])}"
        )
    k = int(m.get("k", 10))
    thr = int(m.get("relevant_rating_threshold", 1))
    if k < 1:
        raise ValueError("es_dsl: rank_eval k must be >= 1")
    arms = []
    for i, req in enumerate(reqs):
        if not isinstance(req, dict) or set(req) != {
            "id", "request", "ratings",
        }:
            raise ValueError(
                "es_dsl: each rank_eval request wants {id, request, "
                "ratings}"
            )
        rid = req["id"]
        if not isinstance(rid, str) or not _IDENTISH.fullmatch(rid):
            raise ValueError(f"es_dsl: bad rank_eval request id {rid!r}")
        search = dict(req["request"])
        if set(search) - {"query"}:
            raise ValueError(
                "es_dsl: rank_eval requests carry {query} only "
                "(k comes from the metric)"
            )
        search["size"] = k
        search["_source"] = False
        inner = compile_search(index, search, dialect, id_field)
        ratings = req["ratings"]
        if not isinstance(ratings, list) or not ratings:
            raise ValueError("es_dsl: rank_eval ratings must be non-empty")
        vals = []
        for r in ratings:
            if not isinstance(r, dict) or set(r) != {"_id", "rating"}:
                raise ValueError(
                    "es_dsl: ratings entries want {_id, rating}"
                )
            if not isinstance(r["rating"], int) or isinstance(
                r["rating"], bool
            ):
                raise ValueError("es_dsl: ratings must be ints")
            vals.append(f"({_lit(r['_id'], dialect)}, {r['rating']})")
        if mkind == "precision":
            metric = (
                f"sum(CASE WHEN rating >= {thr} THEN 1 ELSE 0 END)"
                f" / cast({k} AS double)"
            )
        elif mkind == "mean_reciprocal_rank":
            # cast(1 AS double): Spark parses 1.0 as DECIMAL and would
            # emit a DECIMAL score (DuckDB emits double)
            metric = (
                f"coalesce(cast(1 AS double) / min(CASE WHEN rating"
                f" >= {thr} THEN rnk END), cast(0 AS double))"
            )
        else:
            metric = (
                "coalesce(sum((power(2, rating) - 1)"
                " / log2(rnk + 1)), 0.0)"
            )
        arms.append(f"""SELECT '{rid}' AS request_id,
       round({metric}, 6) AS metric_score
FROM (
  SELECT row_number() OVER (ORDER BY _score DESC, {id_field} ASC)
           AS rnk,
         coalesce(rt.rating, 0) AS rating
  FROM ({inner}) h
  LEFT JOIN (VALUES {', '.join(vals)}) AS rt(_id, rating)
    ON rt._id = h.{id_field}
) g{i}""")
    union = "\nUNION ALL\n".join(arms)
    return f"SELECT * FROM (\n{union}\n) rq\nORDER BY request_id ASC"


_IDENTISH = re.compile(r"[A-Za-z0-9_.-]+")


def compile_percolate(
    index: str,
    queries: dict[str, dict],
    dialect: str,
    id_field: str = "doc_id",
) -> str:
    """The ES percolator, inverted-index-free: N stored query bodies
    (query context only) evaluate against every row in ONE scan — each
    query compiles to a boolean expression, the expressions stack into
    an array of matched query ids, and a row-local filter+explode
    emits (doc id, query_id) pairs. Alerting/routing semantics
    (ES `percolate` query) without a second pass per stored query.

    Scale shape: one corpus scan regardless of N stored queries; the
    per-row work is N predicate evaluations (map-side, codegen'd); no
    join, no shuffle before the final order. At 10k+ stored queries
    you'd shard the predicate array, not the scan."""
    if not queries:
        raise ValueError("es_dsl: percolate needs at least one stored query")
    cases = []
    for qid in sorted(queries):
        if not re.fullmatch(r"[A-Za-z0-9_\-]+", qid):
            raise ValueError(f"es_dsl: bad percolate query id {qid!r}")
        expr = _query_expr(queries[qid], dialect, id_field)
        cases.append(
            f"CASE WHEN coalesce({expr}, FALSE) THEN '{qid}' END"
        )
    arr = ",\n      ".join(cases)
    if dialect == "spark":
        matched = (
            f"explode(filter(array(\n      {arr}\n    ), x -> x IS NOT NULL))"
        )
    else:
        matched = (
            f"unnest(list_filter([\n      {arr}\n    ], x -> x IS NOT NULL))"
        )
    return f"""
SELECT {id_field}, {matched} AS query_id
FROM {_ident(index)}
ORDER BY {id_field}, query_id
"""


PERCOLATE_QUERIES = {
    "long_english": {"bool": {"filter": [
        {"term": {"lang": "en"}},
        {"range": {"n_chars": {"gte": 400}}},
    ]}},
    "mentions_merge": {"match": {"text": "merge"}},
    "scan_phrase": {"match_phrase": {"text": "table scan"}},
    "short_or_zh": {"bool": {"should": [
        {"range": {"n_chars": {"lt": 100}}},
        {"term": {"lang": "zh"}},
    ]}},
}


# --- registered entries ------------------------------------------------------
#
# The same JSON a reference user sends to `POST /index/_search`,
# executed by Catalyst; the oracle is the identical body compiled for
# DuckDB (semantics pinned separately by unit tests on hand-derived
# rows — tests/test_es_dsl.py).

BOOL_FILTER_BODY = {
    "query": {
        "bool": {
            "must": [{"match": {"text": "table scan"}}],
            "filter": [
                {"term": {"lang": "en"}},
                {"range": {"n_chars": {"gte": 100, "lt": 450}}},
            ],
            "must_not": [{"prefix": {"source": "src1"}}],
        }
    },
    "sort": [{"n_chars": {"order": "desc"}}],
    "size": 25,
    "_source": ["doc_id", "lang", "source", "n_chars"],
}

SHOULD_MSM_BODY = {
    "query": {
        "bool": {
            "should": [
                {"match_phrase": {"text": "value table"}},
                {"wildcard": {"source": "src?9"}},
                {"terms": {"lang": ["de", "fr"]}},
            ],
            "minimum_should_match": 2,
        }
    },
    "sort": [{"doc_id": "asc"}],
    "size": 50,
    "_source": ["doc_id", "lang", "source"],
}

TERMS_AGG_BODY = {
    "query": {"range": {"ts": {"gte": "2024-01-10"}}},
    "aggs": {
        "by_type": {
            "terms": {"field": "event_type", "size": 10},
            "aggs": {"v": {"stats": {"field": "value"}}},
        }
    },
}

DATE_HISTO_BODY = {
    "query": {"term": {"event_type": "purchase"}},
    "aggs": {
        "daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {
                "v_avg": {"avg": {"field": "value"}},
                "users": {"cardinality": {"field": "user_id"}},
            },
        }
    },
}

NESTED_AGG_BODY = {
    "query": {"range": {"ts": {"gte": "2024-01-05"}}},
    "aggs": {
        "by_type": {
            "terms": {"field": "event_type", "size": 3},
            "aggs": {
                "daily": {
                    "date_histogram": {"field": "ts", "calendar_interval": "week"},
                    "aggs": {"v": {"avg": {"field": "value"}}},
                }
            },
        }
    },
}

SIG_TERMS_BODY = {
    "query": {"term": {"lang": "en"}},
    "aggs": {"sig": {"significant_terms": {"field": "text", "size": 10}}},
}

COLLAPSE_BODY = {
    "query": {"range": {"n_chars": {"gte": 100}}},
    "collapse": {"field": "lang"},
    "sort": [{"n_chars": {"order": "desc"}}],
    "_source": ["doc_id", "lang", "source", "n_chars"],
    "size": 10,
}

KNN_BODY = {
    "knn": {
        "field": "embedding",
        # exact 1-dp decimals: identical literals in both dialects
        "query_vector": [((i * 37) % 19 - 9) / 10.0 for i in range(64)],
        "k": 15,
        "num_candidates": 100,  # ES HNSW knob; exact scan ignores it
        "filter": {"range": {"vec_id": {"lt": 400}}},
    }
}

MATCH_SCORED_BODY = {
    # bare match, no sort: ES query context -> BM25 _score ordering
    "query": {"match": {"text": "table scan fast"}},
    "size": 25,
    "_source": ["doc_id", "lang", "n_chars"],
}

MULTI_MATCH_BODY = {
    "query": {"multi_match": {
        "query": "merge value batch",
        "fields": ["text", "source"],
        "type": "most_fields",
    }},
    "size": 20,
}

COMPOSITE_AFTER_BODY = {
    "aggs": {"pages": {
        "composite": {
            "sources": [
                {"etype": {"terms": {"field": "event_type"}}},
                {"day": {"date_histogram": {"field": "ts",
                                            "calendar_interval": "day"}}},
            ],
            "size": 15,
            # resume strictly after this key tuple — the scalable
            # pagination idiom (no deep from/size offset)
            "after": {"etype": "purchase", "day": "2024-01-05"},
        },
        "aggs": {"v_sum": {"sum": {"field": "value"}}},
    }},
}

NESTED3_BODY = {
    "query": {"range": {"ts": {"gte": "2024-01-03"}}},
    "aggs": {"by_type": {
        "terms": {"field": "event_type", "size": 3},
        "aggs": {"weekly": {
            "date_histogram": {"field": "ts", "calendar_interval": "week"},
            "aggs": {"band": {
                "histogram": {"field": "value", "interval": 25},
                "aggs": {"v": {"avg": {"field": "value"}}},
            }},
        }},
    }},
}

FILTERS_AGG_BODY = {
    "aggs": {"segments": {
        "filters": {"filters": {
            "short": {"range": {"n_chars": {"lt": 150}}},
            "english": {"term": {"lang": "en"}},
            "merge-docs": {"match": {"text": "merge"}},
        }},
        "aggs": {"chars": {"avg": {"field": "n_chars"}}},
    }},
}

TOP_HITS_BODY = {
    "query": {"range": {"n_chars": {"gte": 50}}},
    "aggs": {"by_lang": {
        "terms": {"field": "lang", "size": 3},
        "aggs": {"top": {"top_hits": {
            "size": 2,
            "sort": [{"n_chars": {"order": "desc"}}],
            "_source": ["doc_id", "source", "n_chars"],
        }}},
    }},
}

PIPELINE_AGG_BODY = {
    "query": {"term": {"event_type": "purchase"}},
    "aggs": {"daily": {
        "date_histogram": {"field": "ts", "calendar_interval": "day"},
        "aggs": {
            "v_sum": {"sum": {"field": "value"}},
            "v_cum": {"cumulative_sum": {"buckets_path": "v_sum"}},
            "v_diff": {"derivative": {"buckets_path": "v_sum"}},
            "n_cum": {"cumulative_sum": {"buckets_path": "_count"}},
        },
    }},
}

MATCH_AND_BODY = {
    # operator: and — every analyzed term required; still BM25-scored
    "query": {"match": {"text": {"query": "table scan", "operator": "and"}}},
    "size": 20,
}

FUZZY_BODY = {
    # 'scna' is one transposition (two substitutions) from 'scan';
    # AUTO on a 4-char term allows 1 edit, so pin fuzziness: 2
    "query": {"fuzzy": {"text": {"value": "scna", "fuzziness": 2}}},
    "sort": [{"doc_id": "asc"}],
    "size": 30,
    "_source": ["doc_id", "lang", "n_chars"],
}

SEARCH_AFTER_BODY = {
    # deep pagination: resume strictly after (n_chars=350, doc_id=123)
    "query": {"term": {"lang": "en"}},
    "sort": [{"n_chars": {"order": "desc"}}],
    "search_after": [350, 123],
    "size": 20,
    "_source": ["doc_id", "n_chars"],
}

SIBLING_PIPELINE_BODY = {
    "query": {"term": {"event_type": "purchase"}},
    "aggs": {
        "daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"v_sum": {"sum": {"field": "value"}}},
        },
        # sibling pipelines: one scalar each over daily's buckets,
        # rendered as constant columns beside the buckets
        "avg_daily": {"avg_bucket": {"buckets_path": "daily>v_sum"}},
        "max_daily": {"max_bucket": {"buckets_path": "daily>v_sum"}},
        "total_docs": {"sum_bucket": {"buckets_path": "daily>_count"}},
    },
}

EXTENDED_STATS_BODY = {
    "query": {"range": {"ts": {"gte": "2024-01-04"}}},
    "aggs": {"by_type": {
        "terms": {"field": "event_type", "size": 5},
        "aggs": {"v": {"extended_stats": {"field": "value"}}},
    }},
}

TERMS_ORDER_BODY = {
    # buckets ordered by a sibling metric, not doc_count — the ES
    # terms `order` parameter
    "aggs": {"by_type": {
        "terms": {"field": "event_type", "size": 4,
                  "order": {"v_avg": "desc"}},
        "aggs": {"v_avg": {"avg": {"field": "value"}}},
    }},
}

MATCH_PHRASE_PREFIX_BODY = {
    # adjacency with the last term as a prefix: 'table sc' hits
    # 'table scan', 'table scans', ...
    "query": {"match_phrase_prefix": {"text": "table sc"}},
    "sort": [{"doc_id": "asc"}],
    "size": 40,
    "_source": ["doc_id", "lang", "n_chars"],
}

FIXED_INTERVAL_BODY = {
    "query": {"term": {"event_type": "click"}},
    "aggs": {"h6": {
        "date_histogram": {"field": "ts", "fixed_interval": "6h",
                           "min_doc_count": 2},
        "aggs": {"v_sum": {"sum": {"field": "value"}}},
    }},
}

PRANKS_WAVG_BODY = {
    "query": {"range": {"ts": {"gte": "2024-01-03"}}},
    "aggs": {"by_type": {
        "terms": {"field": "event_type", "size": 4},
        "aggs": {
            "ranks": {"percentile_ranks": {
                "field": "value", "values": [25.0, 50.0, 90.0],
            }},
            "wavg": {"weighted_avg": {
                "value": {"field": "value"},
                "weight": {"field": "user_id"},
            }},
        },
    }},
}

BUCKET_SELECTOR_BODY = {
    # the Kibana HAVING idiom: keep only event types whose average
    # value clears a threshold — bucket_selector over terms buckets
    "aggs": {"by_type": {
        "terms": {"field": "event_type", "size": 10},
        "aggs": {
            "v_avg": {"avg": {"field": "value"}},
            "keep": {"bucket_selector": {
                "buckets_path": {"a": "v_avg", "c": "_count"},
                "script": "params.a > 49 && params.c > 10",
            }},
        },
    }},
}

BUCKET_SCRIPT_BODY = {
    # derived per-bucket metric (sum/count scaled) COMPOSED with a
    # window pipeline (cumulative_sum) — scripts layer over the
    # pipeline-wrapped bucket relation
    "query": {"term": {"event_type": "purchase"}},
    "aggs": {"daily": {
        "date_histogram": {"field": "ts", "calendar_interval": "week"},
        "aggs": {
            "v_sum": {"sum": {"field": "value"}},
            "running": {"cumulative_sum": {"buckets_path": "v_sum"}},
            "per_doc_pct": {"bucket_script": {
                "buckets_path": {"s": "v_sum", "c": "_count"},
                "script": "(params.s / params.c) * 100",
            }},
        },
    }},
}

MATCH_HIGHLIGHT_BODY = {
    # hits + highlights from ONE body, ES-style: BM25-scored match with
    # first-occurrence <em> snippets computed on the top-k relation
    "query": {"match": {"text": "table scan fast"}},
    "size": 15,
    "_source": ["doc_id", "lang"],
    "highlight": {"fields": {"text": {}}},
}

MULTI_TERMS_BODY = {
    # compound-key terms without composite's pagination semantics
    "query": {"range": {"n_chars": {"gte": 100}}},
    "aggs": {"by_lang_src": {
        "multi_terms": {
            "terms": [{"field": "lang"}, {"field": "source"}],
            "size": 12,
            "min_doc_count": 2,
        },
        "aggs": {"chars_avg": {"avg": {"field": "n_chars"}}},
    }},
}

AUTO_DATE_HISTOGRAM_BODY = {
    # data-chosen interval: 30 days of purchases under a 12-bucket
    # target resolves to weekly buckets via the fixed ladder
    "query": {"term": {"event_type": "purchase"}},
    "aggs": {"auto": {
        "auto_date_histogram": {"field": "ts", "buckets": 12},
        "aggs": {"v_avg": {"avg": {"field": "value"}}},
    }},
}

RARE_TERMS_BODY = {
    # the long tail: document lengths seen at most twice among long docs
    "query": {"range": {"n_chars": {"gte": 300}}},
    "aggs": {"rare_len": {
        "rare_terms": {"field": "n_chars", "max_doc_count": 2},
    }},
}

DATE_RANGE_BODY = {
    # calendar reporting periods with ES from-inclusive/to-exclusive
    # edges and an explicit key label on one bucket
    "query": {"term": {"event_type": "signup"}},
    "aggs": {"period": {
        "date_range": {"field": "ts", "ranges": [
            {"to": "2024-01-08"},
            {"from": "2024-01-08", "to": "2024-01-16"},
            {"from": "2024-01-16", "to": "2024-01-24", "key": "wk3"},
            {"from": "2024-01-24"},
        ]},
        "aggs": {"v_avg": {"avg": {"field": "value"}}},
    }},
}

SERIAL_DIFF_MOVING_BODY = {
    # the time-series smoothing idioms: week-over-week serial_diff and
    # 7-bucket moving average / moving doc-count sum
    "query": {"term": {"event_type": "view"}},
    "aggs": {"daily": {
        "date_histogram": {"field": "ts", "calendar_interval": "day"},
        "aggs": {
            "v_sum": {"sum": {"field": "value"}},
            "wow": {"serial_diff": {"buckets_path": "v_sum", "lag": 7}},
            "ma7": {"moving_fn": {
                "buckets_path": "v_sum", "window": 7,
                "script": "MovingFunctions.unweightedAvg(values)",
            }},
            "docs7": {"moving_fn": {
                "buckets_path": "_count", "window": 7, "shift": 1,
                "script": "MovingFunctions.sum(values)",
            }},
        },
    }},
}

STATS_BUCKET_BODY = {
    # sibling stats over the parent's buckets: the per-day average's
    # spread, and the per-day doc_count's spread, in one response
    "query": {"term": {"event_type": "error"}},
    "aggs": {
        "daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"v_avg": {"avg": {"field": "value"}}},
        },
        "day_stats": {"stats_bucket": {"buckets_path": "daily>v_avg"}},
        "day_docs": {"stats_bucket": {"buckets_path": "daily>_count"}},
    },
}

TERMS_INCLUDE_BODY = {
    # include regex (Lucene full-match) + exclude list on the bucket
    # key, pushed into the WHERE below the aggregation
    "query": {"range": {"n_chars": {"gte": 50}}},
    "aggs": {"langs": {
        "terms": {"field": "lang", "size": 10,
                  "include": "(en|de|fr|es)", "exclude": ["es"]},
        "aggs": {"chars_avg": {"avg": {"field": "n_chars"}}},
    }},
}

HISTOGRAM_OFFSET_BODY = {
    # offset-shifted numeric buckets: floor((x-off)/step)*step + off
    "query": {"term": {"event_type": "click"}},
    "aggs": {"v_hist": {
        "histogram": {"field": "value", "interval": 50, "offset": 10},
        "aggs": {"n_users": {"cardinality": {"field": "user_id"}}},
    }},
}

REGEXP_BODY = {
    # Lucene full-match regexp on a keyword-ish field
    "query": {"regexp": {"source": "src1[0-9]"}},
    "sort": [{"doc_id": "asc"}],
    "size": 120,
    "_source": ["doc_id", "source", "lang"],
}

TERMS_SET_BODY = {
    # "all 3 of these terms": the dynamic minimum_should_match
    # query, here with the literal-integer script constant
    "query": {"terms_set": {"text": {
        "terms": ["spark", "vector", "stream"],
        "minimum_should_match_script": {"source": "3"},
    }}},
    "sort": [{"doc_id": "asc"}],
    "size": 200,
    "_source": ["doc_id", "lang", "n_chars"],
}

SIMPLE_QUERY_STRING_BODY = {
    # the Kibana search bar's safe dialect: | + - "phrase" trailing-*
    "query": {"simple_query_string": {
        "query": '(spark | vector) + "table scan" + -slow*',
        "fields": ["text"],
        "default_operator": "and",
    }},
    "sort": [{"doc_id": "asc"}],
    "size": 200,
    "_source": ["doc_id", "lang", "source"],
}

QUERY_STRING_BODY = {
    # the full Lucene search-bar syntax: field:term, field groups,
    # phrases, [lo TO hi} ranges, comparison shorthand, NOT, wildcards
    "query": {"query_string": {
        "query": (
            'lang:(en OR fr) AND (text:"hash join" OR text:vector) '
            "AND n_chars:[150 TO 450} AND NOT source:src1*"
        ),
        "default_field": "text",
    }},
    "sort": [{"doc_id": "asc"}],
    "size": 200,
    "_source": ["doc_id", "lang", "source", "n_chars"],
}

STRING_STATS_BOXPLOT_BODY = {
    # per-language field-length profile + five-number summary
    "aggs": {"by_lang": {
        "terms": {"field": "lang", "size": 10},
        "aggs": {
            "src_len": {"string_stats": {"field": "source"}},
            "chars_box": {"boxplot": {"field": "n_chars"}},
        },
    }},
    "size": 0,
}

RATE_BODY = {
    # "events per hour" on a 6-hour axis: value rate + doc-count rate
    "query": {"term": {"event_type": "click"}},
    "aggs": {"by6h": {
        "date_histogram": {"field": "ts", "fixed_interval": "6h"},
        "aggs": {
            "value_per_hour": {"rate": {"field": "value", "unit": "hour"}},
            "docs_per_hour": {"rate": {"unit": "hour"}},
        },
    }},
    "size": 0,
}

MAD_BODY = {
    # robust per-language dispersion of document length
    "aggs": {"by_lang": {
        "terms": {"field": "lang", "size": 10},
        "aggs": {"mad_chars": {
            "median_absolute_deviation": {"field": "n_chars"},
        }},
    }},
    "size": 0,
}

NORMALIZE_BODY = {
    # per-language share-of-corpus and rescaled doc counts
    "aggs": {"by_lang": {
        "terms": {"field": "lang", "size": 10},
        "aggs": {
            "total_chars": {"sum": {"field": "n_chars"}},
            "chars_pct": {"normalize": {
                "buckets_path": "total_chars",
                "method": "percent_of_sum",
            }},
            "docs_scaled": {"normalize": {
                "buckets_path": "_count", "method": "rescale_0_100",
            }},
        },
    }},
    "size": 0,
}

BUCKET_SORT_BODY = {
    # "top 3 event types by average value, skipping the biggest":
    # sort + from + size on the returned buckets
    "aggs": {"by_type": {
        "terms": {"field": "event_type", "size": 100},
        "aggs": {
            "v_avg": {"avg": {"field": "value"}},
            "top3": {"bucket_sort": {
                "sort": [{"v_avg": {"order": "desc"}}],
                "from": 1, "size": 3,
            }},
        },
    }},
    "size": 0,
}

PERCENTILES_BUCKET_BODY = {
    # distribution of daily click volume across the month
    "query": {"term": {"event_type": "click"}},
    "aggs": {
        "daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"v_sum": {"sum": {"field": "value"}}},
        },
        "day_pct": {"percentiles_bucket": {
            "buckets_path": "daily>v_sum", "percents": [25, 50, 75, 99],
        }},
    },
    "size": 0,
}

ADJACENCY_MATRIX_BODY = {
    # co-occurrence counts of three audience segments in one scan
    "aggs": {"segments": {"adjacency_matrix": {"filters": {
        "english": {"term": {"lang": "en"}},
        "long": {"range": {"n_chars": {"gte": 300}}},
        "spark_docs": {"match": {"text": "spark"}},
    }}}},
    "size": 0,
}

SAMPLER_BODY = {
    # profile a bounded sample instead of the full match set
    "query": {"term": {"lang": "en"}},
    "aggs": {"sample": {
        "sampler": {"shard_size": 150},
        "aggs": {
            "chars_avg": {"avg": {"field": "n_chars"}},
            "n_sources": {"cardinality": {"field": "source"}},
        },
    }},
    "size": 0,
}

DIVERSIFIED_SAMPLER_BODY = {
    # the same profile with a per-language diversity cap
    "aggs": {"sample": {
        "diversified_sampler": {
            "field": "lang", "max_docs_per_value": 25, "shard_size": 100,
        },
        "aggs": {
            "chars_avg": {"avg": {"field": "n_chars"}},
            "langs": {"cardinality": {"field": "lang"}},
        },
    }},
    "size": 0,
}

SIGNIFICANT_TEXT_BODY = {
    # tokens over-represented in English docs vs the whole corpus
    "query": {"term": {"lang": "en"}},
    "aggs": {"sig": {"significant_text": {
        "field": "text", "min_doc_count": 3, "size": 10,
    }}},
    "size": 0,
}

FUNCTION_SCORE_BODY = {
    # "relevant AND popular": BM25 over the match, multiplied by a
    # log1p-damped document-length factor — the ES boosting idiom
    "query": {"function_score": {
        "query": {"match": {"text": "table scan fast"}},
        "field_value_factor": {
            "field": "n_chars", "modifier": "log1p", "factor": 0.01,
        },
        "boost_mode": "multiply",
    }},
    "size": 20,
    "_source": ["doc_id", "lang", "n_chars"],
}

FS_DECAY_BODY = {
    # "relevant AND recent": BM25 over the match, exp-decayed by the
    # event's age from an explicit origin (never "now" — deterministic
    # origins are what make recency boosting oracle-checkable). The
    # decay constants fold to literals at compile time, so the curve
    # is identical IEEE arithmetic in both engines.
    "query": {"function_score": {
        "query": {"match": {"event_type": "click"}},
        "exp": {"ts": {
            "origin": "2024-06-01 00:00:00", "scale": "30d",
            "decay": 0.5,
        }},
    }},
    "size": 25,
    "_source": ["event_id", "ts"],
}

FS_FUNCTIONS_BODY = {
    # the full function_score shape real relevance-tuning bodies use:
    # a functions array where each entry is gated by a filter and
    # weighted, combined by score_mode, capped by max_boost, applied
    # by boost_mode — "boost English docs near the target length,
    # slightly prefer shorter docs everywhere"
    "query": {"function_score": {
        "query": {"match": {"text": "table scan fast"}},
        "functions": [
            {"filter": {"term": {"lang": "en"}}, "weight": 2,
             "linear": {"n_chars": {
                 "origin": 400, "scale": 400, "decay": 0.5,
             }}},
            {"exp": {"n_chars": {"origin": 0, "scale": 1000}},
             "weight": 0.5},
        ],
        "score_mode": "sum",
        "boost_mode": "multiply",
        "max_boost": 3,
    }},
    "size": 20,
    "_source": ["doc_id", "lang", "n_chars"],
}

SCRIPT_SCORE_BODY = {
    # custom ranking formula: saturation-damped length prior times the
    # BM25 score, written in the Painless-lite expression grammar
    # (doc[...] refs + params + _score); min_score drops the tail
    "query": {"function_score": {
        "query": {"match": {"text": "table scan"}},
        "script_score": {"script": {
            "source": "_score * (params.w / (params.w"
                      " + doc['n_chars'].value))",
            "params": {"w": 500},
        }},
        "boost_mode": "replace",
        "min_score": 0.1,
    }},
    "size": 20,
    "_source": ["doc_id", "n_chars"],
}

RANDOM_SCORE_BODY = {
    # seeded deterministic shuffle of the match hits — ES's A/B-test /
    # result-rotation idiom; the engine renders it over its
    # md5-uniform primitive so the permutation is cross-engine stable
    "query": {"function_score": {
        "query": {"match": {"text": "table"}},
        "random_score": {"seed": 42, "field": "doc_id"},
        "boost_mode": "replace",
    }},
    "size": 15,
    "_source": ["doc_id"],
}

RANK_FEATURE_BODY = {
    # static-signal ranking: saturation-damped document length with an
    # EXPLICIT pivot (the ES default pivot is a corpus statistic —
    # non-deterministic under ingestion, so this compiler requires it)
    "query": {"rank_feature": {
        "field": "n_chars",
        "saturation": {"pivot": 500},
        "boost": 2,
    }},
    "size": 15,
    "_source": ["doc_id", "n_chars"],
}

DISTANCE_FEATURE_BODY = {
    # freshness ranking: nearest events to an explicit instant, scored
    # pivot/(pivot+|ts-origin|) over microsecond-exact epochs
    "query": {"distance_feature": {
        "field": "ts",
        "origin": "2024-01-15 12:00:00",
        "pivot": "12h",
    }},
    "size": 12,
    "_source": ["event_id", "ts"],
}

COMBINED_FIELDS_BODY = {
    # term-centric BM25 over text+source merged into ONE synthetic
    # field (tf and length SUM across fields before scoring — the
    # semantics that distinguishes combined_fields from multi_match)
    "query": {"combined_fields": {
        "query": "table wiki",
        "fields": ["text", "source"],
    }},
    "size": 15,
    "_source": ["doc_id", "source"],
}

INTERVALS_BODY = {
    # positional proximity: 'table' then 'scan' with at most 3 tokens
    # between — one regex over the analyzed token string, exact
    # interval semantics, evaluated inside the scan (map-only)
    "query": {"intervals": {"text": {"match": {
        "query": "table scan", "max_gaps": 3, "ordered": True,
    }}}},
    "sort": [{"doc_id": "asc"}],
    "size": 500,
    "_source": ["doc_id", "lang"],
}

SPAN_NEAR_BODY = {
    # the classic Lucene span query: two terms within slop 2 in either
    # order, composed under a bool filter with a term clause — spans
    # are ordinary predicates here, so they compose anywhere a query
    # clause can appear
    "query": {"bool": {"filter": [
        {"term": {"lang": "en"}},
        {"span_near": {
            "clauses": [{"span_term": {"text": "fast"}},
                        {"span_term": {"text": "merge"}}],
            "slop": 2, "in_order": False,
        }},
    ]}},
    "sort": [{"doc_id": "asc"}],
    "size": 500,
    "_source": ["doc_id", "lang"],
}

# the geo bodies derive the loc_lat/loc_lon point columns from the
# fixture's integer keys via runtime_mappings (the % operator joined
# the Painless-lite grammar for exactly this) — deterministic points,
# so every geo kernel is oracle-checkable
_GEO_RM = {
    "loc_lat": {"type": "double",
                "script": {"source": "emit(doc['user_id'].value"
                                     " % 120 - 60)"}},
    "loc_lon": {"type": "double",
                "script": {"source": "emit(doc['event_id'].value"
                                     " % 300 - 150)"}},
}

GEO_DISTANCE_BODY = {
    # "events within 2000 km of the origin" — haversine over the ES
    # mean earth radius, evaluated inside the scan
    "runtime_mappings": _GEO_RM,
    "query": {"geo_distance": {
        "distance": "2000km", "loc": {"lat": 10, "lon": 20},
    }},
    "sort": [{"event_id": "asc"}],
    "size": 300,
    "_source": ["event_id", "loc_lat", "loc_lon"],
}

GEOTILE_GRID_BODY = {
    # the Kibana map request: slippy-map tile buckets with a centroid,
    # a bounds envelope, and an ordinary metric per tile
    "runtime_mappings": _GEO_RM,
    "query": {"term": {"event_type": "click"}},
    "aggs": {"tiles": {
        "geotile_grid": {"field": "loc", "precision": 3, "size": 12},
        "aggs": {
            "centroid": {"geo_centroid": {"field": "loc"}},
            "bounds": {"geo_bounds": {"field": "loc"}},
            "v_avg": {"avg": {"field": "value"}},
        },
    }},
    "size": 0,
}

RESCORE_BODY = {
    # the precision-pass idiom: cheap one-term recall query, then the
    # top-50 window re-ranked by a stricter AND query — rescore cost
    # bounded by window_size, never the corpus
    "query": {"match": {"text": "table"}},
    "rescore": {"window_size": 50, "query": {
        "rescore_query": {"match": {"text": {
            "query": "scan fast", "operator": "and",
        }}},
        "query_weight": 0.7,
        "rescore_query_weight": 1.2,
    }},
    "size": 20,
    "_source": ["doc_id", "lang"],
}

MIN_SCORE_BODY = {
    # score-threshold hits: only matches above 0.5 BM25 return
    "query": {"match": {"text": "table scan"}},
    "min_score": 0.5,
    "size": 100,
    "_source": ["doc_id"],
}

SLICED_SCROLL_BODY = {
    # slice 1 of 3: the parallel-export idiom — deterministic disjoint
    # md5-hash partitions of the hit set, unioning to exactly the full
    # result (asserted in tests)
    "query": {"term": {"lang": "en"}},
    "slice": {"id": 1, "max": 3},
    "sort": [{"doc_id": "asc"}],
    "size": 2000,
    "_source": ["doc_id"],
}

MATRIX_STATS_BODY = {
    # pairwise covariance/correlation across three lineitem measures
    # from ONE scan — exact DECIMAL sums-of-products, so partial-agg
    # order can't flip a bit
    "query": {"term": {"l_returnflag": "R"}},
    "aggs": {"m": {"matrix_stats": {
        "fields": ["l_quantity", "l_extendedprice", "l_discount"],
    }}},
    "size": 0,
}

TOP_METRICS_BODY = {
    # "the latest reading per host": per event type, the value on the
    # newest event, beside ordinary metrics — composable, unlike
    # top_hits
    "query": {"range": {"ts": {"gte": "2024-01-05"}}},
    "aggs": {"by_type": {
        "terms": {"field": "event_type", "size": 5},
        "aggs": {
            "v_avg": {"avg": {"field": "value"}},
            "latest": {"top_metrics": {
                "metrics": {"field": "value"},
                "sort": {"ts": "desc"},
            }},
            "earliest": {"top_metrics": {
                "metrics": [{"field": "value"}, {"field": "user_id"}],
                "sort": {"ts": "asc"},
            }},
        },
    }},
}

ZERO_FILL_BODY = {
    # the explicit Kibana default: min_doc_count 0 zero-fills the day
    # axis across extended_bounds; the running sum then accumulates
    # over the FILLED axis (gaps contribute 0), the dashboard shape
    "query": {"range": {"value": {"gte": 300}}},
    "aggs": {"daily": {
        "date_histogram": {
            "field": "ts", "calendar_interval": "day",
            "min_doc_count": 0,
            "extended_bounds": {"min": "2024-01-01", "max": "2024-01-30"},
        },
        "aggs": {
            "v_sum": {"sum": {"field": "value"}},
            "n": {"value_count": {"field": "value"}},
            "run": {"cumulative_sum": {"buckets_path": "v_sum"}},
        },
    }},
}

DIS_MAX_BODY = {
    # dis_max union + a boosting wrapper inside one bool tree: the
    # compound-query wrappers in filter context
    "query": {"bool": {"filter": [
        {"dis_max": {"queries": [
            {"match": {"text": "merge"}},
            {"match_phrase": {"text": "table scan"}},
        ], "tie_breaker": 0.3}},
        {"boosting": {
            "positive": {"range": {"n_chars": {"gte": 80}}},
            "negative": {"term": {"lang": "zh"}},
            "negative_boost": 0.2,
        }},
    ]}},
    "sort": [{"doc_id": "asc"}],
    "size": 40,
    "_source": ["doc_id", "lang", "n_chars"],
}

PERCENTILES_BODY = {
    "query": {"term": {"event_type": "purchase"}},
    "aggs": {"by_day": {
        "date_histogram": {"field": "ts", "calendar_interval": "week"},
        "aggs": {"v": {"percentiles": {
            "field": "value", "percents": [25, 50, 95, 99.9],
        }}},
    }},
}

FILTER_AGG_BODY = {
    "query": {"range": {"ts": {"gte": "2024-01-02"}}},
    "aggs": {"purchases": {
        "filter": {"term": {"event_type": "purchase"}},
        "aggs": {"v": {"stats": {"field": "value"}}},
    }},
}

GLOBAL_AGG_BODY = {
    # the query scopes hits; global ignores it — corpus-wide baseline
    "query": {"term": {"lang": "en"}},
    "aggs": {"all_docs": {
        "global": {},
        "aggs": {"chars": {"avg": {"field": "n_chars"}}},
    }},
}

COUNT_BODY = {
    "query": {"bool": {
        "filter": [{"term": {"lang": "en"}}],
        "must_not": [{"range": {"n_chars": {"lt": 120}}}],
    }},
}

RANGE_AGG_BODY = {
    "aggs": {
        "len_buckets": {
            "range": {
                "field": "n_chars",
                "ranges": [{"to": 150}, {"from": 150, "to": 350}, {"from": 350}],
            },
            "aggs": {
                "langs": {"cardinality": {"field": "lang"}},
                "chars": {"avg": {"field": "n_chars"}},
            },
        }
    },
}


def _entry(index: str, body: dict, id_field: str,
           relations: dict | None = None):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return spark.sql(
            compile_search(index, body, "spark", id_field, relations)
        )

    return run


# the TPC-H order/line hierarchy as an ES join-field relation: the
# declared key pair has_child/has_parent queries semi-join through
PARENT_CHILD_RELATIONS = {
    "lineitem": {"table": "lineitem", "parent_key": "o_orderkey",
                 "child_key": "l_orderkey", "id_field": "l_orderkey"},
    "orders": {"table": "orders", "parent_key": "o_orderkey",
               "child_key": "l_orderkey", "id_field": "o_orderkey"},
}

HAS_CHILD_BODY = {
    # "orders with at least two heavy line items" — the ES
    # parent-by-children idiom, compiled as an aggregate-then-semi-join
    "query": {"has_child": {
        "type": "lineitem",
        "query": {"range": {"l_quantity": {"gte": 45}}},
        "min_children": 2,
    }},
    "sort": [{"o_orderkey": "asc"}],
    "size": 200,
    "_source": ["o_orderkey", "o_orderstatus"],
}

HAS_PARENT_BODY = {
    # "returned line items of big orders" — has_parent composed under
    # bool beside an ordinary term clause
    "query": {"bool": {"filter": [
        {"term": {"l_returnflag": "R"}},
        {"has_parent": {
            "parent_type": "orders",
            "query": {"range": {"o_totalprice": {"gte": 200000}}},
        }},
    ]}},
    "sort": [{"l_orderkey": "asc"}, {"l_linenumber": "asc"}],
    "size": 200,
    "_source": ["l_orderkey", "l_linenumber", "l_returnflag"],
}


SUGGEST_TERM_BODY = {
    # spell correction against the corpus vocabulary: two misspelled
    # tokens; 'table' is in-vocabulary, so missing mode skips it
    "suggest": {"fix": {
        "text": "tabel scna table",
        "term": {"field": "text", "size": 3, "max_edits": 2,
                 "min_doc_freq": 2},
    }},
    "size": 0,
}

SUGGEST_PHRASE_BODY = {
    # "did you mean": whole-query correction — both tokens misspelled,
    # the lattice recovers the common phrase
    "suggest": {"didyoumean": {
        "text": "tabel scna",
        "phrase": {"field": "text", "size": 4, "max_edits": 2,
                   "candidates_per_term": 3},
    }},
    "size": 0,
}

SUGGEST_COMPLETION_BODY = {
    # search-box autocomplete over the analyzed vocabulary
    "suggest": {"autocomplete": {
        "prefix": "sc",
        "completion": {"field": "text", "size": 8},
    }},
    "size": 0,
}

HISTOGRAM_ZERO_FILL_BODY = {
    # the numeric sibling of the Kibana zero-filled date axis
    "query": {"term": {"event_type": "click"}},
    "aggs": {"v_hist": {
        "histogram": {
            "field": "value", "interval": 100, "min_doc_count": 0,
            "extended_bounds": {"min": -200, "max": 1200},
        },
        "aggs": {
            "v_sum": {"sum": {"field": "value"}},
            "n_users": {"cardinality": {"field": "user_id"}},
        },
    }},
    "size": 0,
}

T_TEST_BODY = {
    # Welch's t over two event populations from ONE scan
    "aggs": {"all_docs": {
        "filter": {"match_all": {}},
        "aggs": {"click_vs_view": {"t_test": {
            "a": {"field": "value",
                  "filter": {"term": {"event_type": "click"}}},
            "b": {"field": "value",
                  "filter": {"term": {"event_type": "view"}}},
            "type": "heteroscedastic",
        }}},
    }},
    "size": 0,
}

MATCH_BOOL_PREFIX_BODY = {
    # search-as-you-type: full terms + a trailing prefix, no adjacency
    "query": {"match_bool_prefix": {"text": {
        "query": "table sca", "operator": "and",
    }}},
    "sort": [{"doc_id": "asc"}],
    "size": 200,
    "_source": ["doc_id", "lang", "n_chars"],
}

PINNED_BODY = {
    # sponsored results: three promoted ids, organic BM25 below
    "query": {"pinned": {
        "ids": [42, 7, 300],
        "organic": {"match": {"text": "vector scan"}},
    }},
    "_source": ["doc_id", "lang"],
    "size": 25,
}

RUNTIME_FIELDS_BODY = {
    # Kibana runtime fields: a derived metric defined in the request,
    # then queried, bucketed, and aggregated like a mapped field
    "runtime_mappings": {
        "chars_per_src": {
            "type": "double",
            "script": {"source": "emit(doc['n_chars'].value / 25)"},
        },
        "is_long": {
            "type": "boolean",
            "script": {"source": "emit(doc['n_chars'].value >= 300)"},
        },
    },
    "query": {"range": {"chars_per_src": {"gte": 4}}},
    "aggs": {"by_long": {
        "terms": {"field": "is_long"},
        "aggs": {"chars_avg": {"avg": {"field": "n_chars"}}},
    }},
    "size": 0,
}

MOVING_PERCENTILES_BODY = {
    # smoothed p50/p90 of daily click value over a trailing week
    "query": {"term": {"event_type": "click"}},
    "aggs": {"daily": {
        "date_histogram": {"field": "ts", "calendar_interval": "day"},
        "aggs": {
            "v": {"sum": {"field": "value"}},
            "v_smooth": {"moving_percentiles": {
                "buckets_path": "v", "window": 7, "shift": 1,
                "percents": [50, 90],
            }},
        },
    }},
    "size": 0,
}

CUMULATIVE_CARDINALITY_BODY = {
    # "total unique users to date" on a daily axis — exact, where ES
    # chains HLL sketches
    "query": {"term": {"event_type": "view"}},
    "aggs": {"daily": {
        "date_histogram": {"field": "ts", "calendar_interval": "day"},
        "aggs": {
            "users": {"cardinality": {"field": "user_id"}},
            "total_users": {"cumulative_cardinality": {
                "buckets_path": "users",
            }},
        },
    }},
    "size": 0,
}

MORE_LIKE_THIS_BODY = {
    # "find documents like this one": in-plan rare-term selection from
    # the liked doc, idf-sum scoring, 30% coordination
    "query": {"more_like_this": {
        "fields": ["text"],
        "like": [{"_id": 7}],
        "max_query_terms": 10,
        "min_term_freq": 2,
        "min_doc_freq": 5,
        "minimum_should_match": "30%",
    }},
    "_source": ["doc_id", "lang"],
    "size": 30,
}

DATE_MATH_BODY = {
    # ES date math with absolute anchors (deterministic for the
    # differential; `now` anchors serve live HTTP with the same code
    # path, pinned via es_datemath.set_now in tests): a rolling window
    # [Jan 1, Jan 11) spelled the way Kibana time pickers spell it
    "query": {"bool": {"filter": [
        {"range": {"ts": {"gte": "2024-01-04||-3d/d",
                          "lt": "2024-01-04||+1w/d"}}},
        {"term": {"event_type": "click"}},
    ]}},
    "sort": [{"ts": "asc"}, {"event_id": "asc"}],
    "size": 500,
    "_source": ["event_id", "user_id", "value"],
}

SEARCH_TEMPLATE = {
    # the Kibana saved-search shape: one template, typed params —
    # {{min_chars}} substitutes a typed int (whole-string rule),
    # {{lang}} interpolates into the term
    "source": {
        "query": {"bool": {"filter": [
            {"term": {"lang": "{{lang}}"}},
            {"range": {"n_chars": {"gte": "{{min_chars}}"}}},
        ]}},
        "sort": [{"doc_id": "asc"}],
        "size": 100,
        "_source": ["doc_id", "lang", "n_chars"],
    },
    "params": {"lang": "en", "min_chars": 200},
}

SCROLL_BODY = {
    # a deep-paginatable filter-context search: sort fields live in
    # _source (the stateless cursor is read from the result columns)
    "query": {"range": {"n_chars": {"gte": 100}}},
    "sort": [{"n_chars": "asc"}],
    "size": 40,
    "_source": ["doc_id", "lang", "n_chars"],
}


def _field_caps_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from golang_db_query_engine_elasticsearch_indexer_spark.gateway import (  # noqa: PLC0415
        es_field_caps_df,
    )

    return es_field_caps_df(spark, "embeddings")


def _field_caps_oracle() -> str:
    from golang_db_query_engine_elasticsearch_indexer_spark.gateway import (  # noqa: PLC0415
        field_caps_oracle_sql,
    )

    return field_caps_oracle_sql("embeddings")


def _terms_enum_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from golang_db_query_engine_elasticsearch_indexer_spark.gateway import (  # noqa: PLC0415
        es_terms_enum_df,
    )

    return es_terms_enum_df(spark, "documents", "source", "src1", 20)


def _terms_enum_oracle() -> str:
    from golang_db_query_engine_elasticsearch_indexer_spark.gateway import (  # noqa: PLC0415
        terms_enum_sql,
    )

    return terms_enum_sql("documents", "source", "src1", 20, "duck")


def _search_template_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from golang_db_query_engine_elasticsearch_indexer_spark.gateway import (  # noqa: PLC0415
        es_search_template_df,
    )

    return es_search_template_df(spark, "documents", SEARCH_TEMPLATE)


def _search_template_oracle() -> str:
    from golang_db_query_engine_elasticsearch_indexer_spark.gateway import (  # noqa: PLC0415
        render_search_template,
    )

    return compile_search(
        "documents",
        render_search_template(
            SEARCH_TEMPLATE["source"], SEARCH_TEMPLATE["params"]
        ),
        "duck",
    )


def _scroll_page2_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page 2 via the stateless scroll cursor: run page 1, read the
    cursor from its last row (bounded collect: page size), compile the
    continuation. The oracle is the INDEPENDENT from/size formulation
    of the same page, so the differential proves cursor == offset —
    the search_after equivalence at the API layer."""
    from golang_db_query_engine_elasticsearch_indexer_spark.gateway import (  # noqa: PLC0415
        effective_sort,
        es_scroll_page,
    )

    order = effective_sort(SCROLL_BODY, "doc_id")
    page1 = es_scroll_page(
        spark, "documents", SCROLL_BODY, None, "doc_id"
    ).collect()
    after = [page1[-1][f] for f, _ in order]
    return es_scroll_page(spark, "documents", SCROLL_BODY, after, "doc_id")


def _scroll_page2_oracle() -> str:
    return compile_search(
        "documents", {**SCROLL_BODY, "from": 40}, "duck"
    )


def _termvectors_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from golang_db_query_engine_elasticsearch_indexer_spark.gateway import (  # noqa: PLC0415
        es_termvectors_df,
    )

    return es_termvectors_df(spark, "documents", 7, "text", "doc_id")


def _termvectors_oracle() -> str:
    from golang_db_query_engine_elasticsearch_indexer_spark.gateway import (  # noqa: PLC0415
        termvectors_sql,
    )

    return termvectors_sql("documents", 7, "text", "doc_id", "duck")


def _cat_indices_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from golang_db_query_engine_elasticsearch_indexer_spark.gateway import (  # noqa: PLC0415
        cat_indices_df,
    )

    return cat_indices_df(spark)


def _cat_indices_oracle() -> str:
    from golang_db_query_engine_elasticsearch_indexer_spark.gateway import (  # noqa: PLC0415
        cat_indices_sql,
    )
    from golang_db_query_engine_elasticsearch_indexer_spark.session import (  # noqa: PLC0415
        FIXTURE_TABLES,
    )

    return cat_indices_sql(FIXTURE_TABLES, "duck")


GEO_RINGS_BODY = {
    # distance-ring buckets (the store-locator / coverage-report agg):
    # haversine rings around an origin with a metric per ring
    "runtime_mappings": _GEO_RM,
    "aggs": {"rings": {
        "geo_distance": {
            "field": "loc", "origin": {"lat": 0, "lon": 0},
            "unit": "km",
            "ranges": [{"to": 2000}, {"from": 2000, "to": 6000},
                       {"from": 6000}],
        },
        "aggs": {"v_avg": {"avg": {"field": "value"}}},
    }},
    "size": 0,
}

PHRASE_SLOP_BODY = {
    # sloppy phrase: 'table' then 'scan' within 2 moves (incl. the
    # transposed order at cost 2) — Lucene slop semantics, exact for
    # two terms
    "query": {"match_phrase": {"text": {
        "query": "table scan", "slop": 2,
    }}},
    "sort": [{"doc_id": "asc"}],
    "size": 300,
    "_source": ["doc_id"],
}

FIELD_BOOSTS_BODY = {
    # caret boosts: text matches count 3x before the most_fields sum —
    # the everyday relevance-tuning syntax
    "query": {"multi_match": {
        "query": "table wiki",
        "fields": ["text^3", "source"],
        "type": "most_fields",
    }},
    "size": 15,
    "_source": ["doc_id", "source"],
}

TERMS_LOOKUP_BODY = {
    # ES terms lookup: the allowed values come from ANOTHER document —
    # "docs in the same language as doc 7" — compiled as a one-row
    # IN-subquery (broadcast semi-join at any scale)
    "query": {"terms": {"lang": {
        "index": "documents", "id": 7, "path": "lang",
    }}},
    "sort": [{"doc_id": "asc"}],
    "size": 50,
    "_source": ["doc_id", "lang"],
}

SCRIPT_FIELDS_BODY = {
    # the older per-hit computed-field API, normalized into the same
    # projection CTE runtime_mappings use; the derived field joins the
    # explicit _source automatically (ES returns them together)
    "query": {"term": {"lang": "en"}},
    "script_fields": {"kchars": {"script": {
        "source": "doc['n_chars'].value / 1000",
    }}},
    "sort": [{"doc_id": "asc"}],
    "size": 10,
    "_source": ["doc_id", "n_chars"],
}

OBJECT_FIELDS_BODY = {
    # ES object fields: dotted names reach inside a JSON column
    # (props.k -> $.k of the props document), typed by the comparison
    # value — the everyday "filter on a property bag" idiom
    "query": {"bool": {"filter": [
        {"term": {"event_type": "click"}},
        {"range": {"props.k": {"gte": 80}}},
    ]}},
    "sort": [{"event_id": "asc"}],
    "size": 400,
    "_source": ["event_id", "props"],
}

FS_OVER_BOOL_BODY = {
    # the full production query: relevance (bool of full-text musts +
    # shoulds, filter-gated) times a document-length decay — the
    # function_score-over-bool composition every tuned search app ships
    "query": {"function_score": {
        "query": {"bool": {
            "must": [{"match": {"text": "table"}}],
            "should": [{"match": {"text": "fast"}}],
            "filter": [{"term": {"lang": "en"}}],
        }},
        "gauss": {"n_chars": {"origin": 300, "scale": 200,
                              "decay": 0.5}},
        "boost_mode": "multiply",
    }},
    "size": 20,
    "_source": ["doc_id", "n_chars"],
}

SCORED_BOOL_BODY = {
    # the everyday ES search: full-text musts (scored, one boosted) +
    # an optional should + score-neutral filter/must_not gates —
    # _score is the Lucene boolean sum
    "query": {"bool": {
        "must": [
            {"match": {"text": "table"}},
            {"match": {"text": {"query": "scan", "boost": 2}}},
        ],
        "should": [{"match": {"text": "fast"}}],
        "filter": [{"term": {"lang": "en"}}],
        "must_not": [{"range": {"n_chars": {"gte": 550}}}],
    }},
    "size": 20,
    "_source": ["doc_id", "lang", "n_chars"],
}

RANK_EVAL_BODY = {
    # the relevance-tuning feedback loop: two queries scored against
    # human ratings with the DCG gain, one statement
    "requests": [
        {"id": "tables",
         "request": {"query": {"match": {"text": "table scan"}}},
         "ratings": [{"_id": 127, "rating": 3}, {"_id": 370, "rating": 2},
                     {"_id": 5, "rating": 1}]},
        {"id": "speed",
         "request": {"query": {"match": {"text": "fast merge"}}},
         "ratings": [{"_id": 12, "rating": 1}]},
    ],
    "metric": {"dcg": {"k": 10}},
}

PIT_SEARCH_BODY = {
    # the search half of a PIT round-trip: an ordinary filter search
    # the entry runs through es_pit_search after opening the pit
    "query": {"term": {"lang": "en"}},
    "sort": [{"doc_id": "asc"}],
    "size": 40,
    "_source": ["doc_id", "lang"],
}


def _pit_search_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open a PIT on documents, assert it, and run the search through
    the pit-validated path. The oracle is the SAME body compiled
    directly — the differential proves the pit wrapper is a pure
    snapshot assertion that changes no results."""
    from golang_db_query_engine_elasticsearch_indexer_spark.gateway import (  # noqa: PLC0415
        es_open_pit,
        es_pit_search,
    )

    pit = es_open_pit(spark, "documents")
    es_pit_search(spark, {**PIT_SEARCH_BODY, "pit": pit})  # asserts
    return spark.sql(compile_search("documents", PIT_SEARCH_BODY, "spark"))


ALIAS_SEARCH_BODY = {
    # an ordinary filter search, addressed AT AN ALIAS: the everyday
    # deployment seam (reads go through `docs_read` while the concrete
    # index rotates underneath)
    "query": {"range": {"n_chars": {"gte": 500}}},
    "sort": [{"doc_id": "asc"}],
    "size": 60,
    "_source": ["doc_id", "lang", "n_chars"],
}


def _alias_search_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register `docs_read` -> documents through the _aliases actions
    API (idempotent: re-adding the same target is a no-op), then
    search addressed at the alias. The oracle compiles the SAME body
    against the concrete table — the differential proves alias
    indirection is pure name resolution, changing no results."""
    from golang_db_query_engine_elasticsearch_indexer_spark.gateway import (  # noqa: PLC0415
        es_search_df,
        es_update_aliases,
    )

    es_update_aliases(spark, {"actions": [
        {"add": {"index": "documents", "alias": "docs_read"}},
    ]})
    return es_search_df(spark, "docs_read", ALIAS_SEARCH_BODY)


def registry() -> dict[str, dict]:
    return {
        "es_dsl_bool_filter": {
            "fn": _entry("documents", BOOL_FILTER_BODY, "doc_id"),
            "oracle": compile_search("documents", BOOL_FILTER_BODY, "duck"),
        },
        "es_dsl_should_msm": {
            "fn": _entry("documents", SHOULD_MSM_BODY, "doc_id"),
            "oracle": compile_search("documents", SHOULD_MSM_BODY, "duck"),
        },
        "es_dsl_terms_agg": {
            "fn": _entry("events", TERMS_AGG_BODY, "event_id"),
            "oracle": compile_search("events", TERMS_AGG_BODY, "duck", "event_id"),
        },
        "es_dsl_date_histogram": {
            "fn": _entry("events", DATE_HISTO_BODY, "event_id"),
            "oracle": compile_search("events", DATE_HISTO_BODY, "duck", "event_id"),
        },
        "es_dsl_range_agg": {
            "fn": _entry("documents", RANGE_AGG_BODY, "doc_id"),
            "oracle": compile_search("documents", RANGE_AGG_BODY, "duck"),
        },
        "es_dsl_knn": {
            "fn": _entry("embeddings", KNN_BODY, "vec_id"),
            "oracle": compile_search("embeddings", KNN_BODY, "duck", "vec_id"),
        },
        "es_dsl_nested_agg": {
            "fn": _entry("events", NESTED_AGG_BODY, "event_id"),
            "oracle": compile_search("events", NESTED_AGG_BODY, "duck", "event_id"),
        },
        "es_dsl_significant_terms": {
            "fn": _entry("documents", SIG_TERMS_BODY, "doc_id"),
            "oracle": compile_search("documents", SIG_TERMS_BODY, "duck"),
        },
        "es_dsl_collapse": {
            "fn": _entry("documents", COLLAPSE_BODY, "doc_id"),
            "oracle": compile_search("documents", COLLAPSE_BODY, "duck"),
        },
        "es_dsl_percolate": {
            "fn": lambda spark, sf_dir: spark.sql(
                compile_percolate("documents", PERCOLATE_QUERIES, "spark")
            ),
            "oracle": compile_percolate("documents", PERCOLATE_QUERIES, "duck"),
        },
        "es_dsl_match_scored": {
            "fn": _entry("documents", MATCH_SCORED_BODY, "doc_id"),
            "oracle": compile_search("documents", MATCH_SCORED_BODY, "duck"),
        },
        "es_dsl_multi_match": {
            "fn": _entry("documents", MULTI_MATCH_BODY, "doc_id"),
            "oracle": compile_search("documents", MULTI_MATCH_BODY, "duck"),
        },
        "es_dsl_composite_after": {
            "fn": _entry("events", COMPOSITE_AFTER_BODY, "event_id"),
            "oracle": compile_search(
                "events", COMPOSITE_AFTER_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_nested_three_levels": {
            "fn": _entry("events", NESTED3_BODY, "event_id"),
            "oracle": compile_search("events", NESTED3_BODY, "duck", "event_id"),
        },
        "es_dsl_filters_agg": {
            "fn": _entry("documents", FILTERS_AGG_BODY, "doc_id"),
            "oracle": compile_search("documents", FILTERS_AGG_BODY, "duck"),
        },
        "es_dsl_top_hits": {
            "fn": _entry("documents", TOP_HITS_BODY, "doc_id"),
            "oracle": compile_search("documents", TOP_HITS_BODY, "duck"),
        },
        "es_dsl_pipeline_cumsum": {
            "fn": _entry("events", PIPELINE_AGG_BODY, "event_id"),
            "oracle": compile_search(
                "events", PIPELINE_AGG_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_match_and_scored": {
            "fn": _entry("documents", MATCH_AND_BODY, "doc_id"),
            "oracle": compile_search("documents", MATCH_AND_BODY, "duck"),
        },
        "es_dsl_fuzzy": {
            "fn": _entry("documents", FUZZY_BODY, "doc_id"),
            "oracle": compile_search("documents", FUZZY_BODY, "duck"),
        },
        "es_dsl_search_after": {
            "fn": _entry("documents", SEARCH_AFTER_BODY, "doc_id"),
            "oracle": compile_search("documents", SEARCH_AFTER_BODY, "duck"),
        },
        "es_dsl_sibling_pipeline": {
            "fn": _entry("events", SIBLING_PIPELINE_BODY, "event_id"),
            "oracle": compile_search(
                "events", SIBLING_PIPELINE_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_count": {
            "fn": lambda spark, sf_dir: spark.sql(
                compile_count("documents", COUNT_BODY, "spark")
            ),
            "oracle": compile_count("documents", COUNT_BODY, "duck"),
        },
        "es_dsl_extended_stats": {
            "fn": _entry("events", EXTENDED_STATS_BODY, "event_id"),
            "oracle": compile_search(
                "events", EXTENDED_STATS_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_terms_order_metric": {
            "fn": _entry("events", TERMS_ORDER_BODY, "event_id"),
            "oracle": compile_search(
                "events", TERMS_ORDER_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_match_phrase_prefix": {
            "fn": _entry("documents", MATCH_PHRASE_PREFIX_BODY, "doc_id"),
            "oracle": compile_search(
                "documents", MATCH_PHRASE_PREFIX_BODY, "duck"
            ),
        },
        "es_dsl_filter_agg": {
            "fn": _entry("events", FILTER_AGG_BODY, "event_id"),
            "oracle": compile_search(
                "events", FILTER_AGG_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_global_agg": {
            "fn": _entry("documents", GLOBAL_AGG_BODY, "doc_id"),
            "oracle": compile_search("documents", GLOBAL_AGG_BODY, "duck"),
        },
        "es_dsl_percentiles": {
            "fn": _entry("events", PERCENTILES_BODY, "event_id"),
            "oracle": compile_search(
                "events", PERCENTILES_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_dis_max_boosting": {
            "fn": _entry("documents", DIS_MAX_BODY, "doc_id"),
            "oracle": compile_search("documents", DIS_MAX_BODY, "duck"),
        },
        "es_dsl_percentile_ranks_wavg": {
            "fn": _entry("events", PRANKS_WAVG_BODY, "event_id"),
            "oracle": compile_search(
                "events", PRANKS_WAVG_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_fixed_interval": {
            "fn": _entry("events", FIXED_INTERVAL_BODY, "event_id"),
            "oracle": compile_search(
                "events", FIXED_INTERVAL_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_bucket_selector": {
            "fn": _entry("events", BUCKET_SELECTOR_BODY, "event_id"),
            "oracle": compile_search(
                "events", BUCKET_SELECTOR_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_bucket_script": {
            "fn": _entry("events", BUCKET_SCRIPT_BODY, "event_id"),
            "oracle": compile_search(
                "events", BUCKET_SCRIPT_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_match_highlight": {
            "fn": _entry("documents", MATCH_HIGHLIGHT_BODY, "doc_id"),
            "oracle": compile_search("documents", MATCH_HIGHLIGHT_BODY, "duck"),
        },
        "es_dsl_multi_terms": {
            "fn": _entry("documents", MULTI_TERMS_BODY, "doc_id"),
            "oracle": compile_search("documents", MULTI_TERMS_BODY, "duck"),
        },
        "es_dsl_auto_date_histogram": {
            "fn": _entry("events", AUTO_DATE_HISTOGRAM_BODY, "event_id"),
            "oracle": compile_search(
                "events", AUTO_DATE_HISTOGRAM_BODY, "duck", "event_id"
            ),
        },
        # GET /_cat/indices — the read-only index inventory beside
        # _search/_count/_mapping/_msearch; Spark side is catalog-driven
        # (gateway.cat_indices_df), the oracle the same UNION ALL over
        # the full fixture-table set
        "es_cat_indices": {
            "fn": _cat_indices_entry,
            "oracle": _cat_indices_oracle(),
        },
        "es_dsl_rare_terms": {
            "fn": _entry("documents", RARE_TERMS_BODY, "doc_id"),
            "oracle": compile_search("documents", RARE_TERMS_BODY, "duck"),
        },
        "es_dsl_date_range": {
            "fn": _entry("events", DATE_RANGE_BODY, "event_id"),
            "oracle": compile_search(
                "events", DATE_RANGE_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_serial_diff_moving_fn": {
            "fn": _entry("events", SERIAL_DIFF_MOVING_BODY, "event_id"),
            "oracle": compile_search(
                "events", SERIAL_DIFF_MOVING_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_stats_bucket": {
            "fn": _entry("events", STATS_BUCKET_BODY, "event_id"),
            "oracle": compile_search(
                "events", STATS_BUCKET_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_zero_fill_axis": {
            "fn": _entry("events", ZERO_FILL_BODY, "event_id"),
            "oracle": compile_search(
                "events", ZERO_FILL_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_function_score": {
            "fn": _entry("documents", FUNCTION_SCORE_BODY, "doc_id"),
            "oracle": compile_search(
                "documents", FUNCTION_SCORE_BODY, "duck"
            ),
        },
        "es_dsl_top_metrics": {
            "fn": _entry("events", TOP_METRICS_BODY, "event_id"),
            "oracle": compile_search(
                "events", TOP_METRICS_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_terms_include_exclude": {
            "fn": _entry("documents", TERMS_INCLUDE_BODY, "doc_id"),
            "oracle": compile_search(
                "documents", TERMS_INCLUDE_BODY, "duck"
            ),
        },
        "es_dsl_histogram_offset": {
            "fn": _entry("events", HISTOGRAM_OFFSET_BODY, "event_id"),
            "oracle": compile_search(
                "events", HISTOGRAM_OFFSET_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_regexp": {
            "fn": _entry("documents", REGEXP_BODY, "doc_id"),
            "oracle": compile_search("documents", REGEXP_BODY, "duck"),
        },
        "es_dsl_terms_set": {
            "fn": _entry("documents", TERMS_SET_BODY, "doc_id"),
            "oracle": compile_search("documents", TERMS_SET_BODY, "duck"),
        },
        "es_dsl_simple_query_string": {
            "fn": _entry("documents", SIMPLE_QUERY_STRING_BODY, "doc_id"),
            "oracle": compile_search(
                "documents", SIMPLE_QUERY_STRING_BODY, "duck"
            ),
        },
        "es_dsl_query_string": {
            "fn": _entry("documents", QUERY_STRING_BODY, "doc_id"),
            "oracle": compile_search("documents", QUERY_STRING_BODY, "duck"),
        },
        "es_dsl_string_stats_boxplot": {
            "fn": _entry("documents", STRING_STATS_BOXPLOT_BODY, "doc_id"),
            "oracle": compile_search(
                "documents", STRING_STATS_BOXPLOT_BODY, "duck"
            ),
        },
        "es_dsl_rate": {
            "fn": _entry("events", RATE_BODY, "event_id"),
            "oracle": compile_search("events", RATE_BODY, "duck", "event_id"),
        },
        "es_dsl_mad": {
            "fn": _entry("documents", MAD_BODY, "doc_id"),
            "oracle": compile_search("documents", MAD_BODY, "duck"),
        },
        "es_dsl_normalize": {
            "fn": _entry("documents", NORMALIZE_BODY, "doc_id"),
            "oracle": compile_search("documents", NORMALIZE_BODY, "duck"),
        },
        "es_dsl_bucket_sort": {
            "fn": _entry("events", BUCKET_SORT_BODY, "event_id"),
            "oracle": compile_search(
                "events", BUCKET_SORT_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_percentiles_bucket": {
            "fn": _entry("events", PERCENTILES_BUCKET_BODY, "event_id"),
            "oracle": compile_search(
                "events", PERCENTILES_BUCKET_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_adjacency_matrix": {
            "fn": _entry("documents", ADJACENCY_MATRIX_BODY, "doc_id"),
            "oracle": compile_search(
                "documents", ADJACENCY_MATRIX_BODY, "duck"
            ),
        },
        "es_dsl_sampler": {
            "fn": _entry("documents", SAMPLER_BODY, "doc_id"),
            "oracle": compile_search("documents", SAMPLER_BODY, "duck"),
        },
        "es_dsl_diversified_sampler": {
            "fn": _entry("documents", DIVERSIFIED_SAMPLER_BODY, "doc_id"),
            "oracle": compile_search(
                "documents", DIVERSIFIED_SAMPLER_BODY, "duck"
            ),
        },
        "es_dsl_significant_text": {
            "fn": _entry("documents", SIGNIFICANT_TEXT_BODY, "doc_id"),
            "oracle": compile_search(
                "documents", SIGNIFICANT_TEXT_BODY, "duck"
            ),
        },
        # GET /{index}/_field_caps — the Spark side maps the analyzed
        # schema through the indexer's one type rule; the oracle maps
        # DuckDB's information_schema through an INDEPENDENT CASE twin,
        # so the differential checks the two engines' schema readings
        # tell one type story
        "es_field_caps": {
            "fn": _field_caps_entry,
            "oracle": _field_caps_oracle(),
        },
        "es_terms_enum": {
            "fn": _terms_enum_entry,
            "oracle": _terms_enum_oracle(),
        },
        "es_search_template": {
            "fn": _search_template_entry,
            "oracle": _search_template_oracle(),
        },
        "es_scroll_page2": {
            "fn": _scroll_page2_entry,
            "oracle": _scroll_page2_oracle(),
        },
        "es_dsl_date_math": {
            "fn": _entry("events", DATE_MATH_BODY, "event_id"),
            "oracle": compile_search(
                "events", DATE_MATH_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_cumulative_cardinality": {
            "fn": _entry("events", CUMULATIVE_CARDINALITY_BODY, "event_id"),
            "oracle": compile_search(
                "events", CUMULATIVE_CARDINALITY_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_more_like_this": {
            "fn": _entry("documents", MORE_LIKE_THIS_BODY, "doc_id"),
            "oracle": compile_search(
                "documents", MORE_LIKE_THIS_BODY, "duck"
            ),
        },
        "es_termvectors": {
            "fn": _termvectors_entry,
            "oracle": _termvectors_oracle(),
        },
        "es_dsl_suggest_term": {
            "fn": _entry("documents", SUGGEST_TERM_BODY, "doc_id"),
            "oracle": compile_search(
                "documents", SUGGEST_TERM_BODY, "duck"
            ),
        },
        "es_dsl_suggest_completion": {
            "fn": _entry("documents", SUGGEST_COMPLETION_BODY, "doc_id"),
            "oracle": compile_search(
                "documents", SUGGEST_COMPLETION_BODY, "duck"
            ),
        },
        "es_dsl_histogram_zero_fill": {
            "fn": _entry("events", HISTOGRAM_ZERO_FILL_BODY, "event_id"),
            "oracle": compile_search(
                "events", HISTOGRAM_ZERO_FILL_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_t_test": {
            "fn": _entry("events", T_TEST_BODY, "event_id"),
            "oracle": compile_search(
                "events", T_TEST_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_match_bool_prefix": {
            "fn": _entry("documents", MATCH_BOOL_PREFIX_BODY, "doc_id"),
            "oracle": compile_search(
                "documents", MATCH_BOOL_PREFIX_BODY, "duck"
            ),
        },
        "es_dsl_pinned": {
            "fn": _entry("documents", PINNED_BODY, "doc_id"),
            "oracle": compile_search("documents", PINNED_BODY, "duck"),
        },
        "es_dsl_runtime_fields": {
            "fn": _entry("documents", RUNTIME_FIELDS_BODY, "doc_id"),
            "oracle": compile_search(
                "documents", RUNTIME_FIELDS_BODY, "duck"
            ),
        },
        "es_dsl_moving_percentiles": {
            "fn": _entry("events", MOVING_PERCENTILES_BODY, "event_id"),
            "oracle": compile_search(
                "events", MOVING_PERCENTILES_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_function_score_decay": {
            "fn": _entry("events", FS_DECAY_BODY, "event_id"),
            "oracle": compile_search(
                "events", FS_DECAY_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_function_score_functions": {
            "fn": _entry("documents", FS_FUNCTIONS_BODY, "doc_id"),
            "oracle": compile_search(
                "documents", FS_FUNCTIONS_BODY, "duck"
            ),
        },
        "es_dsl_script_score": {
            "fn": _entry("documents", SCRIPT_SCORE_BODY, "doc_id"),
            "oracle": compile_search("documents", SCRIPT_SCORE_BODY, "duck"),
        },
        "es_dsl_random_score": {
            "fn": _entry("documents", RANDOM_SCORE_BODY, "doc_id"),
            "oracle": compile_search("documents", RANDOM_SCORE_BODY, "duck"),
        },
        "es_dsl_rank_feature": {
            "fn": _entry("documents", RANK_FEATURE_BODY, "doc_id"),
            "oracle": compile_search("documents", RANK_FEATURE_BODY, "duck"),
        },
        "es_dsl_distance_feature": {
            "fn": _entry("events", DISTANCE_FEATURE_BODY, "event_id"),
            "oracle": compile_search(
                "events", DISTANCE_FEATURE_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_combined_fields": {
            "fn": _entry("documents", COMBINED_FIELDS_BODY, "doc_id"),
            "oracle": compile_search(
                "documents", COMBINED_FIELDS_BODY, "duck"
            ),
        },
        "es_dsl_intervals": {
            "fn": _entry("documents", INTERVALS_BODY, "doc_id"),
            "oracle": compile_search("documents", INTERVALS_BODY, "duck"),
        },
        "es_dsl_span_near": {
            "fn": _entry("documents", SPAN_NEAR_BODY, "doc_id"),
            "oracle": compile_search("documents", SPAN_NEAR_BODY, "duck"),
        },
        "es_dsl_geo_distance": {
            "fn": _entry("events", GEO_DISTANCE_BODY, "event_id"),
            "oracle": compile_search(
                "events", GEO_DISTANCE_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_geotile_grid": {
            "fn": _entry("events", GEOTILE_GRID_BODY, "event_id"),
            "oracle": compile_search(
                "events", GEOTILE_GRID_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_has_child": {
            "fn": _entry("orders", HAS_CHILD_BODY, "o_orderkey",
                         PARENT_CHILD_RELATIONS),
            "oracle": compile_search(
                "orders", HAS_CHILD_BODY, "duck", "o_orderkey",
                PARENT_CHILD_RELATIONS,
            ),
        },
        "es_dsl_has_parent": {
            "fn": _entry("lineitem", HAS_PARENT_BODY, "l_orderkey",
                         PARENT_CHILD_RELATIONS),
            "oracle": compile_search(
                "lineitem", HAS_PARENT_BODY, "duck", "l_orderkey",
                PARENT_CHILD_RELATIONS,
            ),
        },
        "es_dsl_rescore": {
            "fn": _entry("documents", RESCORE_BODY, "doc_id"),
            "oracle": compile_search("documents", RESCORE_BODY, "duck"),
        },
        "es_dsl_min_score": {
            "fn": _entry("documents", MIN_SCORE_BODY, "doc_id"),
            "oracle": compile_search("documents", MIN_SCORE_BODY, "duck"),
        },
        "es_dsl_sliced_scroll": {
            "fn": _entry("documents", SLICED_SCROLL_BODY, "doc_id"),
            "oracle": compile_search(
                "documents", SLICED_SCROLL_BODY, "duck"
            ),
        },
        "es_dsl_matrix_stats": {
            "fn": _entry("lineitem", MATRIX_STATS_BODY, "l_orderkey"),
            "oracle": compile_search(
                "lineitem", MATRIX_STATS_BODY, "duck", "l_orderkey"
            ),
        },
        "es_pit_search": {
            "fn": _pit_search_entry,
            "oracle": compile_search("documents", PIT_SEARCH_BODY, "duck"),
        },
        "es_alias_search": {
            "fn": _alias_search_entry,
            "oracle": compile_search("documents", ALIAS_SEARCH_BODY, "duck"),
        },
        "es_dsl_suggest_phrase": {
            "fn": _entry("documents", SUGGEST_PHRASE_BODY, "doc_id"),
            "oracle": compile_search(
                "documents", SUGGEST_PHRASE_BODY, "duck"
            ),
        },
        "es_dsl_scored_bool": {
            "fn": _entry("documents", SCORED_BOOL_BODY, "doc_id"),
            "oracle": compile_search("documents", SCORED_BOOL_BODY, "duck"),
        },
        "es_dsl_fs_over_bool": {
            "fn": _entry("documents", FS_OVER_BOOL_BODY, "doc_id"),
            "oracle": compile_search(
                "documents", FS_OVER_BOOL_BODY, "duck"
            ),
        },
        "es_rank_eval_dcg": {
            "fn": lambda spark, sf_dir: spark.sql(
                compile_rank_eval("documents", RANK_EVAL_BODY, "spark")
            ),
            "oracle": compile_rank_eval("documents", RANK_EVAL_BODY, "duck"),
        },
        "es_dsl_object_fields": {
            "fn": _entry("events", OBJECT_FIELDS_BODY, "event_id"),
            "oracle": compile_search(
                "events", OBJECT_FIELDS_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_terms_lookup": {
            "fn": _entry("documents", TERMS_LOOKUP_BODY, "doc_id"),
            "oracle": compile_search(
                "documents", TERMS_LOOKUP_BODY, "duck"
            ),
        },
        "es_dsl_script_fields": {
            "fn": _entry("documents", SCRIPT_FIELDS_BODY, "doc_id"),
            "oracle": compile_search(
                "documents", SCRIPT_FIELDS_BODY, "duck"
            ),
        },
        "es_dsl_geo_rings": {
            "fn": _entry("events", GEO_RINGS_BODY, "event_id"),
            "oracle": compile_search(
                "events", GEO_RINGS_BODY, "duck", "event_id"
            ),
        },
        "es_dsl_phrase_slop": {
            "fn": _entry("documents", PHRASE_SLOP_BODY, "doc_id"),
            "oracle": compile_search("documents", PHRASE_SLOP_BODY, "duck"),
        },
        "es_dsl_field_boosts": {
            "fn": _entry("documents", FIELD_BOOSTS_BODY, "doc_id"),
            "oracle": compile_search("documents", FIELD_BOOSTS_BODY, "duck"),
        },
    }
