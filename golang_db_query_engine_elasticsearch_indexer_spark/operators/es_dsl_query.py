"""ES Query-DSL compiler — QUERY CONTEXT tier (split from es_dsl.py).

Everything that decides MEMBERSHIP and SCORE of hits: the analyzer,
literal/identifier rendering, the full clause tree (_query_expr /
_bool_expr), BM25 relevance and the function_score machinery, the
scored compilers (match/multi_match, scored bool, rescore, highlight,
pinned, more_like_this, rank/distance features, combined_fields), the
suggest API, hit projection (_source_cols), and the shared
Painless-lite script compiler. Design contract, float discipline, and
the two-dialect rule are documented in operators/es_dsl.py (the
facade, which re-exports this module's names — import from there).
"""

from __future__ import annotations

import re


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
        # dict.fromkeys, NOT set(): set iteration order is
        # hash-seed-randomized per process, which made the compiled
        # text (and thus changed-kernel detection via oracle diffs)
        # nondeterministic across runs
        arr = ", ".join(
            _lit(t.lower(), dialect) for t in dict.fromkeys(terms)
        )
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
    from golang_db_query_engine_elasticsearch_indexer_spark.operators.es_dsl import (  # noqa: PLC0415
        compile_search,
    )

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
