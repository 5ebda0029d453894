"""Lucene query-string mini-languages -> SQL membership expressions.

The reference ships documents into Elasticsearch precisely so users can
type Kibana search-bar queries at them (`elastic_controller.go` is the
loader; the search bar is `query_string` / `simple_query_string`).
This module compiles both syntaxes into the same two-dialect SQL the
rest of the DSL compiler emits (`operators/es_dsl.py`), so a body like

    {"query": {"simple_query_string": {
        "query": "(spark | vector) + \\"table scan\\" + -slow*",
        "fields": ["text"]}}}

runs as one Catalyst filter over the engine's tables.

Design:

- Each syntax gets a real lexer + recursive-descent parser producing a
  small AST (AND/OR/NOT over TERM/PHRASE/PREFIX/WILD/RANGE/EXISTS
  leaves); one compile pass renders the AST in either dialect using
  the es_dsl helpers, so both engines see the same clause tree.
- Analysis model matches the module's: a TERM tests analyzed-token
  membership (the `match` rule), a PHRASE tests adjacency (the
  `match_phrase` rule), and wildcard/prefix leaves match at TOKEN
  level (Lucene applies them to analyzed terms), unlike the top-level
  `wildcard` query kind which is the keyword-field whole-value LIKE.
- Precedence is NOT guessed: mixing AND-ish and OR-ish operators at
  one parenthesis level raises a loud ValueError asking for parens.
  Lucene's own precedence here is a famous source of user surprise;
  wrong rows quietly would be worse than a parse error.
- Filter context only: membership, no BM25 (the ES search bar defaults
  to scored output, but this compiler's scored path is the bare
  match/multi_match route; a scored query-string is rejected upstream
  by the normal unsupported-clause path, never silently unscored).
- Rejected loudly (cross-dialect or out of scope): backslash escapes,
  boosts (^), fuzziness/slop (~), regex literals (/re/), leading
  wildcards, and `+`-prefixed must clauses in `query_string`.
"""

from __future__ import annotations

import re


def _d():
    # late import: es_dsl imports this module inside its query-clause
    # handler, so a module-level import here would be circular
    from golang_db_query_engine_elasticsearch_indexer_spark.operators import (  # noqa: PLC0415
        es_dsl,
    )

    return es_dsl


# --- AST ----------------------------------------------------------------------
# nodes are plain tuples:
#   ("and", [n...]) ("or", [n...]) ("not", n)
#   ("term", field|None, text) ("phrase", field|None, text)
#   ("wild", field|None, pattern)            # * / ? at token level
#   ("range", field, {op: value, ...})       # gte/gt/lte/lt
#   ("exists", field)


def _check_text(q: str, what: str) -> None:
    if not isinstance(q, str) or not q.strip():
        raise ValueError(f"es_dsl: {what} wants a non-empty query string")
    if "\\" in q:
        raise ValueError(
            f"es_dsl: {what} backslash escapes are unsupported (escapes "
            "parse differently across dialects)"
        )


def _combine(parts: list, ops: set[str], what: str):
    if not parts:
        raise ValueError(f"es_dsl: {what} has an empty group")
    if len(parts) == 1:
        return parts[0]
    if len(ops) > 1:
        raise ValueError(
            f"es_dsl: {what} mixes AND-ish and OR-ish operators at one "
            "level — parenthesize (Lucene precedence here surprises; "
            "this compiler refuses to guess)"
        )
    return (ops.pop(), parts)


# --- simple_query_string -------------------------------------------------------

_SQS_SPECIAL = set('()|+"')


def _sqs_lex(q: str) -> list[tuple[str, str]]:
    """Tokens: (kind, text) with kind in lparen/rparen/and/or/not/
    phrase/term."""
    out: list[tuple[str, str]] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
            continue
        if c == "(":
            out.append(("lparen", c)); i += 1; continue
        if c == ")":
            out.append(("rparen", c)); i += 1; continue
        if c == "+":
            out.append(("and", c)); i += 1; continue
        if c == "|":
            out.append(("or", c)); i += 1; continue
        if c == "-":
            out.append(("not", c)); i += 1; continue
        if c == '"':
            j = q.find('"', i + 1)
            if j < 0:
                raise ValueError(
                    "es_dsl: simple_query_string unterminated phrase"
                )
            out.append(("phrase", q[i + 1 : j])); i = j + 1; continue
        # '-' at clause start lexed as NOT above; inside a term it is
        # an ordinary character (the analyzer keeps 'foo-bar' whole)
        j = i
        while j < n and not q[j].isspace() and q[j] not in _SQS_SPECIAL:
            j += 1
        out.append(("term", q[i:j])); i = j
    return out


def _sqs_parse(toks: list[tuple[str, str]], pos: int, depth: int):
    """expr := clause ((and|or|implicit) clause)*  — returns (node, pos)."""
    parts: list = []
    ops: set[str] = set()
    pending_op: str | None = None

    def clause(p: int):
        if p >= len(toks):
            raise ValueError("es_dsl: simple_query_string ends mid-clause")
        kind, text = toks[p]
        if kind == "not":
            node, p2 = clause(p + 1)
            return ("not", node), p2
        if kind == "lparen":
            node, p2 = _sqs_parse(toks, p + 1, depth + 1)
            if p2 >= len(toks) or toks[p2][0] != "rparen":
                raise ValueError("es_dsl: simple_query_string unbalanced '('")
            return node, p2 + 1
        if kind == "phrase":
            return ("phrase", None, text), p + 1
        if kind == "term":
            if "?" in text or "*" in text[:-1]:
                raise ValueError(
                    "es_dsl: simple_query_string supports only a TRAILING "
                    f"* wildcard (got {text!r})"
                )
            if text == "*":
                raise ValueError(
                    "es_dsl: simple_query_string bare '*' is unsupported"
                )
            if text.endswith("*"):
                return ("wild", None, text), p + 1
            return ("term", None, text), p + 1
        raise ValueError(
            f"es_dsl: simple_query_string unexpected {text!r}"
        )

    p = pos
    while p < len(toks) and toks[p][0] != "rparen":
        kind = toks[p][0]
        if kind in ("and", "or"):
            if pending_op or not parts:
                raise ValueError(
                    "es_dsl: simple_query_string dangling operator"
                )
            pending_op = kind
            p += 1
            continue
        node, p = clause(p)
        if parts:
            ops.add(pending_op or "implicit")
        pending_op = None
        parts.append(node)
    if pending_op:
        raise ValueError("es_dsl: simple_query_string trailing operator")
    if depth == 0 and p < len(toks):
        raise ValueError("es_dsl: simple_query_string unbalanced ')'")
    return _combine(parts, ops, "simple_query_string"), p


def parse_simple_query_string(q: str, default_operator: str):
    _check_text(q, "simple_query_string")
    if default_operator not in ("or", "and"):
        raise ValueError(
            f"es_dsl: bad default_operator {default_operator!r}"
        )
    toks = _sqs_lex(q)
    node, _ = _sqs_parse(toks, 0, 0)
    return _resolve_implicit(node, default_operator)


def _resolve_implicit(node, default_operator: str):
    if node[0] == "implicit":
        return (
            default_operator,
            [_resolve_implicit(c, default_operator) for c in node[1]],
        )
    if node[0] in ("and", "or"):
        return (
            node[0],
            [_resolve_implicit(c, default_operator) for c in node[1]],
        )
    if node[0] == "not":
        return ("not", _resolve_implicit(node[1], default_operator))
    return node


# --- query_string --------------------------------------------------------------

_QS_WORD_OPS = {"AND": "and", "&&": "and", "OR": "or", "||": "or"}
_QS_REJECT = set("^~/")


def _qs_lex(q: str) -> list[tuple[str, str]]:
    """Tokens: lparen/rparen/and/or/not/field/phrase/range/term."""
    out: list[tuple[str, str]] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
            continue
        if c in _QS_REJECT:
            raise ValueError(
                f"es_dsl: query_string {c!r} syntax (boost/fuzzy/regex) "
                "is unsupported"
            )
        if c == "(":
            out.append(("lparen", c)); i += 1; continue
        if c == ")":
            out.append(("rparen", c)); i += 1; continue
        if c == "!":
            out.append(("not", c)); i += 1; continue
        if c == "-":
            out.append(("not", c)); i += 1; continue
        if c == "+":
            raise ValueError(
                "es_dsl: query_string '+' (must) prefixes are unsupported "
                "— in filter context write explicit AND"
            )
        if q.startswith("&&", i):
            out.append(("and", "&&")); i += 2; continue
        if q.startswith("||", i):
            out.append(("or", "||")); i += 2; continue
        if c == '"':
            j = q.find('"', i + 1)
            if j < 0:
                raise ValueError("es_dsl: query_string unterminated phrase")
            out.append(("phrase", q[i + 1 : j])); i = j + 1; continue
        if c in "[{":
            close = {"[": "]", "{": "}"}
            j = i
            while j < n and q[j] not in "]}":
                j += 1
            if j >= n:
                raise ValueError("es_dsl: query_string unterminated range")
            out.append(("range", q[i : j + 1])); i = j + 1; continue
        # word: term / field: / AND / OR / NOT
        j = i
        while j < n and not q[j].isspace() and q[j] not in '()!"[]{}|&':
            if q[j] in _QS_REJECT:
                raise ValueError(
                    f"es_dsl: query_string {q[j]!r} syntax (boost/fuzzy/"
                    "regex) is unsupported"
                )
            j += 1
        word = q[i:j]
        i = j
        if word in _QS_WORD_OPS:
            out.append((_QS_WORD_OPS[word], word)); continue
        if word == "NOT":
            out.append(("not", word)); continue
        if word.endswith(":") and len(word) > 1:
            out.append(("field", word[:-1])); continue
        if ":" in word:
            f, _, rest = word.partition(":")
            out.append(("field", f))
            if rest:
                out.append(("term", rest))
            continue
        out.append(("term", word))
    return out


_RANGE_RE = re.compile(r"^([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])$")
_CMP_RE = re.compile(r"^(>=|<=|>|<)(.+)$")


def _range_value(s: str):
    if s == "*":
        return None
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        return s


def _qs_parse(toks: list[tuple[str, str]], pos: int, depth: int,
              field: str | None):
    parts: list = []
    ops: set[str] = set()
    pending_op: str | None = None

    def leaf_for(f: str | None, kind: str, text: str):
        if kind == "phrase":
            return ("phrase", f, text)
        if kind == "range":
            m = _RANGE_RE.match(text)
            if not m or f is None:
                raise ValueError(
                    f"es_dsl: query_string bad range {text!r} (needs "
                    "field:[lo TO hi])"
                )
            lo_b, lo, hi, hi_b = m.group(1), m.group(2), m.group(3), m.group(4)
            conds: dict = {}
            lov, hiv = _range_value(lo), _range_value(hi)
            if lov is not None:
                conds["gte" if lo_b == "[" else "gt"] = lov
            if hiv is not None:
                conds["lte" if hi_b == "]" else "lt"] = hiv
            if not conds:
                raise ValueError(
                    "es_dsl: query_string range with both bounds '*'"
                )
            return ("range", f, conds)
        # term
        m = _CMP_RE.match(text)
        if m:
            if f is None:
                raise ValueError(
                    f"es_dsl: query_string comparison {text!r} needs a field"
                )
            op = {">": "gt", ">=": "gte", "<": "lt", "<=": "lte"}[m.group(1)]
            return ("range", f, {op: _range_value(m.group(2))})
        if text.startswith(("*", "?")):
            raise ValueError(
                f"es_dsl: query_string leading wildcards are unsupported "
                f"({text!r})"
            )
        if "*" in text or "?" in text:
            return ("wild", f, text)
        return ("term", f, text)

    def clause(p: int, f: str | None):
        if p >= len(toks):
            raise ValueError("es_dsl: query_string ends mid-clause")
        kind, text = toks[p]
        if kind == "not":
            node, p2 = clause(p + 1, f)
            return ("not", node), p2
        if kind == "field":
            fname = text
            if fname == "_exists_":
                if p + 1 >= len(toks) or toks[p + 1][0] != "term":
                    raise ValueError(
                        "es_dsl: _exists_: wants a field name"
                    )
                return ("exists", toks[p + 1][1]), p + 2
            if p + 1 < len(toks) and toks[p + 1][0] == "lparen":
                # field:(a OR b) — the field scopes the whole group
                node, p2 = _qs_parse(toks, p + 2, depth + 1, fname)
                if p2 >= len(toks) or toks[p2][0] != "rparen":
                    raise ValueError("es_dsl: query_string unbalanced '('")
                return node, p2 + 1
            if p + 1 >= len(toks) or toks[p + 1][0] not in (
                "term", "phrase", "range",
            ):
                raise ValueError(
                    f"es_dsl: query_string field {fname!r} wants a term, "
                    "phrase, or range"
                )
            k2, t2 = toks[p + 1]
            return leaf_for(fname, k2, t2), p + 2
        if kind == "lparen":
            node, p2 = _qs_parse(toks, p + 1, depth + 1, f)
            if p2 >= len(toks) or toks[p2][0] != "rparen":
                raise ValueError("es_dsl: query_string unbalanced '('")
            return node, p2 + 1
        if kind in ("phrase", "term", "range"):
            return leaf_for(f, kind, text), p + 1
        raise ValueError(f"es_dsl: query_string unexpected {text!r}")

    p = pos
    while p < len(toks) and toks[p][0] != "rparen":
        kind = toks[p][0]
        if kind in ("and", "or"):
            if pending_op or not parts:
                raise ValueError("es_dsl: query_string dangling operator")
            pending_op = kind
            p += 1
            continue
        node, p = clause(p, field)
        if parts:
            ops.add(pending_op or "implicit")
        pending_op = None
        parts.append(node)
    if pending_op:
        raise ValueError("es_dsl: query_string trailing operator")
    if depth == 0 and p < len(toks):
        raise ValueError("es_dsl: query_string unbalanced ')'")
    return _combine(parts, ops, "query_string"), p


def parse_query_string(q: str, default_operator: str):
    _check_text(q, "query_string")
    if default_operator not in ("or", "and"):
        raise ValueError(
            f"es_dsl: bad default_operator {default_operator!r}"
        )
    node, _ = _qs_parse(_qs_lex(q), 0, 0, None)
    return _resolve_implicit(node, default_operator)


# --- compilation ----------------------------------------------------------------


def _tok_like(field: str, pattern_sql: str, dialect: str) -> str:
    """Token-level LIKE membership: some analyzed token of ``field``
    matches the (already-escaped) LIKE pattern. Lucene wildcards apply
    to analyzed terms, so 'slow*' hits a doc whose token stream holds
    'slower' — unlike the whole-value `wildcard` query kind."""
    d = _d()
    te = d._tokens_expr(field, dialect)
    if dialect == "spark":
        return f"exists({te}, t -> t LIKE '{pattern_sql}' ESCAPE '!')"
    return (
        f"len(list_filter({te}, t -> t LIKE '{pattern_sql}' ESCAPE '!'))"
        " > 0"
    )


def _wild_pattern(text: str) -> str:
    d = _d()
    return "".join(
        "%" if c == "*" else "_" if c == "?" else d._like_escape(c)
        for c in text.lower()
    )


def compile_node(node, fields: list[str], dialect: str,
                 id_field: str) -> str:
    """Render one AST node as a SQL boolean expression. A leaf with no
    explicit field tests EVERY default field, OR-combined (a doc
    matching in any listed field matches — the ES multi-field rule)."""
    d = _d()
    kind = node[0]
    if kind in ("and", "or"):
        glue = " AND " if kind == "and" else " OR "
        sub = [
            f"coalesce({compile_node(c, fields, dialect, id_field)}, FALSE)"
            for c in node[1]
        ]
        return "(" + glue.join(sub) + ")"
    if kind == "not":
        inner = compile_node(node[1], fields, dialect, id_field)
        # ES: a NULL field fails the inner clause, so NULLs MATCH the
        # negation — the must_not rule
        return f"NOT coalesce({inner}, FALSE)"
    if kind == "exists":
        return d._query_expr({"exists": {"field": node[1]}}, dialect,
                             id_field)
    if kind == "range":
        _, f, conds = node
        return d._query_expr({"range": {f: conds}}, dialect, id_field)

    _, f, text = node
    targets = [f] if f else fields
    if not targets:
        raise ValueError(
            "es_dsl: query-string term without a field needs "
            "fields/default_field"
        )
    exprs = []
    for tf in targets:
        if kind == "term":
            e = d._query_expr({"match": {tf: text}}, dialect, id_field)
        elif kind == "phrase":
            e = d._query_expr({"match_phrase": {tf: text}}, dialect,
                              id_field)
        elif kind == "wild":
            e = _tok_like(d._ident(tf), _wild_pattern(text), dialect)
        else:  # pragma: no cover — parser emits no other leaf
            raise ValueError(f"es_dsl: internal leaf {kind!r}")
        exprs.append(e)
    if len(exprs) == 1:
        return exprs[0]
    return "(" + " OR ".join(f"coalesce({e}, FALSE)" for e in exprs) + ")"


def simple_query_string_expr(body: dict, dialect: str,
                             id_field: str) -> str:
    bad = set(body) - {"query", "fields", "default_operator"}
    if bad:
        raise ValueError(
            f"es_dsl: unsupported simple_query_string keys {sorted(bad)}"
        )
    fields = body.get("fields")
    if not isinstance(fields, list) or not fields or not all(
        isinstance(x, str) for x in fields
    ):
        raise ValueError(
            "es_dsl: simple_query_string requires a fields list (the "
            "'all fields' default is index-mapping-dependent)"
        )
    if any("^" in f or "*" in f for f in fields):
        raise ValueError(
            "es_dsl: simple_query_string field boosts/patterns are "
            "unsupported"
        )
    node = parse_simple_query_string(
        body.get("query"), body.get("default_operator", "or")
    )
    d = _d()
    return compile_node(
        node, [d._ident(f) for f in fields], dialect, id_field
    )


def query_string_expr(body: dict, dialect: str, id_field: str) -> str:
    bad = set(body) - {"query", "fields", "default_field",
                       "default_operator"}
    if bad:
        raise ValueError(
            f"es_dsl: unsupported query_string keys {sorted(bad)}"
        )
    if "fields" in body and "default_field" in body:
        raise ValueError(
            "es_dsl: query_string fields and default_field are exclusive"
        )
    fields = body.get("fields")
    if fields is None:
        fields = [body["default_field"]] if "default_field" in body else []
    if not isinstance(fields, list) or not all(
        isinstance(x, str) for x in fields
    ):
        raise ValueError("es_dsl: query_string fields must be strings")
    if any("^" in f or "*" in f for f in fields):
        raise ValueError(
            "es_dsl: query_string field boosts/patterns are unsupported"
        )
    node = parse_query_string(
        body.get("query"), body.get("default_operator", "or")
    )
    d = _d()
    return compile_node(
        node, [d._ident(f) for f in fields], dialect, id_field
    )
