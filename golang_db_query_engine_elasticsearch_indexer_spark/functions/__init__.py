"""Shared SQL expression builders, in two dialects (Spark + DuckDB).

The engine's custom operators (dedup, similarity, text analysis) are
deliberately written as *expressions*, not UDFs: everything here stays
JVM-side under whole-stage codegen in Spark (SURVEY.md §2.C), and each
builder has a DuckDB rendering so every operator gets an exact
differential oracle (SURVEY.md §5). Keeping both dialects in one place
is what guarantees the Spark query and its oracle compute the same
arithmetic.

Dialect notes encoded here once instead of per-operator:
- Spark ``arr[i]`` is 0-based; DuckDB ``list[i]`` is 1-based.
- Spark regex strings need ``\\\\s``; DuckDB takes ``\\s``.
- Vector math: Spark ``zip_with``/``aggregate`` folds in double;
  DuckDB ``list_cosine_similarity`` on ``DOUBLE[]`` matches to 6 dp.
"""

from __future__ import annotations

# --- tokenization ----------------------------------------------------------

#: whitespace tokens of lower(trim(text)) — the canonical tokenizer for
#: every text operator (documents.text column).
TOKENS = r"split(lower(trim(text)), '\\s+')"
DUCK_TOKENS = r"string_split_regex(lower(trim(text)), '\s+')"


def array_lit(words: list[str]) -> str:
    """Spark array literal from python strings."""
    inner = ",".join(f"'{w}'" for w in words)
    return f"array({inner})"


def list_lit(words: list[str]) -> str:
    """DuckDB list literal from python strings."""
    inner = ",".join(f"'{w}'" for w in words)
    return f"[{inner}]"


# --- vector math (embeddings: array<float>) --------------------------------

#: dot product of two array columns, folded in double (JVM codegen).
DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x AS double) * cast(y AS double)), "
    "cast(0 AS double), (acc, v) -> acc + v)"
)

#: L2 norm of an array column.
NORM = (
    "sqrt(aggregate(transform({a}, x -> cast(x AS double) * cast(x AS double)), "
    "cast(0 AS double), (acc, v) -> acc + v))"
)


def cosine(a: str, b: str, norm_a: str, norm_b: str) -> str:
    """Cosine similarity given precomputed norms (Spark dialect)."""
    return f"({DOT.format(a=a, b=b)}) / ({norm_a} * {norm_b})"


# --- portable integer hashing ---------------------------------------------

#: hex alphabet used by the instr-arithmetic hex decoder below.
HEX = "0123456789abcdef"


def hash16(md5_expr: str) -> str:
    """16-bit integer from the first 4 hex digits of an md5 expression.

    Written as instr/substring arithmetic that parses and evaluates
    identically in Spark SQL and DuckDB — the portable primitive under
    simhash and any bucketed hashing that needs small integers.
    """
    terms = [
        f"(instr('{HEX}', substring({md5_expr}, {k + 1}, 1)) - 1) * {16 ** (3 - k)}"
        for k in range(4)
    ]
    return "(" + " + ".join(terms) + ")"


def hex_prefix_int(md5_expr: str, digits: int = 12) -> str:
    """Non-negative integer from the first ``digits`` hex digits of an
    md5 expression (digits <= 15 keeps the value < 2^60, safely inside
    BIGINT for downstream multiply-mod arithmetic).

    Same instr/substring arithmetic as hash16, generalized: parses and
    evaluates identically in Spark SQL and DuckDB — the portable
    primitive under MinHash permutations and any hashing that needs
    wide integers.
    """
    terms = [
        # cast keeps the arithmetic in BIGINT from the first multiply:
        # small power-of-16 literals would otherwise parse as INT and
        # overflow under Spark ANSI mode. `cast(.. AS bigint)` parses in
        # both dialects.
        f"(instr('{HEX}', substring({md5_expr}, {k + 1}, 1)) - 1) "
        f"* cast({16 ** (digits - 1 - k)} AS bigint)"
        for k in range(digits)
    ]
    return "(" + " + ".join(terms) + ")"


# --- n-gram builders -------------------------------------------------------

def spark_ngrams(n: int, toks: str = "toks") -> str:
    """Distinct word n-grams of an array column (Spark).

    Built as nested ``zip_with`` over ``slice`` windows rather than
    ``transform(sequence(...), i -> toks[i]...)``: per-element array
    indexing inside an interpreted lambda re-walks the array with bounds
    checks each access, measured 5x slower (2.25s vs 0.4s for sf0.1
    trigrams on one thread). ``zip_with`` streams the window arrays
    pairwise. Lambda variables are numbered per nesting level — Spark
    rejects shadowed lambda argument names."""
    length = f"greatest(size({toks}) - {n - 1}, 0)"
    expr = f"slice({toks}, 1, {length})"
    for j in range(1, n):
        expr = (
            f"zip_with({expr}, slice({toks}, {j + 1}, {length}), "
            f"(x{j}, y{j}) -> concat(x{j}, ' ', y{j}))"
        )
    return f"array_distinct({expr})"


def duck_ngrams(n: int, toks_expr: str) -> str:
    """Distinct word n-grams (DuckDB, 1-based lists)."""
    parts = " || ' ' || ".join(f"{toks_expr}[i + {j}]" for j in range(n))
    return (
        f"list_distinct(list_transform(range(1, len({toks_expr}) - {n} + 2), "
        f"i -> {parts}))"
    )
