"""Logical-plan inspection: the SELECT-only access-control gate.

Reference parity: the reference gates with ``sqlparser.Parse`` +
regex ``^select|SELECT`` (query_controller.go:16-35). That regex is
bypassable (SURVEY.md Q1: ``DELETE FROM t WHERE id IN (SELECT ...)``
passes; ``Select * ...`` is rejected). We enforce the *intent* —
read-only queries — by parsing with Spark's own parser and rejecting
any plan that is a command/DML node. One parser, one dialect (fixes
SURVEY.md Q3), and the gate runs BEFORE ``spark.sql`` so eager-executed
commands (DDL runs at ``spark.sql`` call time) can never fire.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from golang_db_query_engine_elasticsearch_indexer_spark.errors import (
    SqlSyntaxError,
    UnauthorizedOperationError,
)

# Fallback-gate keywords: statements that may legally open a read-only
# query in Spark SQL. Everything else is a command.
_QUERY_HEAD = re.compile(r"^(select|with|values|table|from)\b", re.IGNORECASE)
# Command keywords that can appear after a WITH clause (CTE-prefixed DML).
_EMBEDDED_COMMAND = re.compile(
    r"\b(insert|update|delete|merge|create|drop|alter|truncate|replace|grant|revoke|"
    r"set|reset|cache|uncache|refresh|analyze|msck|load|unload|copy|call|declare|"
    r"describe|show|use|optimize|vacuum)\b",
    re.IGNORECASE,
)

_COMMAND_BASE_CLASSES = (
    "org.apache.spark.sql.catalyst.plans.logical.Command",
    "org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement",
    "org.apache.spark.sql.catalyst.plans.logical.ParsedStatement",
)


def _strip_comments(sql: str) -> str:
    sql = re.sub(r"/\*.*?\*/", " ", sql, flags=re.DOTALL)
    sql = re.sub(r"--[^\n]*", " ", sql)
    return sql.strip().lstrip("(").strip()


def _strip_strings(sql: str) -> str:
    """Remove quoted literals/identifiers so keyword scans can't be fooled
    by e.g. WHERE note = 'please insert here'."""
    return re.sub(r"('([^']|'')*')|(\"([^\"]|\"\")*\")|(`[^`]*`)", "''", sql)


def parse_plan(spark: SparkSession, sql: str):
    """Parse via Spark's session parser; raise SqlSyntaxError on bad syntax.

    Returns the JVM logical plan, or None when the JVM parser is not
    reachable (Spark Connect) — callers then rely on the textual gate.
    """
    try:
        jss = spark._jsparkSession  # type: ignore[attr-defined]
    except Exception:
        return None
    from py4j.protocol import Py4JJavaError

    try:
        return jss.sessionState().sqlParser().parsePlan(sql)
    except Py4JJavaError as e:  # ParseException
        raise SqlSyntaxError(f"SQL syntax error: {e.java_exception.getMessage()}") from None
    except Exception as e:
        if type(e).__name__ in ("ParseException", "AnalysisException"):
            raise SqlSyntaxError(f"SQL syntax error: {e}") from None
        return None


def _plan_is_command(spark: SparkSession, plan) -> bool:
    """True if any node in the parsed tree is a command/DML statement.

    BFS over children: a command can hide under a CTE head
    (``WITH x AS (...) INSERT INTO ...`` parses to UnresolvedWith →
    InsertIntoStatement), so checking only the root is the same Q1-class
    hole the reference has.
    """
    jvm = spark.sparkContext._jvm  # type: ignore[attr-defined]
    classes = []
    for cls_name in _COMMAND_BASE_CLASSES:
        try:
            classes.append(jvm.java.lang.Class.forName(cls_name))
        except Exception:
            continue
    queue, seen = [plan], 0
    while queue and seen < 10_000:
        node = queue.pop()
        seen += 1
        if any(cls.isInstance(node) for cls in classes):
            return True
        try:
            children = node.children()
            for i in range(children.size()):
                queue.append(children.apply(i))
        except Exception:
            continue
    return False


def assert_select_only(spark: SparkSession, sql: str) -> None:
    """Raise UnauthorizedOperationError unless ``sql`` is a read-only query.

    Two layers: (1) textual pre-gate (statement must open like a query
    and contain no command keyword outside string literals — catches
    ``WITH ... INSERT INTO`` which opens like a query); (2) the
    authoritative parsed-plan type check when the JVM is reachable.
    Layer 2 is what fixes reference quirk Q1.
    """
    bare = _strip_comments(sql)
    if not bare:
        raise SqlSyntaxError("SQL syntax error: empty statement")

    # Parse first so bad syntax yields 400 (queryValidator order,
    # query_controller.go:78-93), then the authoritative plan-type gate.
    plan = parse_plan(spark, sql)
    if plan is not None:
        if _plan_is_command(spark, plan):
            raise UnauthorizedOperationError()
        return
    # Textual fallback only (no JVM plan available, e.g. Spark Connect).
    if not _QUERY_HEAD.match(bare):
        raise UnauthorizedOperationError()
    if _EMBEDDED_COMMAND.search(_strip_strings(bare)):
        raise UnauthorizedOperationError()


def explain_str(df, mode: str = "formatted") -> str:
    """Physical-plan text (for plan assertions in tests / observability)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )
