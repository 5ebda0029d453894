"""Differential correctness: every declared query vs the DuckDB oracle.

This is the engine-side mirror of the driver's t2 gate (SURVEY.md §5
item 1): each ``__spark_entry__.queries()`` entry with an oracle must
match on columns, row count, and sorted canonical values at the test
scale factor.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from golang_db_query_engine_elasticsearch_indexer_spark.oracle import compare

ALL = entrymod.queries()
ORACLES = entrymod.oracle_sql()
WITH_ORACLE = sorted(n for n in ALL if n in ORACLES)
ROWS_ONLY = sorted(n for n in ALL if n not in ORACLES)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(name, spark, sf_dir, duck, tables):
    df = ALL[name](spark, sf_dir)
    ok, diag = compare(df, duck, ORACLES[name])
    assert ok, f"{name}: {diag}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(name, spark, sf_dir, tables):
    df = ALL[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
