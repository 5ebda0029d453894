"""Shared fixtures: one SparkSession per test run, DuckDB oracle per sf dir."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from golang_db_query_engine_elasticsearch_indexer_spark.oracle import duckdb_connection
from golang_db_query_engine_elasticsearch_indexer_spark.session import (
    build_session,
    register_sf_dir,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="engine-tests",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    return register_sf_dir(spark, sf_dir)


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()
