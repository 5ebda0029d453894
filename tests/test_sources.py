"""Source connector tests: format readers, directory registration,
binaryFile ingest, JDBC option construction."""

from __future__ import annotations

import pytest

from golang_db_query_engine_elasticsearch_indexer_spark import sources
from golang_db_query_engine_elasticsearch_indexer_spark.errors import (
    IncorrectDbDriverError,
)

from tests.conftest import SF_DIR


def test_read_parquet_table(spark):
    df = sources.read_table(spark, f"{SF_DIR}/region.parquet", "parquet")
    assert df.count() == 5


def test_unknown_format_raises(spark):
    with pytest.raises(IncorrectDbDriverError):
        sources.read_table(spark, "/tmp/x", "avro-nope")


def test_csv_json_round_trip(spark, tables, tmp_path):
    region = spark.table("region")
    csv_dir = str(tmp_path / "csvdb")
    region.write.option("header", "true").csv(csv_dir + "/region.csv")
    region.write.json(str(tmp_path / "jsondb") + "/region.json")

    got_csv = sources.register_dir(spark, csv_dir)
    assert set(got_csv) == {"region"}
    assert got_csv["region"].count() == 5
    assert {r.r_name for r in got_csv["region"].collect()} == {
        r.r_name for r in region.collect()
    }

    got_json = sources.register_dir(spark, str(tmp_path / "jsondb"))
    assert got_json["region"].count() == 5
    # re-register the fixture views (round-trip clobbered 'region')
    from golang_db_query_engine_elasticsearch_indexer_spark.session import (
        register_sf_dir,
    )

    register_sf_dir(spark, SF_DIR)


def test_binary_dir_schema_and_content(spark, tmp_path):
    (tmp_path / "a.bin").write_bytes(b"\x00\x01payload-a")
    (tmp_path / "b.bin").write_bytes(b"payload-b")
    (tmp_path / "skip.txt").write_text("nope")
    df = sources.read_binary_dir(spark, str(tmp_path), glob="*.bin")
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.bin", "b.bin"}
    assert bytes(rows["a.bin"].content) == b"\x00\x01payload-a"
    assert rows["b.bin"].length == 9
    names = {f.name for f in df.schema.fields}
    assert {"path", "modificationTime", "length", "content"} <= names


def test_jdbc_options_partitioned():
    opts = sources.jdbc_options(
        url="jdbc:mysql://h:3306/db",
        table="orders",
        user="u",
        password="p",
        partition_column="o_orderkey",
        num_partitions=16,
        lower_bound=1,
        upper_bound=1_000_000,
    )
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["numPartitions"] == "16"
    assert opts["dbtable"] == "orders"


def test_jdbc_options_partition_requires_bounds():
    with pytest.raises(ValueError):
        sources.jdbc_options(
            url="jdbc:mysql://h/db", table="t", partition_column="id"
        )
