"""Tests for the Python Data Source bulk sink (sources/es_datasource.py)
against the in-process stub ES: batch roundtrip on both serialization
paths, overwrite recreate, explicit mapping, chunking, 429 retry,
per-item failure accounting, refresh-on-commit, and a streaming epoch
write — the same behavioral matrix the HttpBulkSink suite pins, now
through ``df.write.format("elastic_bulk")``.
"""

from __future__ import annotations

import json

import pytest

from golang_db_query_engine_elasticsearch_indexer_spark.gateway import query_df
from golang_db_query_engine_elasticsearch_indexer_spark.sources.es_datasource import (
    ElasticBulkDataSource,
    _BulkConfig,
    register,
    write_dataframe,
)

SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
WHERE o_totalprice > 250000
"""


@pytest.fixture()
def es_stub():
    from es_stub import StubES

    made = []

    def make(**kwargs):
        stub = StubES(**kwargs)
        stub.start()
        made.append(stub)
        return stub

    yield make
    for stub in made:
        stub.stop()


def test_write_dataframe_fast_path_roundtrip(spark, tables, es_stub):
    """JVM-side to_json fast path: every row lands, ids from id_col,
    document content equals the row values."""
    stub = es_stub()
    df = query_df(spark, SQL)
    write_dataframe(df, "orders_ds", id_col="o_orderkey", url=stub.base_url)
    docs = stub.docs("orders_ds")
    expect = {str(r.o_orderkey): r for r in df.collect()}
    assert set(docs) == set(expect)
    for k, r in expect.items():
        assert docs[k]["o_orderstatus"] == r.o_orderstatus
        assert docs[k]["o_totalprice"] == pytest.approx(r.o_totalprice)


def test_self_serialize_path_and_auto_ids(spark, es_stub):
    """Without doc_col the task writer JSON-renders Arrow batch rows
    itself; without id_col ES assigns ids (stub: auto-N)."""
    stub = es_stub()
    register(spark)
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "k int, s string, v double"
    )
    (
        df.write.format("elastic_bulk")
        .mode("append")
        .option("url", stub.base_url)
        .option("index", "selfser")
        .save()
    )
    docs = stub.docs("selfser")
    assert len(docs) == 2
    assert all(i.startswith("auto-") for i in docs)
    assert {d["s"] for d in docs.values()} == {"a", "b"}
    assert {d["k"] for d in docs.values()} == {1, 2}


def test_overwrite_mode_deletes_then_recreates(spark, es_stub):
    stub = es_stub()
    register(spark)
    df1 = spark.createDataFrame([(1, "old")], "k int, s string")
    df2 = spark.createDataFrame([(9, "new")], "k int, s string")
    for df, mode in ((df1, "append"), (df2, "overwrite")):
        (
            df.write.format("elastic_bulk")
            .mode(mode)
            .option("url", stub.base_url)
            .option("index", "ow")
            .option("id_col", "k")
            .save()
        )
    assert stub.deletes == ["ow"]
    docs = stub.docs("ow")
    assert set(docs) == {"9"}  # the append-epoch doc is gone
    assert docs["9"]["s"] == "new"


def test_explicit_mapping_derived_from_schema(spark, es_stub):
    """Self-serialize path + explicit_mapping: the PUT create carries
    typed mappings for the DOCUMENT columns (id_col excluded)."""
    stub = es_stub()
    register(spark)
    df = spark.createDataFrame(
        [(1, "t", 2.0, True)], "k long, s string, v double, b boolean"
    )
    (
        df.write.format("elastic_bulk")
        .mode("append")
        .option("url", stub.base_url)
        .option("index", "mapped")
        .option("id_col", "k")
        .option("explicit_mapping", "true")
        .save()
    )
    props = stub.create_bodies["mapped"]["mappings"]["properties"]
    assert "k" not in props  # the id column is not a document field
    assert props["s"]["type"] == "text"
    assert props["v"]["type"] == "double"
    assert props["b"]["type"] == "boolean"


def test_chunking_and_retry_on_429(spark, tables, es_stub):
    """Tiny flush_bytes forces many _bulk requests; the stub 429s the
    first two whole requests and the writer retries them through."""
    stub = es_stub(reject_first_n_bulk=2)
    df = query_df(spark, SQL)
    n = df.count()
    write_dataframe(
        df,
        "chunked",
        id_col="o_orderkey",
        url=stub.base_url,
        flush_bytes=512,
        retry_wait=0.01,
    )
    assert len(stub.docs("chunked")) == n
    assert stub.bulk_requests > 2  # multiple chunks + the 429 retries


def test_per_item_failures_counted_not_stored(spark, es_stub):
    """Per-item 500s: failed docs are not stored, and the task commit
    message carries the reference's flushed/failed accounting
    (OnSuccess/OnFailure, elastic_controller.go:210-222). The counter
    is asserted by driving the task writer directly with an Arrow
    batch — the exact seam Spark calls — so the accounting is pinned
    without scraping driver logs."""
    import pyarrow as pa

    from golang_db_query_engine_elasticsearch_indexer_spark.sources.es_datasource import (
        _write_batches,
    )

    stub = es_stub(fail_ids=["2"])
    register(spark)
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, s string")
    (
        df.write.format("elastic_bulk")
        .mode("append")
        .option("url", stub.base_url)
        .option("index", "fails")
        .option("id_col", "k")
        .save()
    )
    docs = stub.docs("fails")
    assert set(docs) == {"1", "3"}

    cfg = _BulkConfig.from_options(
        {"index": "fails2", "url": stub.base_url, "id_col": "k"}
    )
    batch = pa.RecordBatch.from_pylist(
        [{"k": 1, "s": "a"}, {"k": 2, "s": "b"}, {"k": 3, "s": "c"}]
    )
    res = _write_batches(cfg, iter([batch]))
    assert (res.n_ok, res.n_failed, res.n_requests) == (2, 1, 1)


def test_refresh_on_commit(spark, es_stub):
    stub = es_stub()
    register(spark)
    df = spark.createDataFrame([(1, "a")], "k int, s string")
    (
        df.write.format("elastic_bulk")
        .mode("append")
        .option("url", stub.base_url)
        .option("index", "fresh")
        .option("id_col", "k")
        .option("refresh_on_commit", "true")
        .save()
    )
    assert stub.refreshes == ["fresh"]


def test_streaming_epoch_write(spark, tables, es_stub, tmp_path):
    """writeStream.format('elastic_bulk') drains an availableNow file
    stream into the stub — per-epoch commit, deterministic ids."""
    stub = es_stub()
    register(spark)
    src = str(tmp_path / "src")
    query_df(spark, SQL).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = (
        stream.writeStream.format("elastic_bulk")
        .option("url", stub.base_url)
        .option("index", "streamed")
        .option("id_col", "o_orderkey")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    expect = {str(r.o_orderkey) for r in query_df(spark, SQL).collect()}
    assert set(stub.docs("streamed")) == expect


def test_missing_index_option_raises(spark):
    register(spark)
    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(Exception, match="index"):
        df.write.format("elastic_bulk").mode("append").option(
            "url", "http://x"
        ).save()


def test_config_parsing_auth_and_defaults():
    cfg = _BulkConfig.from_options(
        {"index": "i", "url": "es:9200", "username": "u", "password": "p"}
    )
    assert cfg.base_url == "http://es:9200"
    import base64

    assert cfg.headers["Authorization"] == "Basic " + base64.b64encode(
        b"u:p"
    ).decode()
    assert cfg.flush_bytes == 5 * 1024 * 1024
    assert cfg.max_retries == 5
    assert ElasticBulkDataSource.name() == "elastic_bulk"


def test_fast_path_documents_match_http_sink(spark, tables, es_stub):
    """The Data Source writes byte-identical documents to the engine's
    HttpBulkSink for the same frame (same to_json rendering, same
    wire protocol) — the two paths are interchangeable."""
    from golang_db_query_engine_elasticsearch_indexer_spark.indexer import (
        HttpBulkSink,
        with_positional_ids,
    )

    stub = es_stub()
    df = query_df(spark, SQL)
    with_id = with_positional_ids(df, order_cols=["o_orderkey"])
    HttpBulkSink(base_url=stub.base_url).write(spark, with_id, "via_sink")
    write_dataframe(with_id, "via_ds", id_col="_id", url=stub.base_url)
    assert stub.docs("via_sink") == stub.docs("via_ds")


def test_save_routes_through_datasource_sink(spark, tables, es_stub):
    """indexer.save (the POST /elastic/save/ semantics) with the Data
    Source sink: positional IDs, same documents as the HttpBulkSink
    route, stats carry the lineage count."""
    from golang_db_query_engine_elasticsearch_indexer_spark.indexer import save
    from golang_db_query_engine_elasticsearch_indexer_spark.sources.es_datasource import (
        ElasticDataSourceSink,
    )

    stub = es_stub()
    stats = save(
        spark,
        SQL,
        "saved_ds",
        ElasticDataSourceSink(stub.base_url),
        order_cols=["o_orderkey"],
    )
    n = query_df(spark, SQL).count()
    assert stats.num_docs == n
    docs = stub.docs("saved_ds")
    assert set(docs) == {str(i) for i in range(1, n + 1)}  # positional ids
    assert stats.docs_per_sec > 0
