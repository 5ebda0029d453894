"""Elasticsearch ``_bulk`` sink as a PySpark Python Data Source.

The reference ships its documents to Elasticsearch through
``esutil.BulkIndexer`` (POST ``/_bulk``; elastic_controller.go:184-250)
behind an HTTP route. The engine already speaks that wire protocol from
executors (`indexer.HttpBulkSink`); this module lifts the same protocol
into Spark's first-class writer seam — the Python Data Source API
(public since Spark 4.0) — so the sink composes with everything
``DataFrameWriter``/``DataStreamWriter`` already gives us:

    spark.dataSource.register(ElasticBulkDataSource)
    df.write.format("elastic_bulk").mode("append") \
        .option("url", "http://es:9200").option("index", "docs").save()
    stream.writeStream.format("elastic_bulk")...   # per-epoch commits

versus the connector jar the container lacks (`ElasticsearchSink`) and
the engine-API `HttpBulkSink.write`. All three speak the identical
``_bulk`` protocol; the Data Source is the one a plain
``spark.read/write`` user reaches first.

Scale shape (unchanged from HttpBulkSink, by construction):

- the task writer is a ``DataSourceArrowWriter``: partitions arrive as
  Arrow ``RecordBatch``es, NOT per-row pickled Rows — the same Arrow
  seam as the engine's ``mapInPandas`` paths;
- the fast path keeps document serialization JVM-side: callers (or the
  ``write_dataframe`` helper below) pre-render a JSON string column
  with ``to_json(struct(*))`` and name it via ``doc_col``, so Python
  only slices strings into NDJSON flush buffers;
- without ``doc_col`` the writer self-serializes each batch row (a
  convenience path for small/ad-hoc writes — canonical JSON with
  ISO dates, base64 binary per the ES convention);
- one flush buffer per task (``flush_bytes``, default 5 MB — parity
  elastic_controller.go:46), time-based flush (``flush_interval_sec``,
  default 30 s — parity :149), request-level retry on 429/502/503/504
  (:52-64) via the shared `indexer.post_bulk_ndjson`;
- counters ride the commit protocol instead of a side DataFrame: each
  task returns ``BulkWriteResult(n_ok, n_failed, n_requests)`` and the
  driver-side ``commit`` aggregates them — the reference's
  OnSuccess/OnFailure accounting (:210-222) expressed as Spark's own
  commit barrier (SURVEY §2.A A15/A16);
- delivery is at-least-once (a task retry after a successful flush
  re-posts): give ``id_col`` a deterministic id and re-delivery
  degrades to an idempotent upsert — the same discipline as the
  positional-ID indexer. ``abort`` therefore removes nothing.

Index lifecycle runs driver-side in ``writer()``/``streamWriter()``:
``mode("append")`` auto-creates HEAD-then-PUT (parity :161-181, with
the optional schema-derived explicit mapping — the A12 improvement);
``mode("overwrite")`` DELETEs then recreates. ``commit`` optionally
POSTs ``/{index}/_refresh`` (``refresh_on_commit``) so a strictly
ordered pipeline reads its own writes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamWriter,
    WriterCommitMessage,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyarrow import RecordBatch
    from pyspark.sql import DataFrame
    from pyspark.sql.types import StructType

FORMAT_NAME = "elastic_bulk"


@dataclass
class BulkWriteResult(WriterCommitMessage):
    """Per-task accounting, aggregated by the driver in commit()."""

    n_ok: int = 0
    n_failed: int = 0
    n_requests: int = 0


def _json_default(v):
    """Canonical JSON for the self-serialize path: ISO dates, base64
    binary (the ES ``binary`` field convention), floats for Decimal."""
    import base64
    import datetime as _dt
    import decimal

    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode()
    raise TypeError(f"not JSON serializable: {type(v).__name__}")


@dataclass
class _BulkConfig:
    """Validated option set, picklable to executors."""

    base_url: str
    index: str
    id_col: str | None
    doc_col: str | None
    headers: dict[str, str]
    flush_bytes: int
    flush_interval_sec: float
    max_retries: int
    retry_wait: float
    timeout: float
    refresh_on_commit: bool
    explicit_mapping: bool

    @classmethod
    def from_options(cls, options) -> "_BulkConfig":
        def opt(key: str, default=None):
            return options.get(key, default)

        index = opt("index")
        if not index:
            raise ValueError(
                "elastic_bulk requires .option('index', <name>) — the "
                "reference's route parameter (elastic_controller.go:118)"
            )
        base_url = str(opt("url", "http://localhost:9200"))
        if "://" not in base_url:
            base_url = "http://" + base_url
        headers = {"Content-Type": "application/x-ndjson"}
        username = opt("username")
        if username:
            import base64

            headers["Authorization"] = "Basic " + base64.b64encode(
                f"{username}:{opt('password', '')}".encode()
            ).decode()
        return cls(
            base_url=base_url.rstrip("/"),
            index=str(index),
            id_col=opt("id_col"),
            doc_col=opt("doc_col"),
            headers=headers,
            flush_bytes=int(opt("flush_bytes", 5 * 1024 * 1024)),
            flush_interval_sec=float(opt("flush_interval_sec", 30.0)),
            max_retries=int(opt("max_retries", 5)),
            retry_wait=float(opt("retry_wait", 0.2)),
            timeout=float(opt("timeout", 10.0)),
            refresh_on_commit=str(opt("refresh_on_commit", "false")).lower()
            == "true",
            explicit_mapping=str(opt("explicit_mapping", "false")).lower()
            == "true",
        )

    def sink(self):
        """Driver-side index-management face (HEAD/PUT/DELETE/refresh) —
        the same HttpBulkSink the engine API exposes, configured from
        these options."""
        from golang_db_query_engine_elasticsearch_indexer_spark.indexer import (
            HttpBulkSink,
        )

        s = HttpBulkSink(
            base_url=self.base_url,
            flush_bytes=self.flush_bytes,
            max_retries=self.max_retries,
            retry_wait=self.retry_wait,
            timeout=self.timeout,
            flush_interval_sec=self.flush_interval_sec,
            explicit_mapping=self.explicit_mapping,
        )
        # reuse the already-built auth header rather than re-deriving
        if "Authorization" in self.headers:
            s._auth = self.headers["Authorization"]
        return s


def _write_batches(cfg: _BulkConfig, iterator: Iterator["RecordBatch"]) -> BulkWriteResult:
    """Task-side NDJSON chunker shared by the batch and stream writers:
    one flush buffer per task regardless of partition size."""
    import json as _json
    import time as _time

    from golang_db_query_engine_elasticsearch_indexer_spark.indexer import (
        post_bulk_ndjson,
    )

    n_ok = n_failed = n_requests = 0
    lines: list[str] = []
    buf = 0
    last_flush = _time.monotonic()

    def flush():
        nonlocal n_ok, n_failed, n_requests, lines, buf, last_flush
        ok, failed = post_bulk_ndjson(
            cfg.base_url,
            cfg.headers,
            lines,
            max_retries=cfg.max_retries,
            retry_wait=cfg.retry_wait,
            timeout=cfg.timeout,
        )
        n_ok += ok
        n_failed += failed
        n_requests += 1
        lines, buf = [], 0
        last_flush = _time.monotonic()

    for batch in iterator:
        names = batch.schema.names
        if cfg.doc_col is not None:
            # fast path: the document is already a JVM-rendered JSON
            # string; Python never touches field values.
            docs = batch.column(names.index(cfg.doc_col)).to_pylist()
            ids = (
                batch.column(names.index(cfg.id_col)).to_pylist()
                if cfg.id_col
                else [None] * len(docs)
            )
            rows = zip(ids, docs)
        else:
            pyrows = batch.to_pylist()
            rows = (
                (
                    (r.pop(cfg.id_col) if cfg.id_col else None),
                    _json.dumps(r, default=_json_default),
                )
                for r in pyrows
            )
        for doc_id, doc in rows:
            meta: dict = {"_index": cfg.index}
            if doc_id is not None:
                meta["_id"] = str(doc_id)
            action = _json.dumps({"index": meta})
            lines.extend((action, doc))
            buf += len(action) + len(doc) + 2
            if buf >= cfg.flush_bytes or (
                _time.monotonic() - last_flush >= cfg.flush_interval_sec
            ):
                flush()
    if lines:
        flush()
    return BulkWriteResult(n_ok=n_ok, n_failed=n_failed, n_requests=n_requests)


class ElasticBulkWriter(DataSourceArrowWriter):
    def __init__(self, cfg: _BulkConfig):
        self.cfg = cfg

    def write(self, iterator: Iterator["RecordBatch"]) -> BulkWriteResult:
        return _write_batches(self.cfg, iterator)

    def commit(self, messages) -> None:
        ok = sum(m.n_ok for m in messages if m)
        failed = sum(m.n_failed for m in messages if m)
        if self.cfg.refresh_on_commit:
            self.cfg.sink().refresh(self.cfg.index)
        print(
            f"elastic_bulk commit index={self.cfg.index} "
            f"flushed={ok} failed={failed}"
        )

    def abort(self, messages) -> None:
        # At-least-once: flushed chunks stay (deterministic id_col makes
        # a rerun an idempotent upsert). Nothing to roll back.
        pass


class ElasticBulkStreamWriter(DataSourceStreamWriter):
    """Streaming face: same task chunker, per-epoch commit. Rows arrive
    as an iterator of Rows (the stream API's seam) and are adapted to
    one Arrow batch so the chunker is shared."""

    def __init__(self, cfg: _BulkConfig):
        self.cfg = cfg

    def write(self, iterator) -> BulkWriteResult:
        import pyarrow as pa

        cfg = self.cfg

        def batches():
            rows = [r.asDict(recursive=True) for r in iterator]
            if rows:
                yield pa.RecordBatch.from_pylist(rows)

        return _write_batches(cfg, batches())

    def commit(self, messages, batchId: int) -> None:
        ok = sum(m.n_ok for m in messages if m)
        failed = sum(m.n_failed for m in messages if m)
        if self.cfg.refresh_on_commit:
            self.cfg.sink().refresh(self.cfg.index)
        print(
            f"elastic_bulk epoch={batchId} index={self.cfg.index} "
            f"flushed={ok} failed={failed}"
        )

    def abort(self, messages, batchId: int) -> None:
        pass


class ElasticBulkDataSource(DataSource):
    """``df.write.format("elastic_bulk")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _prepare(self, schema: "StructType", overwrite: bool) -> _BulkConfig:
        cfg = _BulkConfig.from_options(self.options)
        sink = cfg.sink()
        if overwrite:
            sink.delete_index(cfg.index)
        doc_schema = schema
        if cfg.id_col and not cfg.doc_col:
            doc_schema = type(schema)(
                [f for f in schema.fields if f.name != cfg.id_col]
            )
        sink.ensure_index(cfg.index, schema=None if cfg.doc_col else doc_schema)
        return cfg

    def writer(self, schema: "StructType", overwrite: bool) -> ElasticBulkWriter:
        return ElasticBulkWriter(self._prepare(schema, overwrite))

    def streamWriter(
        self, schema: "StructType", overwrite: bool
    ) -> ElasticBulkStreamWriter:
        return ElasticBulkStreamWriter(self._prepare(schema, overwrite))


def register(spark) -> None:
    """Idempotent format registration."""
    spark.dataSource.register(ElasticBulkDataSource)


class ElasticDataSourceSink:
    """The Data Source seam wearing the engine's sink interface
    (``write(spark, df_with_id, index_name) -> IndexStats``), so
    ``indexer.save`` — the POST /elastic/save/ path — can route the
    same lineage through ``df.write.format("elastic_bulk")`` instead
    of the mapInPandas sink. Counters ride the commit protocol, which
    does not report back to the caller, so ``IndexStats.num_docs`` is
    the lineage count and ``num_failed`` is NOT observable here (use
    ``HttpBulkSink`` when per-item failure accounting must reach the
    API response; the commit log still carries it)."""

    def __init__(self, base_url: str = "http://localhost:9200", **options):
        self.base_url = base_url
        self.options = options

    def write(self, spark, df_with_id, index_name: str):
        import time as _time  # noqa: PLC0415

        from golang_db_query_engine_elasticsearch_indexer_spark.indexer import (  # noqa: PLC0415
            ID_COL,
            IndexStats,
        )

        t0 = _time.time()
        n = df_with_id.count()
        write_dataframe(
            df_with_id,
            index_name,
            id_col=ID_COL,
            url=self.base_url,
            **self.options,
        )
        return IndexStats(index_name, num_docs=n, took_sec=_time.time() - t0)


def write_dataframe(
    df: "DataFrame",
    index_name: str,
    *,
    id_col: str | None = None,
    mode: str = "append",
    **options,
) -> None:
    """Convenience wrapper keeping serialization JVM-side: renders
    ``to_json(struct(<all non-id columns>))`` into ``__doc`` (the same
    hot path HttpBulkSink.write uses), registers the format, and writes
    through the Data Source seam."""
    from pyspark.sql import functions as F

    register(df.sparkSession)
    doc_cols = [c for c in df.columns if c != id_col]
    payload = df.select(
        *( [F.col(id_col).cast("string").alias("__id")] if id_col else [] ),
        F.to_json(F.struct(*doc_cols)).alias("__doc"),
    )
    w = (
        payload.write.format(FORMAT_NAME)
        .mode(mode)
        .option("index", index_name)
        .option("doc_col", "__doc")
    )
    if id_col:
        w = w.option("id_col", "__id")
    for k, v in options.items():
        w = w.option(k, str(v))
    w.save()
