"""Elasticsearch sliced-scroll READER as a PySpark Python Data Source.

The write half of the reference's pipeline ships documents INTO
Elasticsearch (elastic_controller.go:184-250; our `elastic_bulk`
format). This module is the read half a Spark user needs next:

    spark.read.format("elastic_scroll") \
        .option("url", es).option("index", "docs").load() \
        .where("price > 100")

Scale shape:

- **partition-parallel reads**: ES's sliced scroll splits one scan
  into ``slices`` disjoint streams (the ``slice`` request parameter) —
  each Spark partition owns one slice, so read parallelism is a knob,
  not a single-threaded cursor. ``partitions()`` returns one
  ``InputPartition`` per slice.
- **filter pushdown** (Spark 4.1 ``pushFilters``): equality, range,
  IN, null tests and string prefix/suffix/contains on top-level
  columns translate to an ES ``bool.filter`` so the cluster prunes
  documents BEFORE they cross the wire. Pushdown here is
  *conservative*: every filter is ALSO returned to Spark for
  re-evaluation, because ES term semantics on analyzed ``text``
  fields differ from SQL equality — string predicates therefore
  target the ``.keyword`` sub-field (the engine's own write-side
  mapping convention, `indexer.es_mapping_for_schema`), and Spark's
  re-check guarantees exactness even against foreign mappings. The
  win is transfer volume, never correctness.
- **mapping-derived schema**: with no user schema, ``schema()`` GETs
  ``/{index}/_mapping`` and inverts the engine's own type mapping
  (long/double/boolean/date/binary/text→string, nested
  ``properties``→struct). ES cannot represent array-ness in a mapping
  (arrays are implicit), so array columns need an explicit
  ``.schema(...)`` — the reader raises a clear error for bare
  ``object`` mappings rather than guessing.
- **bounded memory**: one scroll page (``page_size`` docs) per
  partition in flight; the scroll cursor is cleared (DELETE
  ``/_search/scroll``) when a partition drains.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from typing import TYPE_CHECKING, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

if TYPE_CHECKING:  # pragma: no cover
    pass

FORMAT_NAME = "elastic_scroll"


def _http_json(
    method: str,
    url: str,
    body: dict | None,
    headers: dict[str, str],
    timeout: float,
) -> dict:
    import urllib.request

    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method, headers=headers)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read() or b"{}")


@dataclass
class _ScrollConfig:
    base_url: str
    index: str
    slices: int
    page_size: int
    scroll_keep: str
    timeout: float
    headers: dict[str, str]
    #: schema column rehydrated from each hit's ``_id`` (the write
    #: side's id_col excludes that column from ``_source``, so reading
    #: it back means reading the document id)
    id_col: str | None = None

    @classmethod
    def from_options(cls, options) -> "_ScrollConfig":
        index = options.get("index")
        if not index:
            raise ValueError("elastic_scroll requires .option('index', <name>)")
        base_url = str(options.get("url", "http://localhost:9200"))
        if "://" not in base_url:
            base_url = "http://" + base_url
        headers = {"Content-Type": "application/json"}
        username = options.get("username")
        if username:
            import base64

            headers["Authorization"] = "Basic " + base64.b64encode(
                f"{username}:{options.get('password', '')}".encode()
            ).decode()
        return cls(
            base_url=base_url.rstrip("/"),
            index=str(index),
            slices=int(options.get("slices", 4)),
            page_size=int(options.get("page_size", 1000)),
            scroll_keep=str(options.get("scroll_keep", "2m")),
            timeout=float(options.get("timeout", 10.0)),
            headers=headers,
            id_col=options.get("id_col"),
        )


def schema_for_es_mapping(props: dict) -> StructType:
    """Inverse of `indexer.es_mapping_for_schema`: an ES mapping's
    ``properties`` as a Spark schema. Field order is name-sorted (ES
    mappings are unordered JSON objects)."""

    def spark_type(spec: dict):
        if "properties" in spec:
            return StructType(
                [
                    StructField(n, spark_type(s), True)
                    for n, s in sorted(spec["properties"].items())
                ]
            )
        t = spec.get("type", "text")
        scalar = {
            "long": LongType(),
            "integer": IntegerType(),
            "short": ShortType(),
            "byte": ByteType(),
            "double": DoubleType(),
            "float": FloatType(),
            "half_float": FloatType(),
            "boolean": BooleanType(),
            # NTZ: the engine's session convention (timestampType =
            # TIMESTAMP_NTZ) and what the write path serializes
            # (isoformat without a zone suffix)
            "date": TimestampNTZType(),
            "binary": BinaryType(),
            "text": StringType(),
            "keyword": StringType(),
        }.get(t)
        if scalar is None:
            raise ValueError(
                f"cannot infer a Spark type for ES mapping type {t!r} — "
                "pass an explicit .schema(...) (ES mappings also cannot "
                "express arrays; array columns always need one)"
            )
        return scalar

    return StructType(
        [
            StructField(name, spark_type(spec), True)
            for name, spec in sorted(props.items())
        ]
    )


def _converter(dt):
    """JSON value -> Spark external type for one schema field."""
    import base64
    import datetime as _dt

    if isinstance(dt, (LongType, IntegerType, ShortType, ByteType)):
        return lambda v: None if v is None else int(v)
    if isinstance(dt, (DoubleType, FloatType)):
        return lambda v: None if v is None else float(v)
    if isinstance(dt, BooleanType):
        return lambda v: None if v is None else bool(v)
    if isinstance(dt, StringType):
        return lambda v: None if v is None else str(v)
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return lambda v: None if v is None else _dt.datetime.fromisoformat(v)
    if isinstance(dt, DateType):
        return lambda v: None if v is None else _dt.date.fromisoformat(v[:10])
    if isinstance(dt, BinaryType):
        return lambda v: None if v is None else base64.b64decode(v)
    if isinstance(dt, ArrayType):
        elem = _converter(dt.elementType)
        # ES arrays are implicit: a single JSON scalar is a 1-element
        # array under an array-typed schema.
        return lambda v: (
            None
            if v is None
            else [elem(x) for x in (v if isinstance(v, list) else [v])]
        )
    if isinstance(dt, StructType):
        convs = [(f.name, _converter(f.dataType)) for f in dt.fields]
        return lambda v: (
            None if v is None else tuple(c(v.get(n)) for n, c in convs)
        )
    raise ValueError(f"elastic_scroll cannot convert to {dt.simpleString()}")


def _es_clause(f: Filter, string_cols: set[str]) -> dict | None:
    """One Spark Filter as an ES query clause, or None if untranslatable.
    String predicates target ``<col>.keyword`` (exact, unanalyzed) —
    the engine's write-side mapping convention."""
    attr = getattr(f, "attribute", None)
    if not attr or len(attr) != 1:
        return None
    col = attr[0]
    kw = f"{col}.keyword" if col in string_cols else col

    def lit(v):
        return v if isinstance(v, (int, float, bool, str)) else None

    if isinstance(f, EqualTo):
        v = lit(f.value)
        return None if v is None else {"term": {kw if isinstance(v, str) else col: v}}
    if isinstance(f, In):
        vs = [lit(v) for v in f.value]
        if any(v is None for v in vs):
            return None
        key = kw if all(isinstance(v, str) for v in vs) else col
        return {"terms": {key: vs}}
    ranges = {
        GreaterThan: "gt",
        GreaterThanOrEqual: "gte",
        LessThan: "lt",
        LessThanOrEqual: "lte",
    }
    for cls, op in ranges.items():
        if isinstance(f, cls):
            v = lit(f.value)
            return None if v is None else {"range": {col: {op: v}}}
    if isinstance(f, IsNotNull):
        return {"exists": {"field": col}}
    if isinstance(f, IsNull):
        return {"bool": {"must_not": [{"exists": {"field": col}}]}}
    if isinstance(f, StringStartsWith):
        return {"prefix": {kw: f.value}}
    if isinstance(f, StringEndsWith):
        return {"wildcard": {kw: "*" + f.value}}
    if isinstance(f, StringContains):
        return {"wildcard": {kw: "*" + f.value + "*"}}
    return None


@dataclass
class ScrollPartition(InputPartition):
    slice_id: int
    n_slices: int


class ElasticScrollReaderNoPushdown(DataSourceReader):
    """The reader without a ``pushFilters`` method: Spark refuses any
    reader that implements it while
    ``spark.sql.python.filterPushdown.enabled`` is false (the engine's
    sessions enable it; ``.option("pushdown", "false")`` selects this
    class for foreign sessions that don't)."""

    def __init__(self, cfg: _ScrollConfig, schema: StructType):
        self.cfg = cfg
        self.schema = schema
        self.clauses: list[dict] = []

    def partitions(self) -> Sequence[InputPartition]:
        n = max(1, self.cfg.slices)
        return [ScrollPartition(i, n) for i in range(n)]

    def read(self, partition: ScrollPartition) -> Iterator[tuple]:
        cfg = self.cfg
        body: dict = {"size": cfg.page_size, "sort": ["_doc"]}
        if partition.n_slices > 1:
            body["slice"] = {"id": partition.slice_id, "max": partition.n_slices}
        if self.clauses:
            body["query"] = {"bool": {"filter": self.clauses}}
        # Column pruning pushed to ES: rows are built ONLY from schema
        # fields, so ask for exactly those (_source filtering) — the
        # id_col rides in _id, not _source. Whatever Spark projects
        # later, the wire never carries unrequested fields.
        body["_source"] = [
            f.name for f in self.schema.fields if f.name != cfg.id_col
        ]
        convs = [(f.name, _converter(f.dataType)) for f in self.schema.fields]
        url = f"{cfg.base_url}/{cfg.index}/_search?scroll={cfg.scroll_keep}"
        resp = _http_json("POST", url, body, cfg.headers, cfg.timeout)
        sid = resp.get("_scroll_id")
        try:
            while True:
                hits = resp.get("hits", {}).get("hits", [])
                if not hits:
                    break
                for h in hits:
                    src = h.get("_source", {})
                    if cfg.id_col:
                        src = {**src, cfg.id_col: h.get("_id")}
                    yield tuple(conv(src.get(name)) for name, conv in convs)
                resp = _http_json(
                    "POST",
                    f"{cfg.base_url}/_search/scroll",
                    {"scroll": cfg.scroll_keep, "scroll_id": sid},
                    cfg.headers,
                    cfg.timeout,
                )
        finally:
            if sid:
                try:
                    _http_json(
                        "DELETE",
                        f"{cfg.base_url}/_search/scroll",
                        {"scroll_id": sid},
                        cfg.headers,
                        cfg.timeout,
                    )
                except Exception:
                    pass  # cursor expiry is ES's fallback cleanup


class ElasticScrollReader(ElasticScrollReaderNoPushdown):
    def pushFilters(self, filters):  # noqa: N802 — API name
        string_cols = {
            f.name for f in self.schema.fields if isinstance(f.dataType, StringType)
        }
        for f in filters:
            # NEVER push a predicate on the id_col: that column lives
            # in _id, not _source, so a server-side term clause on it
            # would match zero documents and silently drop every row
            # (Spark's re-check can only re-filter what ES returned).
            attr = getattr(f, "attribute", None)
            if self.cfg.id_col and attr and attr[0] == self.cfg.id_col:
                continue
            clause = _es_clause(f, string_cols)
            if clause is not None:
                self.clauses.append(clause)
        # Conservative contract (see module docstring): every filter is
        # returned for Spark-side re-evaluation; the pushed clauses
        # only shrink what ES streams back.
        return filters


def _scroll_all(
    cfg: _ScrollConfig, query: dict | None, sort, source: list[str] | None = None
) -> Iterator[dict]:
    """Drain one full scroll (no slicing) yielding hit dicts — the
    shared pagination kernel for the streaming reader. ``source``
    prunes ``_source`` to the named fields server-side."""
    body: dict = {"size": cfg.page_size, "sort": sort}
    if query:
        body["query"] = query
    if source is not None:
        body["_source"] = source
    url = f"{cfg.base_url}/{cfg.index}/_search?scroll={cfg.scroll_keep}"
    resp = _http_json("POST", url, body, cfg.headers, cfg.timeout)
    sid = resp.get("_scroll_id")
    try:
        while True:
            hits = resp.get("hits", {}).get("hits", [])
            if not hits:
                break
            yield from hits
            resp = _http_json(
                "POST",
                f"{cfg.base_url}/_search/scroll",
                {"scroll": cfg.scroll_keep, "scroll_id": sid},
                cfg.headers,
                cfg.timeout,
            )
    finally:
        if sid:
            try:
                _http_json(
                    "DELETE",
                    f"{cfg.base_url}/_search/scroll",
                    {"scroll_id": sid},
                    cfg.headers,
                    cfg.timeout,
                )
            except Exception:
                pass


class ElasticScrollStreamReader(SimpleDataSourceStreamReader):
    """Tail an ES index as a structured stream: each microbatch reads
    every document whose ``cursor_col`` exceeds the last offset.

    Offset = ``{"cursor": <last seen value>}`` — valid because the
    cursor column is REQUIRED to be monotone under ingestion (an
    ingestion sequence number or event-time the writer only appends
    past; the standard tailing contract — a doc arriving later with a
    smaller cursor than an already-committed offset is silently
    skipped, exactly like a file arriving in an already-listed hour of
    a partitioned directory). Replays are exactly-once because
    ``readBetweenOffsets`` re-issues the same (gt start, lte end) range
    query. A SIMPLE stream reader reads on the driver — right for
    incremental tailing volumes; bulk backfills belong to the batch
    reader's sliced scroll."""

    def __init__(self, cfg: _ScrollConfig, schema: StructType, cursor_col: str):
        self.cfg = cfg
        self.schema = schema
        self.cursor_col = cursor_col
        self.start_at = None

    def initialOffset(self) -> dict:  # noqa: N802 — API name
        return {"cursor": self.start_at}

    def _range_query(self, start, end=None) -> dict | None:
        spec: dict = {}
        if start is not None:
            spec["gt"] = start
        if end is not None:
            spec["lte"] = end
        return {"range": {self.cursor_col: spec}} if spec else None

    def _rows(self, query) -> tuple[list[tuple], object]:
        convs = [(f.name, _converter(f.dataType)) for f in self.schema.fields]
        sort = [{self.cursor_col: {"order": "asc"}}]
        # prune _source to schema fields (+ the cursor, which offset
        # tracking reads even when it is not a schema column)
        source = sorted(
            {f.name for f in self.schema.fields if f.name != self.cfg.id_col}
            | {self.cursor_col}
        )
        rows: list[tuple] = []
        last = None
        for h in _scroll_all(self.cfg, query, sort, source):
            src = h.get("_source", {})
            if self.cfg.id_col:
                src = {**src, self.cfg.id_col: h.get("_id")}
            rows.append(tuple(conv(src.get(name)) for name, conv in convs))
            cur = src.get(self.cursor_col)
            if cur is not None and (last is None or cur > last):
                last = cur
        return rows, last

    def read(self, start: dict):
        rows, last = self._rows(self._range_query(start.get("cursor")))
        end = {"cursor": last if last is not None else start.get("cursor")}
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        rows, _ = self._rows(
            self._range_query(start.get("cursor"), end.get("cursor"))
        )
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; nothing ES-side


class ElasticScrollDataSource(DataSource):
    """``spark.read.format("elastic_scroll")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        cfg = _ScrollConfig.from_options(self.options)
        resp = _http_json(
            "GET",
            f"{cfg.base_url}/{cfg.index}/_mapping",
            None,
            cfg.headers,
            cfg.timeout,
        )
        props = resp.get(cfg.index, {}).get("mappings", {}).get("properties", {})
        if not props:
            raise ValueError(
                f"index {cfg.index!r} has no mapping to infer a schema "
                "from — pass an explicit .schema(...)"
            )
        return schema_for_es_mapping(props)

    def reader(self, schema: StructType) -> ElasticScrollReaderNoPushdown:
        cfg = _ScrollConfig.from_options(self.options)
        if str(self.options.get("pushdown", "true")).lower() == "false":
            return ElasticScrollReaderNoPushdown(cfg, schema)
        return ElasticScrollReader(cfg, schema)

    def simpleStreamReader(  # noqa: N802 — API name
        self, schema: StructType
    ) -> ElasticScrollStreamReader:
        cursor_col = self.options.get("cursor_col")
        if not cursor_col:
            raise ValueError(
                "streaming from elastic_scroll requires .option('cursor_col', "
                "<monotone column>) — the tailing offset"
            )
        reader = ElasticScrollStreamReader(
            _ScrollConfig.from_options(self.options), schema, str(cursor_col)
        )
        if self.options.get("start_at") is not None:
            # stringly-typed option; compare in the cursor column's type
            conv = _converter(schema[str(cursor_col)].dataType)
            reader.start_at = conv(self.options["start_at"])
        return reader


def register(spark) -> None:
    spark.dataSource.register(ElasticScrollDataSource)
