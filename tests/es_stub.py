"""In-process stub Elasticsearch server for offline bulk-path tests.

Implements just enough of the ES REST surface for the indexer's
HttpBulkSink: HEAD/PUT /{index} (exists / auto-create) and POST /_bulk
(NDJSON action+source pairs, per-item statuses). Failure injection:
``fail_ids`` report per-item 500s (docs not stored); ``reject_first_n_bulk``
rejects whole requests with 429 to exercise the retry path.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _dyn_type(v) -> dict:
    """ES dynamic-mapping inference for one stored JSON value."""
    if isinstance(v, bool):
        return {"type": "boolean"}
    if isinstance(v, int):
        return {"type": "long"}
    if isinstance(v, float):
        return {"type": "double"}
    return {
        "type": "text",
        "fields": {"keyword": {"type": "keyword", "ignore_above": 256}},
    }


def _field(name: str) -> str:
    """Strip the .keyword sub-field suffix (term/prefix/wildcard
    queries target it for exact string semantics)."""
    return name[: -len(".keyword")] if name.endswith(".keyword") else name


def _eval_query(q: dict, src: dict) -> bool:
    """Minimal ES query-DSL evaluator: bool/filter/must_not, term,
    terms, range (gt/gte/lt/lte), exists, prefix, wildcard('*v*')."""
    if "bool" in q:
        b = q["bool"]
        return all(_eval_query(c, src) for c in b.get("filter", [])) and not any(
            _eval_query(c, src) for c in b.get("must_not", [])
        )
    if "term" in q:
        ((f, v),) = q["term"].items()
        return src.get(_field(f)) == v
    if "terms" in q:
        ((f, vs),) = q["terms"].items()
        return src.get(_field(f)) in vs
    if "range" in q:
        ((f, spec),) = q["range"].items()
        x = src.get(_field(f))
        if x is None:
            return False
        return (
            ("gt" not in spec or x > spec["gt"])
            and ("gte" not in spec or x >= spec["gte"])
            and ("lt" not in spec or x < spec["lt"])
            and ("lte" not in spec or x <= spec["lte"])
        )
    if "exists" in q:
        return src.get(_field(q["exists"]["field"])) is not None
    if "prefix" in q:
        ((f, v),) = q["prefix"].items()
        x = src.get(_field(f))
        return isinstance(x, str) and x.startswith(v)
    if "wildcard" in q:
        ((f, v),) = q["wildcard"].items()
        x = src.get(_field(f))
        needle = v.strip("*")
        if v.startswith("*") and v.endswith("*"):
            return isinstance(x, str) and needle in x
        if v.endswith("*"):
            return isinstance(x, str) and x.startswith(needle)
        if v.startswith("*"):
            return isinstance(x, str) and x.endswith(needle)
        return x == v
    raise ValueError(f"stub cannot evaluate query clause: {list(q)}")


class StubES:
    def __init__(
        self,
        fail_ids=(),
        reject_first_n_bulk: int = 0,
        require_basic_auth: tuple[str, str] | None = None,
    ):
        self.indexes: dict[str, dict[str, dict]] = {}
        #: body of the PUT that created each index ({} if body-less) —
        #: lets tests assert explicit-mapping creates.
        self.create_bodies: dict[str, dict] = {}
        #: alias -> index (single-index aliases, the rollover pattern)
        self.aliases: dict[str, str] = {}
        self.fail_ids = {str(i) for i in fail_ids}
        self.reject_remaining = reject_first_n_bulk
        self.bulk_requests = 0
        #: indexes removed via DELETE (overwrite-mode evidence)
        self.deletes: list[str] = []
        #: indexes that received POST /{index}/_refresh
        self.refreshes: list[str] = []
        self.auto_id_seq = 0
        #: scroll_id -> (remaining (id, source) pairs, page size)
        self.scrolls: dict[str, tuple[list, int]] = {}
        self.scroll_seq = 0
        self.scroll_clears = 0
        self.search_requests = 0
        #: exact Authorization header demanded on EVERY request when
        #: require_basic_auth is set (real ES with security enabled)
        self.auth_header: str | None = None
        if require_basic_auth:
            import base64

            u, p = require_basic_auth
            self.auth_header = "Basic " + base64.b64encode(
                f"{u}:{p}".encode()
            ).decode()
        #: total hits returned across all search/scroll pages — lets a
        #: pushdown test assert FEWER docs crossed the wire
        self.hits_served = 0
        #: union of _source field names that left the server — lets a
        #: column-pruning test assert unrequested fields never did
        self.source_fields_served: set[str] = set()
        self.last_search_body: dict = {}
        self.lock = threading.Lock()
        stub = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def _authorized(self) -> bool:
                if stub.auth_header is None:
                    return True
                if self.headers.get("Authorization") == stub.auth_header:
                    return True
                self._respond(401, b'{"error":"unauthorized"}')
                return False

            def _respond(self, status: int, payload: bytes = b""):
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                if payload and self.command != "HEAD":
                    self.wfile.write(payload)

            def do_HEAD(self):
                if not self._authorized():
                    return
                name = self.path.strip("/")
                with stub.lock:
                    exists = name in stub.indexes
                self._respond(200 if exists else 404)

            def do_DELETE(self):
                if not self._authorized():
                    return
                if self.path.startswith("/_search/scroll"):
                    length = int(self.headers.get("Content-Length") or 0)
                    body = json.loads(self.rfile.read(length)) if length else {}
                    sid = body.get("scroll_id")
                    with stub.lock:
                        existed = stub.scrolls.pop(sid, None) is not None
                        if existed:
                            stub.scroll_clears += 1
                    self._respond(200, b'{"succeeded":true}')
                    return
                name = self.path.strip("/")
                with stub.lock:
                    existed = name in stub.indexes
                    stub.indexes.pop(name, None)
                    stub.create_bodies.pop(name, None)
                    if existed:
                        stub.deletes.append(name)
                self._respond(200 if existed else 404, b"{}")

            def do_GET(self):
                if not self._authorized():
                    return
                # GET /{index}/_mapping — the explicit create body's
                # mappings when one was given, else a dynamic mapping
                # inferred from stored docs (ES's own behavior).
                if self.path.rstrip("/").endswith("/_mapping"):
                    name = self.path.strip("/").rsplit("/", 1)[0]
                    with stub.lock:
                        if name not in stub.indexes:
                            self._respond(404, b'{"error":"no such index"}')
                            return
                        body = stub.create_bodies.get(name) or {}
                        mappings = body.get("mappings")
                        if not mappings:
                            props: dict = {}
                            for doc in stub.indexes[name].values():
                                for k, v in doc.items():
                                    props.setdefault(k, _dyn_type(v))
                            mappings = {"properties": props}
                    payload = json.dumps({name: {"mappings": mappings}}).encode()
                    self._respond(200, payload)
                    return
                self._respond(404, b"{}")

            def do_PUT(self):
                if not self._authorized():
                    return
                name = self.path.strip("/")
                length = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(length) if length else b""
                # Real ES enforces strict content types: a JSON index
                # create body must arrive as application/json (406
                # otherwise) — mirror that so the sink's content-type
                # handling is actually exercised offline.
                if body and "application/json" not in (
                    self.headers.get("Content-Type") or ""
                ):
                    self._respond(406, b'{"error":"Content-Type not supported"}')
                    return
                with stub.lock:
                    stub.indexes.setdefault(name, {})
                    stub.create_bodies.setdefault(
                        name, json.loads(body) if body else {}
                    )
                self._respond(200, b"{}")

            def do_POST(self):
                if not self._authorized():
                    return
                if self.path.startswith("/_aliases"):
                    # atomic alias actions (remove + add applied
                    # together under the lock, like real ES)
                    length = int(self.headers.get("Content-Length") or 0)
                    if "application/json" not in (
                        self.headers.get("Content-Type") or ""
                    ):
                        self._respond(406, b'{"error":"Content-Type"}')
                        return
                    actions = json.loads(self.rfile.read(length))["actions"]
                    with stub.lock:
                        # validate FIRST, apply second — the whole
                        # action set succeeds or fails as one unit
                        # (real ES alias updates are atomic): an add
                        # naming a missing index OR a remove naming an
                        # index the alias does not point at rejects the
                        # entire set (aliases_not_found semantics).
                        for act in actions:
                            if "add" in act and act["add"]["index"] not in stub.indexes:
                                self._respond(404, b'{"error":"no such index"}')
                                return
                            if "remove" in act:
                                a = act["remove"]
                                if stub.aliases.get(a["alias"]) != a["index"]:
                                    self._respond(
                                        404, b'{"error":"aliases_not_found"}'
                                    )
                                    return
                        for act in actions:
                            if "remove" in act:
                                del stub.aliases[act["remove"]["alias"]]
                            elif "add" in act:
                                a = act["add"]
                                stub.aliases[a["alias"]] = a["index"]
                    self._respond(200, b'{"acknowledged":true}')
                    return
                if self.path.startswith("/_search/scroll"):
                    length = int(self.headers.get("Content-Length") or 0)
                    body = json.loads(self.rfile.read(length)) if length else {}
                    sid = body.get("scroll_id")
                    with stub.lock:
                        state = stub.scrolls.get(sid)
                        if state is None:
                            self._respond(404, b'{"error":"no scroll"}')
                            return
                        docs, size = state
                        page, rest = docs[:size], docs[size:]
                        stub.scrolls[sid] = (rest, size)
                        stub.search_requests += 1
                        stub.hits_served += len(page)
                    payload = json.dumps(
                        {
                            "_scroll_id": sid,
                            "hits": {
                                "hits": [
                                    {"_id": i, "_source": s} for i, s in page
                                ]
                            },
                        }
                    ).encode()
                    self._respond(200, payload)
                    return
                if "/_search" in self.path:
                    name = self.path.strip("/").split("/", 1)[0]
                    length = int(self.headers.get("Content-Length") or 0)
                    body = json.loads(self.rfile.read(length)) if length else {}
                    with stub.lock:
                        if name not in stub.indexes:
                            self._respond(404, b'{"error":"no such index"}')
                            return
                        stub.search_requests += 1
                        stub.last_search_body = body
                        items = list(stub.indexes[name].items())
                        sl = body.get("slice")
                        if sl:
                            items = [
                                it
                                for pos, it in enumerate(items)
                                if pos % sl["max"] == sl["id"]
                            ]
                        q = body.get("query")
                        if q:
                            items = [
                                (i, s) for i, s in items if _eval_query(q, s)
                            ]
                        sort = body.get("sort")
                        if sort and isinstance(sort[0], dict):
                            ((fld, spec),) = sort[0].items()
                            items.sort(
                                key=lambda it: it[1].get(_field(fld)),
                                reverse=spec.get("order", "asc") == "desc",
                            )
                        src_filter = body.get("_source")
                        if isinstance(src_filter, list):
                            # ES _source filtering: only named fields
                            # leave the server
                            stub.source_fields_served.update(
                                k
                                for _, s in items
                                for k in s
                                if k in src_filter
                            )
                            items = [
                                (i, {k: v for k, v in s.items() if k in src_filter})
                                for i, s in items
                            ]
                        else:
                            stub.source_fields_served.update(
                                k for _, s in items for k in s
                            )
                        size = int(body.get("size", 10))
                        page, rest = items[:size], items[size:]
                        stub.hits_served += len(page)
                        stub.scroll_seq += 1
                        sid = f"scroll-{stub.scroll_seq}"
                        stub.scrolls[sid] = (rest, size)
                    payload = json.dumps(
                        {
                            "_scroll_id": sid,
                            "hits": {
                                "hits": [
                                    {"_id": i, "_source": s} for i, s in page
                                ]
                            },
                        }
                    ).encode()
                    self._respond(200, payload)
                    return
                if self.path.endswith("/_refresh"):
                    name = self.path.strip("/").rsplit("/", 1)[0]
                    with stub.lock:
                        known = name in stub.indexes
                        if known:
                            stub.refreshes.append(name)
                    self._respond(200 if known else 404, b"{}")
                    return
                if not self.path.startswith("/_bulk"):
                    self._respond(404, b"{}")
                    return
                length = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(length).decode()
                with stub.lock:
                    stub.bulk_requests += 1
                    if stub.reject_remaining > 0:
                        stub.reject_remaining -= 1
                        self._respond(429, b"{}")
                        return
                    lines = [ln for ln in body.split("\n") if ln]
                    items, errors = [], False
                    for i in range(0, len(lines), 2):
                        action = json.loads(lines[i])
                        source = json.loads(lines[i + 1])
                        meta = action["index"]
                        if "_id" in meta:
                            doc_id = str(meta["_id"])
                        else:
                            # ES generates an id when the action omits
                            # one — a deterministic counter stands in.
                            stub.auto_id_seq += 1
                            doc_id = f"auto-{stub.auto_id_seq}"
                        if doc_id in stub.fail_ids:
                            items.append({"index": {"_id": doc_id, "status": 500}})
                            errors = True
                        else:
                            stub.indexes.setdefault(meta["_index"], {})[doc_id] = source
                            items.append({"index": {"_id": doc_id, "status": 201}})
                    payload = json.dumps({"errors": errors, "items": items}).encode()
                self._respond(200, payload)

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.server.server_address[1]
        self.base_url = f"http://127.0.0.1:{self.port}"
        self._thread = threading.Thread(target=self.server.serve_forever, daemon=True)

    def start(self) -> str:
        self._thread.start()
        return self.base_url

    def stop(self) -> None:
        self.server.shutdown()
        self.server.server_close()

    def docs(self, index_name: str) -> dict[str, dict]:
        with self.lock:
            return dict(self.indexes.get(index_name, {}))
