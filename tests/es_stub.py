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


class StubES:
    def __init__(self, fail_ids=(), reject_first_n_bulk: int = 0):
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
        self.lock = threading.Lock()
        stub = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def _respond(self, status: int, payload: bytes = b""):
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                if payload and self.command != "HEAD":
                    self.wfile.write(payload)

            def do_HEAD(self):
                name = self.path.strip("/")
                with stub.lock:
                    exists = name in stub.indexes
                self._respond(200 if exists else 404)

            def do_DELETE(self):
                name = self.path.strip("/")
                with stub.lock:
                    existed = name in stub.indexes
                    stub.indexes.pop(name, None)
                    stub.create_bodies.pop(name, None)
                    if existed:
                        stub.deletes.append(name)
                self._respond(200 if existed else 404, b"{}")

            def do_PUT(self):
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
